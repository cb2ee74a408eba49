"""Aggregate subsumption: share one aggregation pass between Group nodes
whose inputs are the same conjunctive pattern (up to variable renaming and
provably multiplicity-preserving extra triples).

The BSBM BI workload repeats a GROUP BY core several times per query with
different aggregate lists (bi-q5.sparql: a count-max chain and a count/avg
chain over the same 4-table join; the reference evaluates both chains —
lib/execution/src/sparql/optimizer.rs has no cross-subquery sharing, and
DuckDB's oracle plan computes ONE grouped CTE that both consumers read).
This pass rewrites each matched Group into an α-equivalent shared
Project(Group(merged aggregates)) plus a thin rename/narrowing wrapper, so
the translator's existing α-equivalence subquery cache evaluates the
aggregation once and Spark's ReuseExchange reuses the shuffle.

Soundness of the "extra triple" allowance: input B may contain triples
beyond the α-image of input A only when each such triple is
  (s, p, ?fresh)  with  s in the matched image,
p a constant predicate the store certifies FUNCTIONAL AND TOTAL for its
subject domain (relational column mapping: one value per row, no NULLs —
GraphStore.functional_total), ?fresh appearing nowhere else in the input,
and the matched part already anchoring s to p's table (another predicate
of the same table on the same subject). Each A-row then extends to exactly
one B-row, so every A-aggregate computed over B's input is identical.
"""

from __future__ import annotations

import copy
import itertools
from dataclasses import replace as dc_replace
from typing import Optional

from ..sparql import algebra as A
from ..terms import NamedNode, Variable

# backtracking budget for the BGP matcher (pairs of candidate assignments)
_MATCH_BUDGET = 20_000

_fresh_counter = itertools.count()


def _expr_vars(e) -> set:
    if isinstance(e, A.EVar):
        return {e.name}
    if isinstance(e, A.ECall):
        out: set = set()
        for a in e.args:
            out |= _expr_vars(a)
        return out
    if isinstance(e, A.ETerm):
        return set()
    return None  # EExists/unknown: not analyzable → bail


def _map_expr(e, m: dict):
    """Clone expression with variables renamed via m (all vars mapped)."""
    if isinstance(e, A.EVar):
        return A.EVar(m[e.name])
    if isinstance(e, A.ETerm):
        return e
    if isinstance(e, A.ECall):
        return A.ECall(e.name, [_map_expr(a, m) for a in e.args])
    raise KeyError("unmappable expression")


def _expr_key(e):
    if isinstance(e, A.EVar):
        return ("v", e.name)
    if isinstance(e, A.ETerm):
        return ("t", repr(e.term))
    if isinstance(e, A.ECall):
        return ("c", e.name, tuple(_expr_key(a) for a in e.args))
    raise KeyError


def _agg_key(c: A.AggCall):
    return (c.name, c.distinct, c.separator,
            _expr_key(c.expr) if c.expr is not None else None)


def _tp_parts(t: A.TriplePattern):
    return (t.subject, t.predicate, t.object)


class _Match:
    def __init__(self, m: dict, extras: list):
        self.var_map = m        # A var name -> B var name
        self.extras = extras    # B triples not in the image


def _match_bgps(a: A.BGP, b: A.BGP, a_keys: list, b_keys: list,
                store) -> Optional[_Match]:
    """Injective α-embedding of a's triples into b's with key sets in
    correspondence; leftover b-triples must pass the functional-total
    test. Returns the first admissible match."""
    if len(a.triples) > len(b.triples) or len(a.triples) > 12:
        return None
    b_var_occurrences: dict = {}
    for t in b.triples:
        for x in _tp_parts(t):
            if isinstance(x, Variable):
                b_var_occurrences[x.name] = b_var_occurrences.get(x.name, 0) + 1

    budget = [_MATCH_BUDGET]
    bkey_names = {v.name for v in b_keys}

    def extras_ok(m: dict, used: set) -> bool:
        image = set(m.values())
        # predicate-table anchors present in the matched image, per subject
        anchor: dict = {}
        for i in used:
            s, p, _ = _tp_parts(b.triples[i])
            if isinstance(s, Variable) and isinstance(p, NamedNode):
                tbl = _pred_table(store, p)
                if tbl:
                    anchor.setdefault(s.name, set()).add(tbl)
        for i, t in enumerate(b.triples):
            if i in used:
                continue
            s, p, o = _tp_parts(t)
            if not (isinstance(p, NamedNode) and isinstance(o, Variable)
                    and isinstance(s, Variable)):
                return False
            if s.name not in image or o.name in bkey_names:
                return False
            if b_var_occurrences.get(o.name, 0) != 1:
                return False
            if not getattr(store, "functional_total", lambda _p: False)(p):
                return False
            tbl = _pred_table(store, p)
            if not tbl or tbl not in anchor.get(s.name, ()):
                return False
        return True

    def bt(i: int, m: dict, rev: set, used: set) -> Optional[_Match]:
        if budget[0] <= 0:
            return None
        if i == len(a.triples):
            # keys must correspond as sets
            try:
                if {m[k.name] for k in a_keys} != bkey_names:
                    return None
            except KeyError:
                return None
            if not extras_ok(m, used):
                return None
            return _Match(dict(m), [b.triples[j]
                                    for j in range(len(b.triples))
                                    if j not in used])
        at = a.triples[i]
        for j, btr in enumerate(b.triples):
            if j in used:
                continue
            budget[0] -= 1
            trial = dict(m)
            trial_rev = set(rev)
            ok = True
            for ax, bx in zip(_tp_parts(at), _tp_parts(btr)):
                if isinstance(ax, Variable):
                    if not isinstance(bx, Variable):
                        ok = False
                        break
                    prev = trial.get(ax.name)
                    if prev is None:
                        if bx.name in trial_rev:
                            ok = False
                            break
                        trial[ax.name] = bx.name
                        trial_rev.add(bx.name)
                    elif prev != bx.name:
                        ok = False
                        break
                else:
                    if isinstance(bx, Variable) or ax != bx:
                        ok = False
                        break
            if not ok:
                continue
            used.add(j)
            res = bt(i + 1, trial, trial_rev, used)
            used.discard(j)
            if res is not None:
                return res
        return None

    return bt(0, {}, set(), set())


def _pred_table(store, p: NamedNode) -> Optional[str]:
    fn = getattr(store, "predicate_table", None)
    return fn(p) if fn else None


def _collect_groups(p, out: list) -> None:
    if isinstance(p, A.Group) and isinstance(p.inner, A.BGP):
        out.append(p)
    for attr in ("left", "right", "inner"):
        c = getattr(p, attr, None)
        if c is not None:
            _collect_groups(c, out)


def _replace_nodes(p, repl: dict):
    """Rebuild the tree with `repl` (id(node) -> replacement) applied."""
    if id(p) in repl:
        return repl[id(p)]
    changed = {}
    for attr in ("left", "right", "inner"):
        c = getattr(p, attr, None)
        if c is not None:
            nc = _replace_nodes(c, repl)
            if nc is not c:
                changed[attr] = nc
    return dc_replace(p, **changed) if changed else p


def _rewrite_pair(ga: A.Group, gb: A.Group, match: _Match) -> Optional[dict]:
    """Build replacements for the matched pair: a SHARED
    Project(all merged outputs, Group(b.inner, b.keys, merged aggs))
    embedded identically (deep copies) on both sides, wrapped with
    rename-Extends and a narrowing Project reproducing each side's
    original output variables."""
    m = match.var_map
    merged: list = []          # [(Variable(__gsub_i), AggCall)]
    by_key: dict = {}

    def add(call: A.AggCall) -> str:
        k = _agg_key(call)
        hit = by_key.get(k)
        if hit is not None:
            return hit
        name = f"__gsub_{next(_fresh_counter)}"
        merged.append((Variable(name), call))
        by_key[k] = name
        return name

    b_map = {v.name: add(call) for v, call in gb.aggregates}
    try:
        a_map = {v.name: add(A.AggCall(call.name,
                                       _map_expr(call.expr, m)
                                       if call.expr is not None else None,
                                       call.distinct, call.separator))
                 for v, call in ga.aggregates}
    except KeyError:
        return None  # aggregate over a variable outside the matched BGP

    b_key_names = [v.name for v in gb.keys]
    shared_names = b_key_names + [v.name for v, _ in merged]

    # collision guards: every rename target must be absent from the shared
    # output list (Extend requires a fresh variable)
    a_key_renames = []
    for k in ga.keys:
        tgt = m[k.name]
        if k.name != tgt:
            if k.name in shared_names:
                return None
            a_key_renames.append((k.name, tgt))
    for side_map, aggs in ((b_map, gb.aggregates), (a_map, ga.aggregates)):
        for v, _ in aggs:
            if v.name in shared_names and v.name != side_map[v.name]:
                return None

    def shared_copy():
        inner = copy.deepcopy(gb.inner)
        grp = A.Group(inner=inner, keys=[Variable(n) for n in b_key_names],
                      aggregates=[(Variable(v.name),
                                   copy.deepcopy(call))
                                  for v, call in merged])
        return A.Project(inner=grp,
                         variables=[Variable(n) for n in shared_names])

    def wrap(renames: list, outputs: list):
        node = shared_copy()
        for out_name, src_name in renames:
            node = A.Extend(inner=node, var=Variable(out_name),
                            expr=A.EVar(src_name))
        return A.Project(inner=node,
                         variables=[Variable(n) for n in outputs])

    b_renames = [(v.name, b_map[v.name]) for v, _ in gb.aggregates]
    a_renames = a_key_renames + \
        [(v.name, a_map[v.name]) for v, _ in ga.aggregates]
    b_node = wrap(b_renames,
                  b_key_names + [v.name for v, _ in gb.aggregates])
    a_node = wrap(a_renames,
                  [k.name for k in ga.keys] + [v.name for v, _ in
                                               ga.aggregates])
    return {id(gb): b_node, id(ga): a_node}


def subsume_group_aggregates(pattern, store):
    """Rewrite `pattern` so Group nodes with subsumed inputs share one
    merged aggregation (returns a new tree; the input is not mutated)."""
    groups: list = []
    _collect_groups(pattern, groups)
    if len(groups) < 2:
        return pattern
    repl: dict = {}
    done: set = set()
    for i in range(len(groups)):
        for j in range(len(groups)):
            if i == j:
                continue
            ga, gb = groups[i], groups[j]
            if id(ga) in done or id(gb) in done:
                continue
            if len(ga.keys) != len(gb.keys):
                continue
            # nothing to gain when the pair is already α-identical with
            # identical aggregate lists — plain subquery CSE covers it
            # (and skipping keeps the pass idempotent)
            if len(ga.inner.triples) == len(gb.inner.triples) and \
                    len(ga.aggregates) == len(gb.aggregates):
                try:
                    same = ([_agg_key(c) for _, c in ga.aggregates]
                            == [_agg_key(c) for _, c in gb.aggregates])
                except KeyError:
                    same = False
                if same and _match_bgps(ga.inner, gb.inner, ga.keys,
                                        gb.keys, store) is not None:
                    continue
            mt = _match_bgps(ga.inner, gb.inner, ga.keys, gb.keys, store)
            if mt is None:
                continue
            pair = _rewrite_pair(ga, gb, mt)
            if pair is None:
                continue
            repl.update(pair)
            done.add(id(ga))
            done.add(id(gb))
    if not repl:
        return pattern
    return _replace_nodes(pattern, repl)
