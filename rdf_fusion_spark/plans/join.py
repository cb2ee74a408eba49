"""SPARQL join strategy selection (compatible-mapping semantics).

Port of the *decision logic* of SparqlJoinLoweringRule
(reference: lib/logical/src/join/rewrite.rs:23-260) — not its rule
machinery: we decide the join shape eagerly at translate time using our own
definitely-bound variable tracking (Spark schema nullability is unreliable
after unions), then let Catalyst pick broadcast/sort-merge/shuffle-hash.

Strategy order (extends the reference's three cases with a scale-safe
split-union decomposition, SURVEY §7.3#3):
 1. disjoint vars, no filter      → cross join
 2. all shared vars definitely bound on both sides
                                  → equi hash join on the term structs
 3. few statically-nullable shared vars (≤3 across both sides)
                                  → null-pattern split-union: slice each side
                                    by which nullable shared vars are bound,
                                    join every slice pair on its effective
                                    equality keys (pure equi → hash join),
                                    union the parts; OPTIONAL additionally
                                    appends the anti-chain remainder padded
                                    with NULLs
 4. else                          → theta join on IS_COMPATIBLE conjunction
                                    + coalesce projection per shared var
                                    (BroadcastNestedLoop — last resort)
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from functools import reduce
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Split-union guard: total nullable shared vars across both sides; 2^k slice
# pairs are materialized, so keep k small (k=3 → at most 8 equi joins).
_SPLIT_UNION_MAX_NULLABLE = 3

# Guard-breach journal: each time a join falls past the k≤3 guard to the
# IS_COMPATIBLE theta fallback (the one remaining nested-loop-prone path),
# the offending vars are recorded here; the translator snapshots the list
# into QueryExplanation so assert_scale_safe can NAME the vars instead of
# dumping an anonymous BroadcastNestedLoopJoin. Thread-local: a SERVICE
# query evaluated by the in-process HTTP server (or any concurrent
# evaluate_query) must not clobber the outer query's journal.
import threading

_GUARD_TLS = threading.local()


def _breaches() -> list:
    lst = getattr(_GUARD_TLS, "breaches", None)
    if lst is None:
        lst = _GUARD_TLS.breaches = []
    return lst


def reset_guard_breaches() -> None:
    _breaches().clear()


def guard_breaches() -> list:
    return list(_breaches())


def _record_breach(op: str, left: "Solution", right: "Solution",
                   shared: list) -> None:
    _breaches().append({
        "op": op,
        "shared_vars": list(shared),
        "nullable_shared": sorted(
            v for v in shared
            if v not in left.bound or v not in right.bound),
    })

# Term-dictionary hypothesis flag (reference credits u32 ObjectIds with
# "quadrupled" join-heavy queries, lib/encoding/src/object_id/encoding.rs:
# 42-46): join IRI keys on xxhash64 longs with exact string equality as the
# residual, instead of directly on the strings. Measured at sf0.1 (see
# BASELINE.md round-3 note): no win — Tungsten already hashes string join
# keys, and the shuffled payload (the full term struct) is unchanged, so
# the extra column only adds work. Kept behind the env flag for re-testing
# on other data shapes.
import os as _os
_HASH_JOIN_KEYS = _os.environ.get("RFS_HASH_JOIN_KEYS", "0") == "1"


@dataclass
class Solution:
    """A solution relation: DataFrame + bound-variable bookkeeping.

    `maybe`  — variables present in the schema (possibly NULL = unbound)
    `bound`  — variables guaranteed non-NULL in every row
    `kinds`  — static kind per variable where known (typed_ops.skind codes):
               a promise that every non-NULL value has that kind, letting
               expression compilation emit single-branch code
    """
    df: DataFrame
    bound: set = field(default_factory=set)
    maybe: set = field(default_factory=set)
    pending_order: list = field(default_factory=list)  # OrderCondition list
    kinds: dict = field(default_factory=dict)
    # Variables PROVEN value-canonical: every non-NULL term is a numeric
    # whose lexical (`v`) is NULL-or-canonical for its exact value and
    # whose datatype is the kind's canonical type (xsd:integer, not
    # xsd:int). Producers: virtual scans (lazy lexicals), numeric term
    # constructors, canonically-written constants. Consumed by the
    # MIN/MAX hash-aggregate decomposition (r12): for such a column the
    # winning TERM is a pure function of the winning VALUE, so
    # min/max of the primitive field + canonical rebuild ≡ min_by of
    # the term struct. Default-empty is the safe direction — a dropped
    # entry only misses the optimization.
    vcanon: set = field(default_factory=set)
    # Variables whose backing column is an EXPENSIVE computed expression
    # (aggregate outputs: promotion ladder + materialize_lexical structs).
    # A later FILTER referencing one must not be alias-substituted by
    # Catalyst's PushDownPredicates — transitive inlining through the
    # stacked post-agg Projects grows the condition multiplicatively
    # (~12x per level) and hangs the optimizer. See _apply_plain_filters.
    expensive: set = field(default_factory=set)
    # Native join keys (r12, guide §2.3 narrower types): var →
    # (template, native column name). The var's term is an entity IRI
    # minted as `x:<code>:str(native_long)` from `template`'s id space,
    # and the df carries the LONG in the named `__nk_<var>` column.
    # str(long) is injective, so within one template long-equality ⟺
    # IRI-equality — an equi join on two vars with the SAME template may
    # key on the longs, skipping the per-row string build + string
    # hashing (measured ~20% of the whole q3 pipeline). Producers:
    # virtual star scans (subject + FK-object vars). Consumers MUST
    # check the column still exists in df (projections drop it — a
    # stale entry only misses the optimization; default-empty is the
    # safe direction, like vcanon).
    nkey: dict = field(default_factory=dict)

    def with_df(self, df: DataFrame) -> "Solution":
        return replace(self, df=df)


def merge_kinds(left: Solution, right: Solution) -> dict:
    """Kinds surviving a join/union: a var present on both sides keeps its
    kind only when BOTH sides know it and agree; a var present on one side
    keeps that side's kind (the other side contributes only NULLs)."""
    out = {}
    for v, k in left.kinds.items():
        if v not in right.maybe or right.kinds.get(v) == k:
            out[v] = k
    for v, k in right.kinds.items():
        if v not in left.maybe:
            out[v] = k
    return out


def merge_expensive(left: Solution, right: Solution) -> set:
    """Expensive-var markers surviving a join/union: union of both sides."""
    return left.expensive | right.expensive


def merge_vcanon(left: Solution, right: Solution) -> set:
    """Value-canonical markers surviving a join/union: a var present on
    both sides stays canonical only when BOTH sides prove it; a var
    present on one side keeps that side's proof (the other contributes
    only NULLs, which are vacuously canonical)."""
    out = set()
    for v in left.vcanon:
        if v not in right.maybe or v in right.vcanon:
            out.add(v)
    for v in right.vcanon:
        if v not in left.maybe:
            out.add(v)
    return out


def _merge_nkey(left: Solution, right: Solution, df: DataFrame) -> dict:
    """Native-key entries surviving a join: an entry is kept only when
    its backing column survived into the joined frame. For a shared var
    the left entry wins (the name-join keeps the left/merged copy); a
    right entry for a var the left doesn't track is valid too — the join
    matched on term equality, so the right long still corresponds to the
    var's term on every (matched) row."""
    cols = set(df.columns)
    out = {}
    for v, e in right.nkey.items():
        if e[1] in cols:
            out[v] = e
    for v, e in left.nkey.items():
        if e[1] in cols:
            out[v] = e
    return out


BoolCompiler = Callable[[object, Callable[[str], Column]], Column]


def _compat(lc: Column, rc: Column) -> Column:
    """IS_COMPATIBLE: either side unbound, or terms identical
    (reference: lib/functions/src/builtin/query/is_compatible.rs:18-180)."""
    return lc.isNull() | rc.isNull() | (lc == rc)


def _null_patterns(df: DataFrame, nullable: list):
    """Slice `df` by which of `nullable` columns are non-NULL.

    Yields (bound_subset: frozenset, slice_df). The slices partition the rows
    of `df`: each row lands in exactly one slice, so a union of per-slice-pair
    joins neither duplicates nor drops (l, r) pairs. With `nullable` empty the
    single slice is `df` itself (no filter → no extra scan)."""
    if not nullable:
        yield frozenset(), df
        return
    for bits in range(1 << len(nullable)):
        subset = frozenset(v for i, v in enumerate(nullable) if (bits >> i) & 1)
        cond = F.lit(True)
        for v in nullable:
            c = F.col(v).isNotNull() if v in subset else F.col(v).isNull()
            cond = cond & c
        yield subset, df.filter(cond)


def _split_union_applicable(left: "Solution", right: "Solution",
                            shared: list) -> bool:
    nl = [v for v in shared if v not in left.bound]
    nr = [v for v in shared if v not in right.bound]
    return 0 < len(nl) + len(nr) <= _SPLIT_UNION_MAX_NULLABLE


def _split_union_join(
    left: "Solution",
    right: "Solution",
    shared: list,
    how: str,
    filter_expr,
    compile_bool: Optional[BoolCompiler],
) -> "Solution":
    """Null-pattern split-union compatibility join (SURVEY §7.3#3).

    For every (left-slice, right-slice) pair the compat conjunction collapses:
    a shared var non-NULL on both sides must be EQUAL (equi key), a var NULL
    on either side is trivially compatible. So each pair joins on pure
    equality keys — Catalyst plans hash/sort-merge joins instead of the
    BroadcastNestedLoop the IS_COMPATIBLE theta forces. The one remaining
    nested-loop case is a slice pair with an empty key set (every shared var
    NULL on one side) — a genuine cross product the semantics demand, now
    confined to the all-null slices instead of the whole input.

    Left outer (OPTIONAL): the matched parts are the inner unions; the
    unmatched remainder is computed per left slice by CHAINED hash anti joins
    against each right slice (a row survives iff it matched nowhere), then
    padded with NULLs for right-only vars.

    Cost note: each side's subtree is re-evaluated once per slice (2^k scans
    for k nullable vars on that side). With the k≤3 guard that is at most 8
    re-reads of a scan subtree — linear work, vs the O(n·m) nested loop this
    replaces.
    """
    nl = [v for v in shared if v not in left.bound]
    nr = [v for v in shared if v not in right.bound]
    out_vars = sorted(left.maybe | right.maybe)

    def project(L, R, joined):
        cols = []
        for v in out_vars:
            if v in shared:
                cols.append(F.coalesce(L[v], R[v]).alias(v))
            elif v in left.maybe:
                cols.append(L[v].alias(v))
            else:
                cols.append(R[v].alias(v))
        return joined.select(*cols)

    from ..terms import TERM_DDL

    def pad_left(Ldf):
        cols = []
        for v in out_vars:
            if v in left.maybe:
                cols.append(F.col(v).alias(v))
            else:
                cols.append(F.lit(None).cast(TERM_DDL).alias(v))
        return Ldf.select(*cols)

    def mk_cond(L, R, keys):
        cond = F.lit(True)
        for v in keys:
            cond = cond & (L[v] == R[v])
        if filter_expr is not None:
            assert compile_bool is not None

            def resolve(name, L=L, R=R):
                if name in shared:
                    return F.coalesce(L[name], R[name])
                if name in left.maybe:
                    return L[name]
                if name in right.maybe:
                    return R[name]
                return F.lit(None).cast(TERM_DDL)

            cond = cond & compile_bool(filter_expr, resolve)
        return cond

    right_slices = list(_null_patterns(right.df, nr))
    parts = []
    for sl, ldf in _null_patterns(left.df, nl):
        rest = ldf  # anti-chain remainder (left outer only)
        for sr, rdf in right_slices:
            keys = sorted(((set(left.bound) & set(shared)) | sl)
                              & ((set(right.bound) & set(shared)) | sr))
            L, R = ldf.alias("l"), rdf.alias("r")
            parts.append(project(L, R, L.join(R, mk_cond(L, R, keys), "inner")))
            if how != "inner":
                La, Ra = rest.alias("l"), rdf.alias("r")
                rest = La.join(Ra, mk_cond(La, Ra, keys), "left_anti")
        if how != "inner":
            parts.append(pad_left(rest))

    df = reduce(lambda a, b: a.unionByName(b), parts)
    bound = set(left.bound)
    if how == "inner":
        bound |= right.bound
    df = df.select(*[F.col(v) for v in out_vars])
    return Solution(df=df, bound=bound, maybe=left.maybe | right.maybe,
                    pending_order=left.pending_order,
                    kinds=merge_kinds(left, right),
                    vcanon=merge_vcanon(left, right),
                    expensive=merge_expensive(left, right))


def join_solutions(
    left: Solution,
    right: Solution,
    how: str = "inner",
    filter_expr=None,
    compile_bool: Optional[BoolCompiler] = None,
) -> Solution:
    """SPARQL join/left-join of two solutions."""
    shared = sorted(left.maybe & right.maybe)
    all_bound = all(v in left.bound and v in right.bound for v in shared)

    # fast path: plain equi join, no extra filter → join on names
    if shared and all_bound and filter_expr is None:
        from ..functions.typed_ops import SK_IRI, SK_PLAIN

        def _native_key(v: str) -> Optional[str]:
            # native LONG key usable when BOTH sides mint the var's IRI
            # from the SAME template and still carry the long column
            lk, rk = left.nkey.get(v), right.nkey.get(v)
            if lk and rk and lk[0] == rk[0] \
                    and lk[1] == rk[1] \
                    and lk[1] in left.df.columns \
                    and rk[1] in right.df.columns:
                return lk[1]
            return None

        nat = {v: nk for v in shared if (nk := _native_key(v))}
        if all(v in nat or (left.kinds.get(v) == right.kinds.get(v)
                            and left.kinds.get(v) in (SK_IRI, SK_PLAIN))
               for v in shared):
            # Native-long keys where proven (r12: same-template entity
            # IRIs join on the minted long — no per-row string build, an
            # 8-byte shuffle/hash key); narrow-identity `v` keys for the
            # rest: sameTerm for IRIs and plain xsd:string literals is
            # identity on `v` (both sides must be the SAME kind — an IRI
            # never equals a literal), so shuffle/hash/compare ONE
            # string field instead of the 8-field struct (~25% cheaper
            # on join-heavy plans). In both forms the right side's term
            # column is dropped: equality of the key implies equality of
            # the term (same template / same kind + same lexical).
            jk = []
            L, R = left.df, right.df
            # a shared var joined on `v` (not natively) may still carry
            # same-named __nk columns on both sides — drop the right
            # copies so the joined frame has no duplicate non-key name
            dup_nk = [c for c in R.columns
                      if c.startswith("__nk_") and c in L.columns
                      and c not in set(nat.values())]
            if dup_nk:
                R = R.drop(*dup_nk)
            key = (lambda c: F.xxhash64(c)) if _HASH_JOIN_KEYS else \
                (lambda c: c)
            for v in shared:
                if v in nat:
                    continue
                jk.append(f"__jk_{v}")
                L = L.withColumn(f"__jk_{v}", key(F.col(v)["v"]))
                R = R.withColumn(f"__jk_{v}", key(F.col(v)["v"]))
            if _HASH_JOIN_KEYS and jk:
                # hash longs are the equi keys; exact string equality rides
                # along as the residual, guarding xxhash64 collisions
                La, Ra = L.alias("l"), R.alias("r")
                cond = F.lit(True)
                for v in shared:
                    if v in nat:
                        cond = cond & (La[nat[v]] == Ra[nat[v]])
                        continue
                    cond = cond & (La[f"__jk_{v}"] == Ra[f"__jk_{v}"]) \
                        & (La[v]["v"] == Ra[v]["v"])
                df = La.join(Ra, cond, how)
                for v in shared:
                    df = df.drop(Ra[v])
                    if v in nat:
                        df = df.drop(Ra[nat[v]])
                df = df.drop(*jk)
            else:
                on = [nat[v] for v in shared if v in nat] + jk
                df = L.join(R.drop(*shared), on=on, how=how).drop(*jk)
        else:
            # drop the right side's native-key columns that collide with
            # a left column name — the generic name-join merges only the
            # `shared` columns, and a duplicate non-key name would
            # poison later references
            L, R = left.df, right.df
            dup_nk = [c for c in R.columns
                      if c.startswith("__nk_") and c in L.columns]
            if dup_nk:
                R = R.drop(*dup_nk)
            df = L.join(R, on=shared, how=how)
        return Solution(
            df=df,
            bound=set(left.bound) | (set(right.bound) if how == "inner" else set()),
            maybe=left.maybe | right.maybe,
            pending_order=left.pending_order,
            kinds=merge_kinds(left, right),
            vcanon=merge_vcanon(left, right),
            expensive=merge_expensive(left, right),
            nkey=_merge_nkey(left, right, df),
        )

    # fast path: disjoint, no filter → cross join
    if not shared and filter_expr is None and how == "inner":
        df = left.df.crossJoin(right.df)
        return Solution(df=df, bound=left.bound | right.bound,
                        maybe=left.maybe | right.maybe,
                        pending_order=left.pending_order,
                        kinds=merge_kinds(left, right),
                        vcanon=merge_vcanon(left, right),
                        expensive=merge_expensive(left, right))

    # scale path: null-pattern split-union → hash joins instead of BNLJ
    if shared and not all_bound and how in ("inner", "left") \
            and _split_union_applicable(left, right, shared):
        return _split_union_join(left, right, shared, how,
                                 filter_expr, compile_bool)

    # general path: aliased theta join + coalesce projection
    if shared and not all_bound:
        _record_breach("join", left, right, shared)
    L = left.df.alias("l")
    R = right.df.alias("r")

    conds: list[Column] = []
    for v in shared:
        lc, rc = L[v], R[v]
        if v in left.bound and v in right.bound:
            conds.append(lc == rc)
        else:
            conds.append(_compat(lc, rc))

    def resolve(name: str) -> Column:
        if name in shared:
            return F.coalesce(L[name], R[name])
        if name in left.maybe:
            return L[name]
        if name in right.maybe:
            return R[name]
        from ..terms import TERM_DDL
        return F.lit(None).cast(TERM_DDL)

    if filter_expr is not None:
        assert compile_bool is not None
        conds.append(compile_bool(filter_expr, resolve))

    cond = F.lit(True)
    for c in conds:
        cond = cond & c

    df = L.join(R, cond, how)
    out_cols: list[Column] = []
    for v in sorted(left.maybe | right.maybe):
        if v in shared:
            out_cols.append(F.coalesce(L[v], R[v]).alias(v))
        elif v in left.maybe:
            out_cols.append(L[v].alias(v))
        else:
            out_cols.append(R[v].alias(v))
    df = df.select(*out_cols)

    bound = set(left.bound)
    if how == "inner":
        bound |= right.bound
    return Solution(df=df, bound=bound, maybe=left.maybe | right.maybe,
                    pending_order=left.pending_order,
                    kinds=merge_kinds(left, right),
                    vcanon=merge_vcanon(left, right),
                    expensive=merge_expensive(left, right))


def minus_solutions(left: Solution, right: Solution,
                    graph_var: Optional[str] = None) -> Solution:
    """SPARQL MINUS → left-anti join with compatibility condition AND at
    least one shared var bound on both sides
    (reference: lib/logical/src/minus/rewrite.rs:16-130).

    `graph_var` (r10, GRAPH-layer fuzz seed 19): inside GRAPH ?g every
    scan binds ?g, so both MINUS sides carry it — but the spec evaluates
    Graph(?g, P) as a per-named-graph evaluation of P with ?g joined
    ABOVE it (§18.5), so within MINUS the solutions do NOT contain ?g
    and the "domains overlap" clause must be decided WITHOUT it. ?g
    still participates in the compatibility condition (it encodes the
    per-graph scoping: right solutions from another graph are not
    compatible); it just cannot be the variable that satisfies the
    dom-overlap requirement. Concretely: GRAPH ?g { A MINUS B } where A
    and B share no pattern variables removes nothing, even though both
    bind ?g."""
    shared = sorted(left.maybe & right.maybe)
    dom_shared = [v for v in shared if v != graph_var]
    if not dom_shared:
        return left  # identity per spec (dom-overlap can never hold)

    L = left.df.alias("l")
    R = right.df.alias("r")
    all_bound = all(v in left.bound and v in right.bound for v in shared)

    if all_bound:
        # pure equality anti join → hash-joinable (dom_shared nonempty
        # and all-bound ⇒ the dom-overlap clause holds statically)
        cond = F.lit(True)
        for v in shared:
            cond = cond & (L[v] == R[v])
        df = L.join(R, cond, "left_anti")
        return replace(left, df=df)

    if _split_union_applicable(left, right, shared):
        # null-pattern split: per (left-slice, right-slice) pair the compat
        # ∧ any-both-bound condition is pure equality on the pair's key set —
        # and a pair with an EMPTY key set never excludes (the any-both-bound
        # clause fails), so those pairs are simply skipped. Every join below
        # is a hash anti join; the slices union back losslessly.
        nl = [v for v in shared if v not in left.bound]
        nr = [v for v in shared if v not in right.bound]
        right_slices = list(_null_patterns(right.df, nr))
        parts = []
        for sl, ldf in _null_patterns(left.df, nl):
            rest = ldf
            for sr, rdf in right_slices:
                keys = sorted(((set(left.bound) & set(shared)) | sl)
                              & ((set(right.bound) & set(shared)) | sr))
                if not set(keys) - {graph_var}:
                    # no NON-graph var bound on both sides → no exclusion
                    continue
                La, Ra = rest.alias("l"), rdf.alias("r")
                cond = F.lit(True)
                for v in keys:
                    cond = cond & (La[v] == Ra[v])
                rest = La.join(Ra, cond, "left_anti")
            parts.append(rest)
        df = reduce(lambda a, b: a.unionByName(b), parts)
        return replace(left, df=df)

    _record_breach("minus", left, right, shared)
    cond = F.lit(True)
    any_both = F.lit(False)
    for v in shared:
        cond = cond & _compat(L[v], R[v])
        if v != graph_var:
            any_both = any_both | (L[v].isNotNull() & R[v].isNotNull())
    cond = cond & any_both

    df = L.join(R, cond, "left_anti")
    return replace(left, df=df)


def exists_join(left: Solution, right: Solution, negated: bool) -> Solution:
    """FILTER EXISTS / NOT EXISTS → left-semi / left-anti join on
    compatibility of shared variables
    (reference: expression_rewriter.rs:325-340 + DecorrelatePredicateSubquery)."""
    shared = sorted(left.maybe & right.maybe)
    how = "left_anti" if negated else "left_semi"
    if not shared:
        # uncorrelated: keep all (resp. none) depending on right emptiness
        marker = right.df.limit(1)
        df = left.df.join(marker, F.lit(True), how)
        return replace(left, df=df)
    L = left.df.alias("l")
    R = right.df.alias("r")
    all_bound = all(v in left.bound and v in right.bound for v in shared)
    if all_bound:
        cond = F.lit(True)
        for v in shared:
            cond = cond & (L[v] == R[v])
        df = L.join(R, cond, how)
        return replace(left, df=df)

    if _split_union_applicable(left, right, shared):
        # null-pattern split: per left slice, walk the right slices keeping
        # (semi) or whittling (anti) via hash joins on each pair's equality
        # keys. A pair with an empty key set is trivially compatible — its
        # "join" is an existence test against ONE row of the right slice
        # (limit(1) marker), never an n×m loop.
        nl = [v for v in shared if v not in left.bound]
        nr = [v for v in shared if v not in right.bound]
        right_slices = list(_null_patterns(right.df, nr))
        parts = []
        for sl, ldf in _null_patterns(left.df, nl):
            rest = ldf
            hits = []
            for sr, rdf in right_slices:
                keys = sorted(((set(left.bound) & set(shared)) | sl)
                              & ((set(right.bound) & set(shared)) | sr))
                La = rest.alias("l")
                if keys:
                    Ra = rdf.alias("r")
                    cond = F.lit(True)
                    for v in keys:
                        cond = cond & (La[v] == Ra[v])
                else:
                    Ra = rdf.limit(1).alias("r")
                    cond = F.lit(True)
                if not negated:
                    hits.append(La.join(Ra, cond, "left_semi"))
                rest = La.join(Ra, cond, "left_anti")
            parts.extend(hits if not negated else [rest])
        df = reduce(lambda a, b: a.unionByName(b), parts)
        return replace(left, df=df)

    _record_breach("exists", left, right, shared)
    cond = F.lit(True)
    for v in shared:
        cond = cond & _compat(L[v], R[v])
    df = L.join(R, cond, how)
    return replace(left, df=df)
