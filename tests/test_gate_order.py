"""Driver-gate staleness rotation (gate_order.py, round-7 verdict #1)."""

from __future__ import annotations

import rdf_fusion_spark.gate_order as GO
from rdf_fusion_spark.gate_order import order_registry


def _patch(monkeypatch, gated: dict[str, int], rounds: dict[str, int],
           current: int = 8):
    monkeypatch.setattr(GO, "gated_rounds", lambda: gated)
    monkeypatch.setattr(GO, "_module_round", lambda m: rounds.get(m, 0))
    monkeypatch.setattr(GO, "current_round", lambda: current)


def test_stale_first_sorted_by_last_gate(monkeypatch):
    _patch(monkeypatch,
           gated={"a": 7, "b": 4, "c": 6, "d": 7},
           rounds={"mod_b": 7, "mod_c": 7})
    names = ["a", "b", "c", "d"]
    out = order_registry(names, lambda n: (f"mod_{n}",))
    # b (gated r4, changed r7) and c (gated r6, changed r7) are stale,
    # least-recently-gated first; a and d fresh in registry order
    assert out == ["b", "c", "a", "d"]


def test_never_gated_goes_first(monkeypatch):
    _patch(monkeypatch, gated={"a": 7, "b": 2}, rounds={"mod_b": 5})
    out = order_registry(["a", "new", "b"], lambda n: (f"mod_{n}",))
    assert out == ["new", "b", "a"]


def test_fresh_keeps_registry_order(monkeypatch):
    _patch(monkeypatch, gated={"a": 7, "b": 7, "c": 7}, rounds={})
    assert order_registry(["c", "a", "b"], lambda n: ()) == ["c", "a", "b"]


def test_same_round_gate_is_fresh(monkeypatch):
    # the driver gates at round END, after the round's commits: a module
    # changed in round N with a round-N green row is NOT stale
    _patch(monkeypatch, gated={"a": 7}, rounds={"mod_a": 7})
    assert order_registry(["a"], lambda n: ("mod_a",)) == ["a"]


def test_force_regate(monkeypatch):
    _patch(monkeypatch, gated={"a": 7, "b": 3}, rounds={})
    out = order_registry(["a", "b"], lambda n: (), force_regate={"a"})
    # a re-queued by hand (SPEC-text edit); b untouched-and-gated = fresh
    assert out == ["a", "b"]


def test_ties_keep_registry_order(monkeypatch):
    _patch(monkeypatch, gated={"a": 4, "b": 4}, rounds={"m": 9})
    assert order_registry(["b", "a"], lambda n: ("m",)) == ["b", "a"]


def test_age_term_requeues_old_greens(monkeypatch):
    # round-8 verdict #2: a query whose module never changes (or maps to
    # no module) was fresh forever — a green >= MAX_GATE_AGE rounds old
    # must re-queue even with zero module changes
    _patch(monkeypatch, gated={"old": 3, "young": 7}, rounds={}, current=9)
    out = order_registry(["young", "old"], lambda n: ())
    assert out == ["old", "young"]


def test_age_term_boundary(monkeypatch):
    # age == MAX_GATE_AGE is stale; one round younger is fresh
    cur = 9
    edge, fresh_r = cur - GO.MAX_GATE_AGE, cur - GO.MAX_GATE_AGE + 1
    _patch(monkeypatch, gated={"edge": edge, "ok": fresh_r}, rounds={},
           current=cur)
    assert order_registry(["ok", "edge"], lambda n: ()) == ["edge", "ok"]


def test_age_term_disabled_without_git(monkeypatch):
    # current_round() == 0 (no git) must not mark everything stale
    _patch(monkeypatch, gated={"a": 1, "b": 2}, rounds={}, current=0)
    assert order_registry(["a", "b"], lambda n: ()) == ["a", "b"]


def test_aged_out_real_queries_requeue():
    """q_events_sessionize / q_events_json_props carry r3 greens (module
    unchanged / unmapped) — the age term must put them in the driver's
    50-query prefix."""
    from rdf_fusion_spark import entry_queries as EQ
    gated = GO.gated_rounds()
    cur = GO.current_round()
    names = list(EQ.queries())
    for q in ("q_events_sessionize", "q_events_json_props"):
        if cur and cur - gated.get(q, 0) >= GO.MAX_GATE_AGE:
            assert names.index(q) < 50, q


def test_real_registry_is_complete_permutation():
    from rdf_fusion_spark import entry_queries as EQ
    qs = list(EQ.queries())
    assert len(qs) == len(set(qs))
    # ordering must never drop or invent queries
    assert set(qs) == set(EQ.queries())


def test_real_gated_rounds_parse():
    # the repo carries CORRECTNESS_r*.json records; parsing must find
    # green rows (r7 had 50/50 green)
    gated = GO.gated_rounds()
    assert gated.get("q_pii_scan", 0) >= 7
    assert gated.get("q1_pricing_summary", 0) >= 2


def _real_is_stale(name):
    """Replicates order_registry's stale predicate against the live repo."""
    from rdf_fusion_spark import entry_queries as EQ
    gated = GO.gated_rounds()
    if name in EQ._FORCE_REGATE:
        return True
    lg = gated.get(name, 0)
    try:
        changed = max((GO._module_round(m) for m in EQ._gate_modules(name)),
                      default=0)
    except Exception:
        changed = 0
    cur = GO.current_round()
    return lg == 0 or changed > lg \
        or (bool(cur) and cur - lg >= GO.MAX_GATE_AGE)


def test_rewritten_lsh_operators_requeue():
    """Round-7 regression: dedup.py/similarity.py were rewritten in r7
    after these queries' r4 gates without the hand-list catching it. The
    derived order must put EVERY stale query ahead of every fresh one
    (least-recently-gated first), so a rewritten module's queries reach
    the driver's gating prefix ahead of anything already certified.
    (Not a hard `< 50`: when more than 50 queries are stale at once —
    e.g. an engine change re-staling the whole SPARQL cohort — the
    latest-gated stale tail legitimately waits a round.)"""
    from rdf_fusion_spark import entry_queries as EQ
    names = list(EQ.queries())
    stale = [i for i, n in enumerate(names) if _real_is_stale(n)]
    fresh = [i for i, n in enumerate(names) if not _real_is_stale(n)]
    if stale and fresh:
        assert max(stale) < min(fresh)
    gated = GO.gated_rounds()
    for q, mod in [("q_dedup_minhash_lsh", "rdf_fusion_spark/pipeline/dedup.py"),
                   ("q_ann_lsh", "rdf_fusion_spark/pipeline/similarity.py"),
                   ("q_dedup_embedding_cosine",
                    "rdf_fusion_spark/pipeline/similarity.py")]:
        if GO._module_round(mod) > gated.get(q, 0):
            assert names.index(q) <= max(stale), q
            # and never displaced by a LESS-recently-gated fresh query:
            # everything before it is stale or gated no earlier
            assert all(_real_is_stale(n) for n in names[:names.index(q)])


def test_force_regate_entries_not_consumed():
    """Force entries live for ONE round: once the named query has a
    green driver row in a round >= the round the entry was added
    (recorded as the dict value), the entry is consumed and must be
    deleted — stale entries burn a front-of-queue slot in the driver's
    50-query gating prefix every round (r8 and r9 verdicts both had to
    flag leftovers by hand; this makes the cleanup mechanical)."""
    from rdf_fusion_spark import entry_queries as EQ
    gated = GO.gated_rounds()
    registry = set(EQ.queries())
    for name, added in EQ._FORCE_REGATE.items():
        assert name in registry, f"force entry {name} not in registry"
        assert isinstance(added, int) and added > 0
        assert gated.get(name, 0) < added, (
            f"{name} has a green from r{gated.get(name)} >= its force "
            f"round r{added}: the entry is consumed — delete it")
