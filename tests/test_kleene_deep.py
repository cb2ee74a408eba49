"""Deep-graph Kleene stress (round-4 verdict #10): a chain of 1000 nodes
must close in O(log2 d) rounds via path doubling — not 1000 driver
round-trips — and the convergence guard must actually fire."""

import math

import pytest

from rdf_fusion_spark import GraphStore
from rdf_fusion_spark.plans import paths as P

CHAIN_N = 1000


@pytest.fixture(scope="module")
def chain_store(spark, tmp_path_factory):
    nt = "".join(
        f"<http://ex/n{i}> <http://ex/next> <http://ex/n{i + 1}> .\n"
        for i in range(CHAIN_N))
    p = tmp_path_factory.mktemp("chain") / "chain.nt"
    p.write_text(nt, encoding="utf-8")
    return GraphStore.load(spark, str(p))


def test_chain_1000_closure_logarithmic_rounds(chain_store):
    import time
    t0 = time.time()
    res = chain_store.query(
        "SELECT (COUNT(*) AS ?n) WHERE { ?a <http://ex/next>+ ?b }")
    n = int(res.df.collect()[0]["n"]["v"])
    dt = time.time() - t0
    # closure of a chain of d edges has d(d+1)/2 pairs
    assert n == CHAIN_N * (CHAIN_N + 1) // 2
    # path doubling: rounds ~ ceil(log2(d)) + 1 convergence check
    assert not P.LAST_KLEENE_ROUNDS["seeded"]
    assert P.LAST_KLEENE_ROUNDS["rounds"] <= math.ceil(
        math.log2(CHAIN_N)) + 2, P.LAST_KLEENE_ROUNDS
    assert dt < 60, f"chain-of-{CHAIN_N} closure took {dt:.0f}s"


def test_chain_seeded_tail(chain_store):
    """Bound endpoint near the tail: the frontier-seeded variant only pays
    for reachability from the seed (3 rounds here, not the diameter)."""
    res = chain_store.query(
        f"SELECT ?b WHERE {{ <http://ex/n{CHAIN_N - 3}> "
        "<http://ex/next>+ ?b }")
    got = sorted(r["b"]["v"] for r in res.df.collect())
    assert got == sorted([f"http://ex/n{CHAIN_N - 2}",
                          f"http://ex/n{CHAIN_N - 1}",
                          f"http://ex/n{CHAIN_N}"])
    assert P.LAST_KLEENE_ROUNDS["seeded"]
    assert P.LAST_KLEENE_ROUNDS["rounds"] <= 4


def test_convergence_guard_fires(chain_store, monkeypatch):
    monkeypatch.setattr(P, "MAX_ITERATIONS", 3)
    with pytest.raises(RuntimeError, match="did not converge"):
        chain_store.query(
            "SELECT (COUNT(*) AS ?n) WHERE { ?a <http://ex/next>+ ?b }") \
            .df.collect()
