"""Bound-endpoint Kleene paths run a frontier-seeded fixpoint (VERDICT r2
#2): `<x> :p+ ?y` must start from x's edges, not compute the whole-graph
closure and filter."""

import pytest

from rdf_fusion_spark import GraphStore, Literal, NamedNode
from rdf_fusion_spark.plans import paths as P

E = "http://e.org/"


@pytest.fixture(scope="module")
def chain_store(spark):
    """Two disjoint components: a→b→c→d and x→y."""
    p = NamedNode(E + "p")

    def n(s):
        return NamedNode(E + s)

    quads = [
        (None, n("a"), p, n("b")),
        (None, n("b"), p, n("c")),
        (None, n("c"), p, n("d")),
        (None, n("x"), p, n("y")),
    ]
    return GraphStore.from_python_quads(spark, quads)


def _names(res, var):
    return sorted(r[var]["v"].rsplit("/", 1)[-1] for r in res.df.collect())


def test_bound_subject_plus(chain_store):
    res = chain_store.query(
        f"SELECT ?y WHERE {{ <{E}a> <{E}p>+ ?y }}")
    assert _names(res, "y") == ["b", "c", "d"]


def test_bound_object_plus(chain_store):
    res = chain_store.query(
        f"SELECT ?x WHERE {{ ?x <{E}p>+ <{E}c> }}")
    assert _names(res, "x") == ["a", "b"]


def test_bound_subject_star(chain_store):
    res = chain_store.query(
        f"SELECT ?y WHERE {{ <{E}a> <{E}p>* ?y }}")
    assert _names(res, "y") == ["a", "b", "c", "d"]


def test_bound_both_endpoints(chain_store):
    res = chain_store.query(
        f"ASK {{ <{E}a> <{E}p>+ <{E}d> }}")
    assert res.value is True
    res2 = chain_store.query(
        f"ASK {{ <{E}a> <{E}p>+ <{E}y> }}")
    assert res2.value is False


def test_seed_reaches_kleene(chain_store, monkeypatch):
    """The plan-shape guarantee: a constant subject must be passed into
    _kleene_plus as the seed (frontier-restricted fixpoint), and an
    unbound query must not pass one."""
    captured = []
    orig = P._kleene_plus

    def spy(edges, ctx, seed=None):
        captured.append(seed)
        return orig(edges, ctx, seed=seed)

    monkeypatch.setattr(P, "_kleene_plus", spy)

    chain_store.query(f"SELECT ?y WHERE {{ <{E}a> <{E}p>+ ?y }}").df.collect()
    assert captured and captured[-1] is not None
    assert captured[-1].iri == E + "a"

    chain_store.query(f"SELECT ?x ?y WHERE {{ ?x <{E}p>+ ?y }}").df.collect()
    assert captured[-1] is None


def test_seeded_paths_only_contain_seed_rows(chain_store, spark):
    """_kleene_plus(seed=a) accumulates ONLY pairs sourced at a — the
    seeded fixpoint never materializes the other component's closure."""
    from rdf_fusion_spark.plans.translator import Ctx, ActiveGraph

    ctx = Ctx(store=chain_store, active_graph=ActiveGraph.default())
    edges = chain_store.quads.select(
        chain_store.quads["subject"].alias(P.SRC),
        chain_store.quads["object"].alias(P.TGT))
    out = P._kleene_plus(edges, ctx, seed=NamedNode(E + "a"))
    rows = {(r[P.SRC]["v"], r[P.TGT]["v"]) for r in out.collect()}
    assert rows == {(E + "a", E + "b"), (E + "a", E + "c"), (E + "a", E + "d")}
