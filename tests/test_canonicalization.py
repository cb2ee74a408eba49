"""RDFC-1.0 dataset canonicalization (W3C rdf-canon; the reference's
testsuite harness targets this suite, testsuite/tests/canonicalization.rs).
No vendored test data ships with the reference (empty submodule), so the
cases here check the algorithm's defining properties: label stability,
isomorphism-invariance (including automorphic graphs needing the
N-degree permutation search), and non-isomorphism separation."""

import pytest

from rdf_fusion_spark import GraphStore
from rdf_fusion_spark.canon import canonical_labels
from rdf_fusion_spark.terms import BlankNode, Literal, NamedNode

EX = "http://example.org/"


def _n(x):
    return NamedNode(EX + x)


def q(s, p, o, g=None):
    return (g, s, p, o)


def test_unique_first_degree_hashes():
    quads = [q(BlankNode("x"), _n("p"), Literal("1")),
             q(BlankNode("y"), _n("p"), Literal("2"))]
    labels = canonical_labels(quads)
    assert set(labels) == {"x", "y"}
    assert set(labels.values()) == {"c14n0", "c14n1"}
    # renaming the input bnodes must not change the issued label of the
    # node playing the same role
    relabeled = [q(BlankNode("aa"), _n("p"), Literal("1")),
                 q(BlankNode("bb"), _n("p"), Literal("2"))]
    labels2 = canonical_labels(relabeled)
    assert labels2["aa"] == labels["x"]
    assert labels2["bb"] == labels["y"]


def test_symmetric_cycle_needs_n_degree():
    """_:a <p> _:b . _:b <p> _:a — identical first-degree hashes; the
    N-degree permutation search must still produce a deterministic,
    rename-invariant labeling."""
    def cycle(n1, n2):
        return [q(BlankNode(n1), _n("p"), BlankNode(n2)),
                q(BlankNode(n2), _n("p"), BlankNode(n1))]
    l1 = canonical_labels(cycle("a", "b"))
    l2 = canonical_labels(cycle("zz", "qq"))
    assert sorted(l1.values()) == sorted(l2.values()) == ["c14n0", "c14n1"]

    def canon_quads(quads):
        labels = canonical_labels(quads)
        out = set()
        for g, s, p, o in quads:
            ren = lambda t: BlankNode(labels[t.id]) \
                if isinstance(t, BlankNode) else t
            out.add((ren(s), p, ren(o)))
        return out
    assert canon_quads(cycle("a", "b")) == canon_quads(cycle("zz", "qq"))


def test_distinguishable_cycle_members():
    """A cycle where one member carries an extra triple: labels must
    follow the ROLE, not the input name."""
    def data(n1, n2):
        return [q(BlankNode(n1), _n("p"), BlankNode(n2)),
                q(BlankNode(n2), _n("p"), BlankNode(n1)),
                q(BlankNode(n1), _n("mark"), Literal("here"))]
    l1 = canonical_labels(data("a", "b"))
    l2 = canonical_labels(data("b", "a"))  # swapped input names
    assert l1["a"] == l2["b"]
    assert l1["b"] == l2["a"]


def test_non_isomorphic_datasets_differ():
    a = [q(BlankNode("x"), _n("p"), BlankNode("y")),
         q(BlankNode("y"), _n("p"), BlankNode("x"))]
    b = [q(BlankNode("x"), _n("p"), BlankNode("y")),
         q(BlankNode("y"), _n("q"), BlankNode("x"))]

    def canon_set(quads):
        labels = canonical_labels(quads)
        ren = lambda t: BlankNode(labels[t.id]) \
            if isinstance(t, BlankNode) else t
        return {(ren(s), p, ren(o)) for g, s, p, o in quads}
    assert canon_set(a) != canon_set(b)


def test_named_graph_bnodes_and_ground_quads():
    quads = [q(_n("s"), _n("p"), _n("o")),                       # ground
             q(BlankNode("g1s"), _n("p"), Literal("v"),
               BlankNode("gg")),                                  # graph bnode
             q(_n("s2"), _n("p2"), BlankNode("g1s"))]
    labels = canonical_labels(quads)
    assert set(labels) == {"g1s", "gg"}


def test_bag_multiplicity_invariance(spark):
    """RDFC-1.0 hashes the dataset as a SET: a store carrying a
    duplicated row must canonicalize identically to its deduplicated
    twin (round-5 ADVICE — duplicate rows doubled N-Quads lines in
    first-degree hashes)."""
    base = [
        (None, BlankNode("a"), _n("knows"), BlankNode("b")),
        (None, BlankNode("b"), _n("knows"), BlankNode("a")),
        (None, BlankNode("a"), _n("name"), Literal("alice")),
    ]
    s1 = GraphStore.from_python_quads(spark, base)
    s2 = GraphStore.from_python_quads(spark, base + [base[0], base[2]])

    def rows(store):
        return sorted(str(r) for r in store.canonicalize().quads.collect())

    assert rows(s1) == rows(s2)


def test_distributed_path_matches_sequential(spark):
    """When all first-degree hashes are unique, store.canonicalize takes
    the fully-distributed labeling path — it must issue exactly the
    labels the sequential spec algorithm issues, at a bnode count past
    any create_map/collect comfort zone."""
    n = 2_000
    quads = [(None, BlankNode(f"b{i}"), _n("val"), Literal(str(i)))
             for i in range(n)]
    expect = canonical_labels(quads)
    store = GraphStore.from_python_quads(spark, quads)
    got = {}
    for r in store.canonicalize().quads.collect():
        got[r["object"]["v"]] = r["subject"]["v"]
    assert len(got) == n
    for i in range(n):
        assert got[str(i)] == expect[f"b{i}"]


def test_store_canonicalize_roundtrip(spark):
    """GraphStore.canonicalize: isomorphic stores produce IDENTICAL quad
    sets; ground quads pass through untouched."""
    def mk(b1, b2):
        return GraphStore.from_python_quads(spark, [
            (None, _n("s"), _n("p"), _n("o")),
            (None, BlankNode(b1), _n("knows"), BlankNode(b2)),
            (None, BlankNode(b2), _n("knows"), BlankNode(b1)),
            (None, BlankNode(b1), _n("name"), Literal("alice")),
        ])

    def rows(store):
        return sorted(str(r) for r in store.canonicalize().quads.collect())

    assert rows(mk("a", "b")) == rows(mk("n1", "n2"))
    canon = mk("a", "b").canonicalize()
    labs = {r["subject"]["v"] for r in canon.quads.collect()
            if r["subject"]["t"] == 1}
    assert labs == {"c14n0", "c14n1"}
