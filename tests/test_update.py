"""SPARQL 1.1 Update (reference: store.rs:409-475 update()): operation
semantics over the immutable-DataFrame store."""

import pytest

from rdf_fusion_spark import GraphStore
from rdf_fusion_spark.terms import Literal, NamedNode

EX = "http://example/"
P = f"PREFIX : <{EX}>\n"


@pytest.fixture()
def store(spark):
    return GraphStore.from_python_quads(spark, [
        (None, NamedNode(EX + "a"), NamedNode(EX + "p"), Literal("1")),
        (None, NamedNode(EX + "b"), NamedNode(EX + "p"), Literal("2")),
        (NamedNode(EX + "g"), NamedNode(EX + "c"), NamedNode(EX + "q"),
         Literal("3")),
    ])


def rows(store, q):
    res = store.query(P + q)
    return sorted(tuple(r[v]["v"] for v in res.variables)
                  for r in res.df.collect())


def test_insert_data(store):
    store.update(P + 'INSERT DATA { :d :p "4" . GRAPH :g { :e :q "5" } }')
    assert len(store) == 5
    assert rows(store, "SELECT ?o WHERE { :d :p ?o }") == [("4",)]
    assert rows(store, "SELECT ?o WHERE { GRAPH :g { :e :q ?o } }") == [("5",)]
    # set semantics: re-inserting an existing quad is a no-op
    store.update(P + 'INSERT DATA { :d :p "4" }')
    assert len(store) == 5


def test_insert_data_bnodes_fresh(store):
    store.update(P + "INSERT DATA { _:x :p :a . _:x :p :b }")
    # one fresh bnode shared within the op, linked to both objects
    got = rows(store, "SELECT ?s ?o WHERE { ?s :p ?o . FILTER(isBlank(?s)) }")
    assert len(got) == 2 and got[0][0] == got[1][0]


def test_delete_data(store):
    store.update(P + 'DELETE DATA { :a :p "1" }')
    assert rows(store, "SELECT ?s WHERE { ?s :p ?o }") == [(EX + "b",)]
    # deleting an absent quad is a no-op
    store.update(P + 'DELETE DATA { :zz :p "9" }')
    assert len(store) == 2


def test_delete_where(store):
    store.update(P + "DELETE WHERE { ?s :p ?o }")
    assert len(store) == 1  # only the :g quad survives
    assert rows(store, "SELECT ?s WHERE { GRAPH :g { ?s ?p ?o } }") \
        == [(EX + "c",)]


def test_delete_insert_where(store):
    store.update(P + """
        DELETE { ?s :p ?o } INSERT { ?s :renamed ?o } WHERE { ?s :p ?o }
    """)
    assert rows(store, "SELECT ?s ?o WHERE { ?s :renamed ?o }") == [
        (EX + "a", "1"), (EX + "b", "2")]
    assert rows(store, "SELECT ?s WHERE { ?s :p ?o }") == []


def test_insert_where_reads_prestate(store):
    # the insert must not see its own insertions (pre-state evaluation)
    store.update(P + "INSERT { ?s :p2 ?o } WHERE { ?s :p ?o }")
    assert len(store) == 5
    store.update(P + "INSERT { GRAPH :arch { ?s ?p ?o } } WHERE { ?s ?p ?o }")
    assert rows(store, "SELECT ?s WHERE { GRAPH :arch { ?s :p ?o } }") == [
        (EX + "a",), (EX + "b",)]


def test_with_graph(store):
    store.update(P + """
        WITH :g DELETE { ?s :q ?o } INSERT { ?s :q2 ?o } WHERE { ?s :q ?o }
    """)
    assert rows(store, "SELECT ?s WHERE { GRAPH :g { ?s :q2 ?o } }") \
        == [(EX + "c",)]
    assert rows(store, "SELECT ?s WHERE { GRAPH :g { ?s :q ?o } }") == []


def test_insert_template_bnode_per_solution(store):
    store.update(P + "INSERT { ?s :meta [ :src ?o ] } WHERE { ?s :p ?o }")
    got = rows(store, "SELECT ?b ?o WHERE { ?s :meta ?b . ?b :src ?o }")
    assert len(got) == 2
    # distinct bnode per solution row
    assert got[0][0] != got[1][0]


def test_clear_and_drop(store):
    store.update(P + "CLEAR GRAPH :g")
    assert len(store) == 2
    store.update(P + "CLEAR DEFAULT")
    assert len(store) == 0


def test_copy_move_add(store):
    store.update(P + "COPY DEFAULT TO GRAPH :bak")
    assert rows(store, "SELECT ?s WHERE { GRAPH :bak { ?s :p ?o } }") == [
        (EX + "a",), (EX + "b",)]
    assert len(store) == 5
    store.update(P + "MOVE GRAPH :g TO GRAPH :g2")
    assert rows(store, "SELECT ?s WHERE { GRAPH :g { ?s ?p ?o } }") == []
    assert rows(store, "SELECT ?s WHERE { GRAPH :g2 { ?s ?p ?o } }") \
        == [(EX + "c",)]
    # ADD keeps the target's existing quads; COPY would replace them
    store.update(P + "ADD GRAPH :g2 TO GRAPH :bak")
    assert len(rows(store, "SELECT ?s WHERE { GRAPH :bak { ?s ?p ?o } }")) == 3


def test_load(store, tmp_path):
    f = tmp_path / "in.ttl"
    f.write_text(f'<{EX}z> <{EX}p> "loaded" .')
    store.update(P + f"LOAD <file://{f}> INTO GRAPH :ld")
    assert rows(store, "SELECT ?o WHERE { GRAPH :ld { :z :p ?o } }") \
        == [("loaded",)]
    # SILENT swallows a missing file; non-silent raises
    store.update(P + "LOAD SILENT <file:///nope/missing.ttl>")
    with pytest.raises(Exception):
        store.update(P + "LOAD <file:///nope/missing.ttl>")


def test_operation_sequence(store):
    store.update(P + """
        INSERT DATA { :s1 :k "v" } ;
        DELETE WHERE { :s1 :k ?o } ;
        INSERT DATA { :s2 :k "w" }
    """)
    assert rows(store, "SELECT ?s ?o WHERE { ?s :k ?o }") == [(EX + "s2", "w")]


def test_programmatic_api(store, spark):
    q = (None, NamedNode(EX + "px"), NamedNode(EX + "p"), Literal("9"))
    store.insert(q)
    assert store.contains(*q[1:], graph=None)
    store.insert(q)  # set semantics
    assert len(store) == 4
    store.remove(q)
    assert not store.contains(*q[1:], graph=None)
    names = {t.iri for t in store.named_graph_names()}
    assert names == {EX + "g"}
    store.clear()
    assert len(store) == 0


def test_graph_management_api(store, tmp_path):
    g = NamedNode(EX + "g")
    g2 = NamedNode(EX + "g2")
    assert not store.is_empty()
    assert store.contains_named_graph(g)
    assert not store.contains_named_graph(g2)
    store.insert_named_graph(
        g2, [(NamedNode(EX + "d"), NamedNode(EX + "q"), Literal("4"))])
    assert store.contains_named_graph(g2)
    store.validate()
    # per-graph dump serializes only that graph's triples
    out = str(tmp_path / "g2.nt")
    store.dump_graph(out, graph_name=g2, format="nt")
    dumped = GraphStore.from_ntriples(store.spark, out)
    assert len(dumped) == 1
    assert dumped.contains(NamedNode(EX + "d"), NamedNode(EX + "q"),
                           Literal("4"), graph=None)
    store.remove_named_graph(g2)
    assert not store.contains_named_graph(g2)
    # clear_graph(None) clears only the default graph
    store.clear_graph(None)
    assert rows(store, "SELECT ?s WHERE { ?s ?p ?o }") == []
    assert store.contains_named_graph(g)
    assert store.optimize().contains_named_graph(g)


def test_validate_rejects_malformed(spark):
    from pyspark.sql import functions as F
    from rdf_fusion_spark.store import COL_SUBJECT
    st = GraphStore.from_python_quads(spark, [
        (None, NamedNode(EX + "a"), NamedNode(EX + "p"), Literal("1"))])
    st.quads = st.quads.withColumn(
        COL_SUBJECT, F.lit(None).cast(st.quads.schema[COL_SUBJECT].dataType))
    with pytest.raises(ValueError, match="malformed"):
        st.validate()


def test_drop_missing_graph_errors_unless_silent(spark):
    from rdf_fusion_spark.plans.update import UpdateError
    store = GraphStore.from_python_quads(spark, [
        (None, NamedNode(EX + "a"), NamedNode(EX + "p"), Literal("1"))])
    # SILENT: no-op on a non-existent graph
    store.update(f"DROP SILENT GRAPH <{EX}nope>")
    # without SILENT: an error (a graph exists iff it has quads)
    with pytest.raises(UpdateError, match="does not exist"):
        store.update(f"DROP GRAPH <{EX}nope>")
    # an existing graph drops fine without SILENT
    g = NamedNode(EX + "g")
    store.update(f"INSERT DATA {{ GRAPH <{EX}g> {{ <{EX}x> <{EX}p> 1 }} }}")
    store.update(f"DROP GRAPH <{EX}g>")
    assert not store.contains_named_graph(g)
