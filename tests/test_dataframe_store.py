"""VirtualDataFrameStore: SPARQL over arbitrary in-session DataFrames
(the W3C-Direct-Mapping generalization of the TPC-H warehouse mapping)."""

import pytest

from rdf_fusion_spark import VirtualDataFrameStore
from rdf_fusion_spark.terms import term_to_python


@pytest.fixture(scope="module")
def store(spark):
    people = spark.createDataFrame(
        [(1, "Ada", 10), (2, "Bob", 20), (3, "Cee", 10)],
        "pid long, name string, city_id long")
    cities = spark.createDataFrame(
        [(10, "Lisbon"), (20, "Porto")], "cid long, cname string")
    return VirtualDataFrameStore(
        spark, {"people": people, "cities": cities},
        keys={"people": ["pid"], "cities": ["cid"]},
        fks={"people": {"city_id": "cities"}})


def test_fk_join_star(store):
    res = store.query("""
      SELECT ?n ?cn WHERE {
        ?p <x:people#name> ?n .
        ?p <x:people#city_id> ?c .
        ?c <x:cities#cname> ?cn .
      } ORDER BY ?n
    """)
    rows = [(term_to_python(r["n"]).lexical, term_to_python(r["cn"]).lexical)
            for r in res.df.collect()]
    assert rows == [("Ada", "Lisbon"), ("Bob", "Porto"), ("Cee", "Lisbon")]


def test_type_anchor_and_aggregate(store):
    res = store.query("""
      SELECT ?cn (COUNT(?p) AS ?n) WHERE {
        ?p a <x:class:people> ; <x:people#city_id> ?c .
        ?c <x:cities#cname> ?cn .
      } GROUP BY ?cn ORDER BY ?cn
    """)
    rows = [(term_to_python(r["cn"]).lexical,
             int(term_to_python(r["n"]).lexical)) for r in res.df.collect()]
    assert rows == [("Lisbon", 2), ("Porto", 1)]


def test_plan_is_virtual_star(store):
    """The star pattern must compile to direct table scans — never a
    materialized quads union."""
    import contextlib
    import io
    res = store.query(
        "SELECT ?n WHERE { ?p <x:people#name> ?n ; "
        "<x:people#city_id> ?c }")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.df.explain(mode="formatted")
    plan = buf.getvalue()
    # createDataFrame sources appear as one of these two leaf scans; the
    # quads union must never appear
    assert "Scan ExistingRDD" in plan or "LocalTableScan" in plan, plan
    assert "Union" not in plan, plan


def test_graph_enumeration(store):
    res = store.query(
        "SELECT DISTINCT ?g WHERE { GRAPH ?g { ?s ?p ?o } } ORDER BY ?g")
    names = [term_to_python(r["g"]).iri for r in res.df.collect()]
    assert names == ["x:graph:cities", "x:graph:people"]


def test_update_rejected_or_supported(store):
    # DataFrame-backed stores are read-only views; INSERT mutates the
    # quads property (materializing) — just assert query-side works and
    # duplicate registration round-trips
    from rdf_fusion_spark.sources.relational import register_table_mapping
    with pytest.raises(ValueError):
        register_table_mapping("another", code="people")


@pytest.fixture(scope="module")
def negation_store(spark):
    """Fixture for the SIP-into-negation-scope soundness regression: a
    row matching the outer constraint carries no `v`, another row
    carries `v` but fails the constraint."""
    t = spark.createDataFrame(
        [(1, "yes", None), (2, "no", "a")],
        "tid long, flag string, v string")
    return VirtualDataFrameStore(spark, {"t": t}, keys={"t": ["tid"]})


def test_sip_not_injected_into_minus_scope(negation_store):
    """Ambient constants from an OPTIONAL's left side must NOT prune
    BGPs inside a MINUS right side: those rows only *cancel* other rows
    (round-5 ADVICE, translator.py SIP). The MINUS operand here matches
    a row that fails the outer `flag="yes"` constraint — it must still
    cancel the OPTIONAL row, leaving ?x/?v unbound."""
    res = negation_store.query("""
      SELECT ?s ?x ?v WHERE {
        ?s <x:t#flag> "yes" .
        OPTIONAL { ?x <x:t#v> ?v . MINUS { ?s2 <x:t#v> ?v } }
      }
    """)
    rows = res.df.collect()
    assert len(rows) == 1
    assert rows[0]["x"] is None and rows[0]["v"] is None


def test_sip_not_injected_into_unbound_optional_scope_join(negation_store):
    """Round-6 ADVICE (high): a Join's symmetric SIP push must not prune
    a BGP inside an OPTIONAL whose mandatory side leaves the constrained
    variable unbound — pruning flips matched rows into NULL-padded rows
    and NULL is join-compatible with anything. Correct answer: 0 rows
    (the optional binds ?s to the flag="no" row, incompatible with the
    outer flag="yes" triple)."""
    res = negation_store.query("""
      SELECT ?s ?x ?junk WHERE {
        { ?x <x:t#tid> ?xt OPTIONAL { ?s <x:t#v> ?junk } }
        ?s <x:t#flag> "yes" .
      }
    """)
    assert res.df.count() == 0


def test_sip_not_injected_into_nested_unbound_optional_scope(negation_store):
    """Same class via the LeftJoin push path: the outer OPTIONAL's
    constraint on ?s must be dropped at the NESTED OPTIONAL whose
    mandatory side (?x tid ?xt) does not bind ?s. Correct answer: 1
    NULL-padded row (the nested optional binds ?s to the flag="no" row,
    so the outer optional finds no compatible right row)."""
    res = negation_store.query("""
      SELECT ?s ?x ?junk WHERE {
        ?s <x:t#flag> "yes" .
        OPTIONAL { ?x <x:t#tid> ?xt OPTIONAL { ?s <x:t#v> ?junk } }
      }
    """)
    rows = res.df.collect()
    assert len(rows) == 1
    assert rows[0]["x"] is None and rows[0]["junk"] is None


def test_sip_not_injected_into_not_exists_scope(negation_store):
    res = negation_store.query("""
      SELECT ?s ?x ?v WHERE {
        ?s <x:t#flag> "yes" .
        OPTIONAL { ?x <x:t#v> ?v .
                   FILTER NOT EXISTS { ?s2 <x:t#v> ?v } }
      }
    """)
    rows = res.df.collect()
    assert len(rows) == 1
    assert rows[0]["x"] is None and rows[0]["v"] is None
