"""Custom function registry, EXISTS as a general expression, deep Kleene."""

import pytest

from rdf_fusion_spark import GraphStore, Literal, NamedNode
from rdf_fusion_spark.functions import registry
from rdf_fusion_spark.functions import typed_ops as tv

EX = "http://example.org/"
P = NamedNode(EX + "p")


@pytest.fixture(scope="module")
def chain_store(spark):
    n = 80
    quads = [(None, NamedNode(f"{EX}n{i}"), P, NamedNode(f"{EX}n{i+1}"))
             for i in range(n - 1)]
    return GraphStore.from_python_quads(spark, quads)


def test_deep_kleene_chain(chain_store):
    res = chain_store.query(
        f"SELECT ?x ?y WHERE {{ ?x <{P.iri}>+ ?y }}")
    assert res.df.count() == 79 * 80 // 2  # all ordered pairs along the chain


@pytest.fixture(scope="module")
def people(spark):
    name = NamedNode(EX + "name")
    knows = NamedNode(EX + "knows")
    a, b, c = (NamedNode(EX + x) for x in "abc")
    quads = [
        (None, a, name, Literal("alice")),
        (None, b, name, Literal("bob")),
        (None, c, name, Literal("carol")),
        (None, a, knows, b),
    ]
    return GraphStore.from_python_quads(spark, quads)


def test_exists_in_bind(people):
    res = people.query(f"""
        SELECT ?n ?social WHERE {{
          ?x <{EX}name> ?n .
          BIND(IF(EXISTS {{ ?x <{EX}knows> ?y }}, "yes", "no") AS ?social)
        }}
    """)
    got = {(r["n"]["v"], r["social"]["v"]) for r in res.df.collect()}
    assert got == {("alice", "yes"), ("bob", "no"), ("carol", "no")}


def test_exists_under_or(people):
    res = people.query(f"""
        SELECT ?n WHERE {{
          ?x <{EX}name> ?n .
          FILTER(EXISTS {{ ?x <{EX}knows> ?y }} || ?n = "carol")
        }}
    """)
    got = sorted(r["n"]["v"] for r in res.df.collect())
    assert got == ["alice", "carol"]


def test_not_exists_in_bind(people):
    res = people.query(f"""
        SELECT ?n ?lonely WHERE {{
          ?x <{EX}name> ?n .
          BIND(NOT EXISTS {{ ?x <{EX}knows> ?y }} AS ?lonely)
        }}
    """)
    got = {(r["n"]["v"], r["lonely"]["v"]) for r in res.df.collect()}
    assert got == {("alice", "false"), ("bob", "true"), ("carol", "true")}


def test_custom_function_registry(people):
    iri = EX + "fn/shout"
    registry.register(
        iri,
        lambda args: tv.string_term(
            __import__("pyspark.sql.functions", fromlist=["upper"]).upper(
                args[0]["v"])),
    )
    try:
        res = people.query(f"""
            SELECT (<{iri}>(?n) AS ?up) WHERE {{ ?x <{EX}name> ?n }}
        """)
        got = sorted(r["up"]["v"] for r in res.df.collect())
        assert got == ["ALICE", "BOB", "CAROL"]
    finally:
        registry.unregister(iri)


def test_unknown_function_still_errors(people):
    from rdf_fusion_spark.functions.builtins import SparqlCompileError
    with pytest.raises(SparqlCompileError):
        people.query(f"""
            SELECT (<{EX}fn/missing>(?n) AS ?v) WHERE {{ ?x <{EX}name> ?n }}
        """)
