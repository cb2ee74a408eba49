"""Programmatic plan builder (round-4 verdict #7): port of the reference's
RdfFusionLogicalPlanBuilder doc example
(lib/logical/src/logical_plan_builder.rs:19-66), plus the Spark selling
point — a builder-produced DataFrame joins against a plain Spark
DataFrame."""

import pytest
from pyspark.sql import functions as F

from rdf_fusion_spark import GraphStore, PlanBuilder

NT = """\
<http://ex/alice> <http://xmlns.com/foaf/0.1/name> "Alice" .
<http://ex/alice> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/Person> .
<http://ex/alice> <http://ex/age> "31"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/bob> <http://xmlns.com/foaf/0.1/name> "Bob" .
<http://ex/bob> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/Person> .
<http://ex/bob> <http://ex/age> "12"^^<http://www.w3.org/2001/XMLSchema#integer> .
<http://ex/rex> <http://xmlns.com/foaf/0.1/name> "Rex" .
<http://ex/rex> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <http://ex/Dog> .
"""


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("pb") / "g.nt"
    p.write_text(NT, encoding="utf-8")
    return GraphStore.load(spark, str(p))


def test_doc_example_pattern_project(store):
    """The reference doc example: match (?s ?p ?o), project ?s."""
    df = PlanBuilder(store).pattern("?s", "?p", "?o").project("s").df()
    assert df.columns == ["s"]
    assert df.count() == 8


def test_builder_composes_operators(store):
    out = (PlanBuilder(store)
           .pattern("?s", "a", "<http://ex/Person>")
           .pattern("?s", "<http://xmlns.com/foaf/0.1/name>", "?name")
           .pattern("?s", "<http://ex/age>", "?age")
           .filter("?age > 18")
           .extend("greeting", 'CONCAT("hi ", STR(?name))')
           .project("name", "greeting")
           .order_by("?name")
           .slice(limit=5)
           .df().collect())
    assert [(r["name"]["v"], r["greeting"]["v"]) for r in out] == \
        [("Alice", "hi Alice")]


def test_builder_join_union_minus(store):
    people = PlanBuilder(store).pattern("?s", "a", "<http://ex/Person>")
    dogs = PlanBuilder(store).pattern("?s", "a", "<http://ex/Dog>")
    named = PlanBuilder(store).pattern(
        "?s", "<http://xmlns.com/foaf/0.1/name>", "?name")

    both = people.union(dogs).join(named).distinct()
    assert sorted(r["name"]["v"] for r in both.df().collect()) == \
        ["Alice", "Bob", "Rex"]

    not_dogs = named.minus(dogs)
    assert sorted(r["name"]["v"] for r in not_dogs.df().collect()) == \
        ["Alice", "Bob"]

    opt = dogs.optional(
        PlanBuilder(store).pattern("?s", "<http://ex/age>", "?age"))
    rows = opt.df().collect()
    assert len(rows) == 1 and rows[0]["age"] is None


def test_builder_df_joins_plain_spark_df(spark, store):
    """The composability selling point: builder output is a DataFrame."""
    names = (PlanBuilder(store)
             .pattern("?s", "<http://xmlns.com/foaf/0.1/name>", "?name")
             .project("name").df())
    extra = spark.createDataFrame(
        [("Alice", "admin"), ("Rex", "dog")], ["key", "role"])
    joined = names.join(extra, names["name"]["v"] == extra["key"])
    got = sorted((r["key"], r["role"]) for r in joined.collect())
    assert got == [("Alice", "admin"), ("Rex", "dog")]


def test_builder_values_and_explanation(store):
    pb = (PlanBuilder(store)
          .values([["<http://ex/alice>"], ["<http://ex/rex>"]], ["?s"])
          .pattern("?s", "<http://xmlns.com/foaf/0.1/name>", "?name"))
    assert sorted(r["name"]["v"] for r in pb.df().collect()) == \
        ["Alice", "Rex"]
    ex = pb.explanation()
    assert ex.physical_plan  # plan capture works through the builder


def test_builder_extend_rejects_rebinding(store):
    pb = PlanBuilder(store).pattern("?s", "?p", "?o")
    with pytest.raises(Exception):
        pb.extend("o", "STR(?s)").df()
