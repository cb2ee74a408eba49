"""MIN/MAX hash-aggregate decomposition (r12): for value-canonical
numeric inputs and identity-keyed string kinds the term-struct min_by
becomes a primitive min/max + canonical rebuild (translator
_minmax_decomposed). These tests pin (a) result equivalence vs the
unoptimized translation, (b) the plan actually switching to
HashAggregate for all-numeric aggregates, and (c) the non-canonical
constant guard — a "05"^^xsd:integer winner must keep its lexical, so
the decomposition must NOT fire for it."""

import io
import sys

import pyspark.sql.functions as F

from rdf_fusion_spark.entry_queries import PROLOGUE, get_graph
from rdf_fusion_spark.functions.typed_ops import lexical_of

SF_DIR = "/root/testdata/sf0.001"


def _rows(res):
    df = res.df.select(*[lexical_of(F.col(c)).alias(c)
                         for c in sorted(res.df.columns)])
    return sorted(tuple(None if v is None else str(v) for v in r)
                  for r in df.collect())


def _plan(df) -> str:
    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue()


NUMERIC_AGG = PROLOGUE + """
SELECT ?nat (MIN(?ab) AS ?lo) (MAX(?ab) AS ?hi) (COUNT(*) AS ?n) WHERE {
  ?cust c:c_nationkey ?nat ; c:c_acctbal ?ab .
} GROUP BY ?nat
"""


def test_numeric_minmax_hash_aggregates(spark):
    store = get_graph(spark, SF_DIR)
    fast = store.query(NUMERIC_AGG)
    slow = store.query(NUMERIC_AGG, optimize=False)
    assert _rows(fast) == _rows(slow)
    assert len(_rows(fast)) > 0
    p = _plan(fast.df)
    assert "SortAggregate" not in p
    assert "HashAggregate" in p


STRING_MIN = PROLOGUE + """
SELECT ?nat (MIN(?cn) AS ?first) WHERE {
  ?cust c:c_nationkey ?nat ; c:c_name ?cn .
} GROUP BY ?nat
"""


def test_string_min_rebuild_matches(spark):
    store = get_graph(spark, SF_DIR)
    fast = store.query(STRING_MIN)
    slow = store.query(STRING_MIN, optimize=False)
    assert _rows(fast) == _rows(slow)
    assert len(_rows(fast)) > 0


MAX_OVER_COUNT = PROLOGUE + """
SELECT ?nname (MAX(?cnt) AS ?maxCnt) WHERE {
  { SELECT ?nname ?part (COUNT(?li) AS ?cnt) WHERE {
      ?li l:l_partkey ?part . ?li l:l_orderkey ?ord .
      ?ord o:o_custkey ?cust . ?cust c:c_nationkey ?nat .
      ?nat n:n_name ?nname . } GROUP BY ?nname ?part }
} GROUP BY ?nname
"""


def test_max_over_count_output(spark):
    """The bi_q5 shape: the inner COUNT output is constructor-built
    (canonical), so the outer MAX decomposes to a long/decimal
    hash-aggregate; results must match the generic translation."""
    store = get_graph(spark, SF_DIR)
    fast = store.query(MAX_OVER_COUNT)
    slow = store.query(MAX_OVER_COUNT, optimize=False)
    assert _rows(fast) == _rows(slow)
    assert len(_rows(fast)) > 0


NONCANON_CONST = PROLOGUE + """
SELECT (MIN(?v) AS ?m) WHERE {
  ?nat n:n_name ?n .
  BIND("05"^^xsd:integer AS ?v)
}
"""


def test_noncanonical_constant_guard(spark):
    """A non-canonically-written integer constant must round-trip its
    ORIGINAL lexical through MIN — the vcanon guard must block the
    rebuild (which would print '5')."""
    store = get_graph(spark, SF_DIR)
    res = store.query(NONCANON_CONST)
    rows = res.df.select(F.col("m")["v"].alias("lex"),
                         F.col("m")["dt"].alias("dt")).collect()
    assert len(rows) == 1
    assert rows[0]["lex"] == "05"


SUBTYPE_CONST = PROLOGUE + """
SELECT (MAX(?v) AS ?m) WHERE {
  ?nat n:n_name ?n .
  BIND("5"^^xsd:int AS ?v)
}
"""


def test_subtype_datatype_guard(spark):
    """xsd:int (a subtype, not the canonical xsd:integer) must survive
    MAX with its datatype intact."""
    store = get_graph(spark, SF_DIR)
    res = store.query(SUBTYPE_CONST)
    rows = res.df.select(F.col("m")["dt"].alias("dt")).collect()
    assert len(rows) == 1
    assert rows[0]["dt"].endswith("int")


CANON_CONST = PROLOGUE + """
SELECT (MAX(?v) AS ?m) WHERE {
  ?nat n:n_name ?n .
  BIND(42 AS ?v)
}
"""


def test_canonical_constant_decomposes_exactly(spark):
    store = get_graph(spark, SF_DIR)
    res = store.query(CANON_CONST)
    rows = res.df.select(F.col("m")["v"].alias("lex"),
                         F.col("m")["dt"].alias("dt")).collect()
    assert rows[0]["lex"] == "42"
