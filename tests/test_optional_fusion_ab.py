"""A/B coverage for the OPTIONAL-star chain fusion (r11 opt; r11 ADVICE
#3): every shape runs with ctx.optimize on AND off and must return
identical rows — fused where eligible, generic fallback where a guard
must bail (shared object var, filter referencing the left side, unbound
subject). The eligible shape additionally asserts the fusion actually
fired (fewer scans than the unfused plan), so a silently-dead guard or a
silently-dead fusion both fail loudly."""

import io
import sys

import pytest  # noqa: F401

from rdf_fusion_spark.entry_queries import PROLOGUE, get_graph

SF_DIR = "/root/testdata/sf0.001"


def _rows(res):
    import pyspark.sql.functions as F

    from rdf_fusion_spark.functions.typed_ops import lexical_of
    df = res.df.select(*[lexical_of(F.col(c)).alias(c)
                         for c in sorted(res.df.columns)])
    return sorted(tuple(None if v is None else str(v) for v in r)
                  for r in df.collect())


def _scan_count(df) -> int:
    buf = io.StringIO()
    stdout, sys.stdout = sys.stdout, buf
    try:
        df.explain("formatted")
    finally:
        sys.stdout = stdout
    return buf.getvalue().count("Scan parquet")


def _ab(spark, query):
    store = get_graph(spark, SF_DIR)
    fast = store.query(query)
    slow = store.query(query, optimize=False)
    r_fast, r_slow = _rows(fast), _rows(slow)
    assert r_fast == r_slow
    return fast, slow, r_fast


# eligible: same-subject star of constant mapped predicates, fresh object
# vars, self-contained filters, subject certainly bound on the left
FUSED = PROLOGUE + """
SELECT ?li ?q ?t WHERE {
  ?li l:l_partkey ?p .
  OPTIONAL { ?li l:l_quantity ?q . FILTER(?q >= 25.0) }
  OPTIONAL { ?li l:l_tax ?t . FILTER(?t > 0.02) }
}
"""


def test_fused_chain_matches_and_fires(spark):
    fast, slow, rows = _ab(spark, FUSED)
    assert len(rows) > 0
    # the fusion replaces two per-OPTIONAL scans+joins with one
    # conditional-column scan: strictly fewer scans than the generic plan
    assert _scan_count(fast.df) < _scan_count(slow.df)


# ineligible: the second OPTIONAL reuses ?v — not globally fresh, the
# chain guard must stop before it (partial fusion of the first is fine)
SHARED_OBJECT = PROLOGUE + """
SELECT ?li ?v WHERE {
  ?li l:l_partkey ?p .
  OPTIONAL { ?li l:l_tax ?v }
  OPTIONAL { ?li l:l_discount ?v }
}
"""


def test_shared_object_var_bails(spark):
    _, _, rows = _ab(spark, SHARED_OBJECT)
    assert len(rows) > 0


# ineligible: the OPTIONAL's filter references a LEFT-side variable
# (?price), so it is not self-contained in the star's object vars
CORRELATED_FILTER = PROLOGUE + """
SELECT ?li ?t WHERE {
  ?li l:l_extendedprice ?price .
  OPTIONAL { ?li l:l_tax ?t . FILTER(?t * 100000.0 > ?price) }
}
"""


def test_correlated_filter_bails(spark):
    _, _, rows = _ab(spark, CORRELATED_FILTER)
    assert len(rows) > 0


# ineligible: the OPTIONAL's subject is NOT bound on the left at all —
# fusing would change multiplicity; the generic left join must run
UNBOUND_SUBJECT = PROLOGUE + """
SELECT ?n ?t WHERE {
  ?nat n:n_name ?n .
  OPTIONAL { ?li l:l_tax ?t . FILTER(?t > 0.07) }
}
"""


def test_unbound_subject_bails(spark):
    _, _, rows = _ab(spark, UNBOUND_SUBJECT)
    assert len(rows) > 0


# ineligible: many-valued join through an OBJECT variable (the
# q_optional_highqty shape) — the optional's subject var is bound, but
# its patterns join through ?ord which maps object-side; the fused
# conditional-column form would be wrong for one-to-many
OBJECT_JOIN = PROLOGUE + """
SELECT ?ord ?pr WHERE {
  ?li l:l_orderkey ?ord .
  OPTIONAL { ?o2 o:o_totalprice ?pr . FILTER(?pr > 100000.0)
             . ?li l:l_orderkey ?o2 }
}
"""


def test_object_var_join_bails(spark):
    _, _, rows = _ab(spark, OBJECT_JOIN)
    assert len(rows) > 0
