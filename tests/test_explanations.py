"""Per-query explanation artifact (VERDICT r2 #10): the plan audits from
the round-2 verdict become enforced invariants — headline queries must not
plan nested-loop joins (BroadcastNestedLoopJoin / CartesianProduct)."""

import pytest

from rdf_fusion_spark import entry_queries as EQ

SF_DIR = "/root/testdata/sf0.001"

# SPARQL headline queries whose semantics never require a cross product.
# (Excluded by design: q_ann_cosine_topk — broadcast query-set × corpus is
# the correct brute-force plan; q_dedup_jaccard_pairs — documented O(n²)
# verification oracle.)
SCALE_SAFE = [
    "q1_pricing_summary",
    "q2_join_region_filter",
    "q3_topk_revenue",
    "q5_star_join",
    "q_optional_highqty",
    "q_nested_optional",
    "q_group_minmax_having",
    "q_subquery_avg_per_nation",
    "q_anti_joins",
    "q_union_distinct",
]


@pytest.fixture(scope="module")
def store(spark):
    from rdf_fusion_spark.sources.virtual import VirtualRelationalStore
    return VirtualRelationalStore(spark, SF_DIR)


def test_explanation_captures_all_three_plans(store):
    res = store.query(EQ.PROLOGUE + EQ.SPECS["q1_pricing_summary"].sparql)
    ex = res.explanation()
    assert "Aggregate" in ex.parsed_logical_plan
    assert "Relation" in ex.optimized_logical_plan or \
        "FileScan" in ex.optimized_logical_plan
    assert "Scan parquet" in ex.physical_plan or \
        "FileScan" in ex.physical_plan
    ex.assert_scale_safe()


@pytest.mark.parametrize("name", SCALE_SAFE)
def test_headline_plans_have_no_nested_loops(store, name):
    res = store.query(EQ.PROLOGUE + EQ.SPECS[name].sparql)
    res.explanation().assert_scale_safe()


def test_assert_scale_safe_catches_bnlj(spark):
    """The invariant actually fires on a genuine cross product."""
    from rdf_fusion_spark.plans.translator import _explain
    a = spark.range(5)
    b = spark.range(5)
    ex = _explain(a.crossJoin(b))
    assert ex.nested_loop_joins()
    with pytest.raises(AssertionError):
        ex.assert_scale_safe()
