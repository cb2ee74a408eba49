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


# (Excluded by design: q_ann_ivf — centroid assignment broadcasts the
# O(nlist)-row centroid table against the corpus scan, a bounded-side
# nested loop that IS the IVF coarse-quantization plan.)
PIPELINE_SCALE_SAFE = [
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_dedup_simhash",
    "q_dedup_embedding_cosine",
    "q_dedup_clusters",
    "q_ann_lsh",
    "q_text_stats",
    "q_text_top_words",
    "q_text_chunks",
    "q_decontaminate",
    "q_pack_shards",
    "q_mix_weighted",
    "q_events_sessionize",
    "q_events_json_props",
    # round-4 additions: graph analytics + corpus reports
    "q_graph_pagerank",
    "q_graph_triangles",
    "q_text_token_percentiles",
    "q_train_val_split",
    # round-7/8 additions: sub-document dup, PII, temporal joins,
    # per-group curation. Excluded by design, like q_ann_ivf:
    # q_dedup_semantic (centroid assignment IS the bounded broadcast
    # nested loop of IVF coarse quantization) and q_text_tfidf_terms /
    # q_text_bm25_topk (1-row corpus-stats scalar attached by a bounded
    # broadcast cross join — the bi_q6 global-average shape)
    "q_pii_scan",
    "q_dedup_substring",
    "q_dedup_substring_removal",
    "q_text_repetition",
    "q_events_asof",
    "q_events_interval_join",
    "q_curation_topk_quality",
    "q_dedup_incremental",
    "q_dedup_index_merge",
]


@pytest.mark.parametrize("name", PIPELINE_SCALE_SAFE)
def test_pipeline_plans_have_no_nested_loops(spark, name):
    """LLM-pipeline operators must stay hash-join/bucket-join shaped: a
    nested loop anywhere means the candidate-generation trick (banding,
    LSH buckets, IVF cells) silently degraded to all-pairs."""
    from rdf_fusion_spark.plans.translator import _explain
    df = EQ.queries()[name](spark, SF_DIR)
    ex = _explain(df)
    ex.assert_scale_safe()


def test_guard_breach_named_in_explanation(spark):
    """>3 statically-nullable shared vars falls past the split-union guard
    to the IS_COMPATIBLE theta join — the explanation must NAME the vars
    (round-3 verdict item 8)."""
    from rdf_fusion_spark import GraphStore

    nt = "\n".join(
        f"<http://ex/s{i}> <http://ex/p{j}> <http://ex/o{i}{j}> ."
        for i in range(3) for j in range(4)) + "\n"
    import tempfile, os
    d = tempfile.mkdtemp()
    open(os.path.join(d, "g.nt"), "w").write(nt)
    st = GraphStore.load(spark, os.path.join(d, "g.nt"))
    # two UNION arms each bind a different subset of ?a ?b ?c ?d → all four
    # are statically nullable on both sides of the join
    q = """
    SELECT * WHERE {
      { { ?s <http://ex/p0> ?a . ?s <http://ex/p1> ?b }
        UNION { ?s <http://ex/p2> ?c . ?s <http://ex/p3> ?d } }
      { { ?t <http://ex/p0> ?a . ?t <http://ex/p1> ?b }
        UNION { ?t <http://ex/p2> ?c . ?t <http://ex/p3> ?d } }
    }
    """
    res = st.query(q)
    assert res.guard_breaches, "expected a recorded guard breach"
    br = res.guard_breaches[0]
    assert set(br["nullable_shared"]) == {"a", "b", "c", "d"}
    ex = res.explanation()
    assert ex.split_union_guard_breaches
    if ex.nested_loop_joins():
        with pytest.raises(AssertionError, match="nullable shared vars"):
            ex.assert_scale_safe()


# Reference benchmark mirrors that are pure equi-join/aggregation shapes.
# Excluded by design: q_bsbm_explore_q5 (range-similarity theta around a
# 1-row pinned product — broadcast by construction), q_bsbm_bi_q6 (1-row
# global-average scalar cross), q_bsbm_explore_q2_* / q7 / q12
# (constant-subject seeds: groups sharing no variables with the 1-row
# anchor are left/inner CROSS joins by SPARQL semantics — bounded by the
# single anchor row). q_bsbm_bi_q4 joined the list in round 7: the
# complement-aggregation rewrite (translator._translate_complement_agg)
# replaced its DISTINCT-features × offers cross join with two linear
# aggregation passes.
MIRROR_SCALE_SAFE = [
    "q_bsbm_bi_q4",
    "q_bsbm_explore_q1",
    "q_bsbm_explore_q3",
    "q_bsbm_explore_q4",
    "q_bsbm_explore_q8",
    "q_bsbm_explore_q9",
    "q_bsbm_explore_q10",
    "q_bsbm_explore_q11",
    "q_bsbm_bi_q1",
    "q_bsbm_bi_q2",
    "q_bsbm_bi_q3",
    "q_bsbm_bi_q5",
    "q_bsbm_bi_q7",
    "q_bsbm_bi_q8",
    "q_windfarm_production",
    "q_windfarm_production1",
    "q_windfarm_production3",
    "q_windfarm_production4",
    "q_windfarm_grouped",
    "q_windfarm_grouped1",
    "q_windfarm_grouped2",
    "q_windfarm_grouped4",
    "q_windfarm_minute10",
]


@pytest.mark.parametrize("name", MIRROR_SCALE_SAFE)
def test_mirror_plans_have_no_nested_loops(spark, name):
    from rdf_fusion_spark.plans.translator import _explain
    df = EQ.queries()[name](spark, SF_DIR)
    _explain(df).assert_scale_safe()
