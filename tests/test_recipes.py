"""The composed curation funnel (pipeline/recipes.py) checked against a
DuckDB oracle assembled from the SAME oracle fragments the driver gate
uses for the individual operators — so the composition is verified with
the operators' own ground truth, not a re-derivation."""

import os

import duckdb
import pytest
from pyspark.sql import functions as F

from rdf_fusion_spark import entry_queries as EQ

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

MIN_QUALITY = 0.72
LSH_THRESHOLD = 0.5
BENCH_MOD = 37
SAMPLE_RATE = 0.8


def _oracle_funnel(con) -> list:
    oracles = EQ._pipeline_oracles()
    lq = oracles["q_text_language_id"]
    pairs = oracles["q_dedup_minhash_lsh"].replace(
        "FROM documents", "FROM __ek")
    decon = oracles["q_decontaminate"].replace("FROM documents", "FROM __nk")
    con.execute(f"""
    CREATE OR REPLACE TEMP VIEW __lq AS {lq};
    CREATE OR REPLACE TEMP VIEW __base AS
      SELECT d.doc_id, d.text, d.source,
             len(string_split(d.text, ' ')) AS n_tokens,
             lq.lang_pred, lq.quality_score
      FROM documents d JOIN (SELECT q.doc_id, q.lang_pred, q.quality_score
                             FROM __lq q) lq USING (doc_id);
    CREATE OR REPLACE TEMP VIEW __lang AS
      SELECT * FROM __base WHERE lang_pred = 'en';
    CREATE OR REPLACE TEMP VIEW __qual AS
      SELECT * FROM __lang WHERE quality_score >= {MIN_QUALITY};
    CREATE OR REPLACE TEMP VIEW __rep AS
      SELECT * FROM __qual WHERE (
        WITH w AS (SELECT string_split(text, ' ') AS ws)
        SELECT CASE WHEN len(ws) >= 2
               THEN 1.0 - len(list_distinct(list_transform(
                        generate_series(1, len(ws) - 1),
                        i -> ws[i] || ' ' || ws[i+1])))::DOUBLE
                    / (len(ws) - 1)::DOUBLE
               ELSE 0.0 END FROM w) <= 0.5;
    CREATE OR REPLACE TEMP VIEW __ek AS
      SELECT * FROM __rep WHERE doc_id IN (
        SELECT MIN(doc_id) FROM __rep GROUP BY md5(text));
    CREATE OR REPLACE TEMP VIEW __pairs AS {pairs};
    CREATE OR REPLACE TEMP VIEW __nk AS
      SELECT * FROM __ek
      WHERE doc_id NOT IN (SELECT id_b FROM __pairs);
    CREATE OR REPLACE TEMP VIEW __decon AS {decon};
    CREATE OR REPLACE TEMP VIEW __clean AS
      SELECT nk.* FROM __nk nk
      JOIN __decon dc USING (doc_id)
      WHERE NOT dc.is_contaminated;
    CREATE OR REPLACE TEMP VIEW __sampled AS
      SELECT * FROM __clean
      WHERE ('0x'||substr(md5(doc_id::VARCHAR),1,8))::BIGINT
            < {SAMPLE_RATE} * 4294967296.0;
    """)
    out = []
    for name, view in [("input", "__base"), ("lang_filter", "__lang"),
                       ("quality_filter", "__qual"),
                       ("repetition_filter", "__rep"),
                       ("exact_dedup", "__ek"),
                       ("near_dedup", "__nk"), ("decontaminate", "__clean"),
                       ("mix_sample", "__sampled")]:
        n, t = con.execute(
            f"SELECT COUNT(*), COALESCE(SUM(n_tokens),0) FROM {view}"
        ).fetchone()
        out.append((name, int(n), int(t)))
    n, t = con.execute(f"""
      WITH c AS (SELECT doc_id, doc_id % 8 AS shard,
                        n_tokens AS toks,
                        SUM(n_tokens) OVER (PARTITION BY doc_id % 8
                            ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                          - n_tokens AS before
                 FROM __sampled)
      SELECT COUNT(DISTINCT (shard, (before // 1024))), SUM(toks) FROM c
    """).fetchone()
    out.append(("packed", int(n), int(t)))
    return out


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")
    return con


def test_curation_funnel_matches_oracle(spark, ddb):
    from rdf_fusion_spark.pipeline.recipes import curation_pipeline
    got = curation_pipeline(
        EQ._docs(spark, SF_DIR),
        keep_lang="en", min_quality=MIN_QUALITY,
        lsh_threshold=LSH_THRESHOLD, bench_mod=BENCH_MOD,
        sample_rate=F.lit(SAMPLE_RATE),
    ).orderBy("stage_idx").collect()
    want = _oracle_funnel(ddb)
    assert [(r["stage"], r["n_docs"], r["n_tokens"]) for r in got] == want
    # the funnel is monotone through the filter stages
    counts = [r["n_docs"] for r in got[:-1]]
    assert counts == sorted(counts, reverse=True)
    assert got[0]["n_docs"] > got[-2]["n_docs"] > 0


def test_curation_funnel_substring_dedup_stage(spark):
    """Optional ExactSubstr stage (round-7 verdict #2): rewrites the
    near-dedup survivors with duplicated >=k-token spans removed. Doc
    count can only drop (fully-duplicated docs empty out); token count
    strictly bounds above the packed output."""
    from rdf_fusion_spark.pipeline.recipes import curation_pipeline
    got = curation_pipeline(
        EQ._docs(spark, SF_DIR),
        keep_lang="en", min_quality=MIN_QUALITY,
        lsh_threshold=LSH_THRESHOLD, bench_mod=BENCH_MOD,
        sample_rate=F.lit(SAMPLE_RATE), substring_dedup=True,
    ).orderBy("stage_idx").collect()
    stages = [r["stage"] for r in got]
    assert "substring_dedup" in stages
    i = stages.index("substring_dedup")
    assert stages[i - 1] == "near_dedup"
    near, sub = got[i - 1], got[i]
    assert 0 < sub["n_docs"] <= near["n_docs"]
    assert 0 < sub["n_tokens"] <= near["n_tokens"]
    # downstream stages consume the REWRITTEN corpus and still complete
    assert stages[-1] == "packed" and got[-1]["n_tokens"] > 0


def test_top_k_per_group_deterministic(spark):
    from rdf_fusion_spark.pipeline.curation import top_k_per_group
    rows = [(i, f"s{i % 3}", float(i % 5)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, source string, score double")
    got = top_k_per_group(df, 2, "source", "score", "doc_id").collect()
    by_group = {}
    for r in got:
        by_group.setdefault(r.source, []).append((r.rank, r.doc_id, r.score))
    assert set(by_group) == {"s0", "s1", "s2"}
    for g, rows_ in by_group.items():
        assert sorted(r[0] for r in rows_) == [1, 2]
        # brute force: best score desc, then lowest doc_id
        want = sorted([(d, s) for d, src, s in
                       [(i, f"s{i % 3}", float(i % 5)) for i in range(30)]
                       if src == g], key=lambda t: (-t[1], t[0]))[:2]
        assert sorted((d, s) for _, d, s in rows_) == sorted(want)
