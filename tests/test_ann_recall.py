"""ANN quality gates (round-4 verdict #3/#4): the approximate searches
must actually FIND the true neighbors, not just run scale-safe plans.

Recall is measured against the exact cosine top-k on the driver corpus at
sf0.001/sf0.01. The driver corpus is hard for LSH — true top-k neighbors
sit at ~70 deg (cosine ~0.33) — which is exactly why the defaults are
16 tables x 4 bits (union recall ~0.9; see BASELINE.md round-4 study).
"""

import pytest
from pyspark.sql import functions as F

from rdf_fusion_spark.pipeline import similarity

SF_DIR = "/root/testdata/sf0.01"
K = 3
NUM_QUERIES = 10


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


@pytest.fixture(scope="module")
def exact_pairs(embs):
    out = similarity.cosine_topk(
        embs, embs.where(F.col("vec_id") < NUM_QUERIES), K).collect()
    return {(r["query_id"], r["neighbor_id"]) for r in out}


def _recall(approx_df, exact_pairs):
    approx = {(r["query_id"], r["neighbor_id"]) for r in approx_df.collect()}
    return len(exact_pairs & approx) / len(exact_pairs)


def test_lsh_multitable_recall(embs, exact_pairs):
    out = similarity.lsh_bucket_topk(
        embs, embs.where(F.col("vec_id") < NUM_QUERIES), K)
    assert _recall(out, exact_pairs) >= 0.85


def test_ivf_kmeans_recall(embs, exact_pairs):
    out = similarity.ivf_topk(
        embs, embs.where(F.col("vec_id") < NUM_QUERIES), K)
    assert _recall(out, exact_pairs) >= 0.85


def test_ivf_nprobe_monotone(embs, exact_pairs):
    """More probes can only widen the candidate set."""
    r1 = _recall(similarity.ivf_topk(
        embs, embs.where(F.col("vec_id") < NUM_QUERIES), K, nprobe=1),
        exact_pairs)
    r4 = _recall(similarity.ivf_topk(
        embs, embs.where(F.col("vec_id") < NUM_QUERIES), K, nprobe=4),
        exact_pairs)
    assert r4 >= r1


def test_kmeans_centroids_deterministic(embs):
    a = similarity.kmeans_centroids(embs).collect()
    b = similarity.kmeans_centroids(embs).collect()
    assert sorted((r["cid"], tuple(r["cv"])) for r in a) == \
        sorted((r["cid"], tuple(r["cv"])) for r in b)
    assert len(a) == similarity.IVF_NLIST


def test_lsh_multiprobe_superset(embs, exact_pairs):
    """Multi-probe widens each table's candidate set — recall can only
    improve over the same tables without probes."""
    from pyspark.sql import functions as F
    q = embs.where(F.col("vec_id") < NUM_QUERIES)
    base = _recall(similarity.lsh_bucket_topk(
        embs, q, K, bits=6, num_tables=4), exact_pairs)
    probed = _recall(similarity.lsh_bucket_topk(
        embs, q, K, bits=6, num_tables=4, multiprobe=True), exact_pairs)
    assert probed >= base


def test_quantized_recall_near_exact(embs, exact_pairs):
    """int8 scalar quantization must barely perturb the ranking:
    recall@K vs the full-precision exact top-k stays >= 0.9."""
    from pyspark.sql import functions as F
    q = embs.where(F.col("vec_id") < NUM_QUERIES)
    got = similarity.quantized_cosine_topk(embs, q, K)
    assert _recall(got, exact_pairs) >= 0.9
