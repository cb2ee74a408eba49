"""Similarity search over embedding columns (array<float>).

Two tiers:

* brute-force cosine top-k — exact baseline. Broadcast the (small) query
  set against the corpus scan: one pass, no shuffle of the corpus, then a
  per-query top-k (TakeOrdered-style, no global sort). Linear in corpus
  size — the right shape when the query set fits in a broadcast.
* sign-LSH bucketed top-k — the scale path: bucket vectors by the sign
  pattern of leading dimensions (a degenerate but deterministic
  random-hyperplane LSH; swap in seeded hyperplanes per deployment), then
  search only within the query's bucket. One shuffle on the bucket key;
  each bucket's candidate set is a tiny fraction of the corpus.

All arithmetic is double-precision Column expressions (F.zip_with /
F.aggregate fold left-to-right) so an ANSI oracle can replicate results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(vec: Column) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact cosine top-k: (query_id, rank, neighbor_id, cosine).

    Deterministic tiebreak on neighbor id. Self-matches excluded when the
    query set is drawn from the corpus.
    """
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("qv"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))


SIGN_BITS = 8


def sign_bucket(vec: Column, bits: int = SIGN_BITS) -> Column:
    """Deterministic LSH bucket id: sign bits of the first `bits` dims."""
    parts = [
        F.when(F.element_at(vec, i + 1) >= 0, F.lit("1")).otherwise(F.lit("0"))
        for i in range(bits)
    ]
    return F.concat(*parts)


def embedding_near_dup_pairs(df: DataFrame, threshold: float,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             bits: int = SIGN_BITS) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for
    same-sign-LSH-bucket pairs with cosine >= threshold.

    Scale shape: one shuffle on the bucket key; candidate pairs are
    bucket-local (|corpus|/2^bits expected per bucket), never all-pairs.
    High-cosine pairs agree on most hyperplane signs, so recall at
    threshold≈0.9 is high; multi-probe (flip one bit) composes as a
    union of joins when more recall is needed.
    """
    v = df.select(F.col(id_col).alias("id"),
                  _as_double(F.col(vec_col)).alias("v"),
                  sign_bucket(F.col(vec_col), bits).alias("bucket"))
    a = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"), "bucket")
    b = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"), "bucket")
    return (
        a.join(b, on="bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


# IVF: number of coarse-quantizer centroids. Centroid choice is
# deterministic (lowest ids) so cross-engine oracles can replicate;
# production would k-means on a sample instead — the query plan shape
# (broadcast centroids → argmin assign → cluster-local search) is the same.
IVF_NLIST = 16


def ivf_assign(df: DataFrame, centroids: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign each vector to its nearest centroid (max cosine, ties →
    lowest centroid id). Centroids are broadcast — the corpus scan is
    embarrassingly parallel with no shuffle."""
    v = df.select(F.col(id_col).alias("id"),
                  _as_double(F.col(vec_col)).alias("v"))
    c = centroids.select(F.col(id_col).alias("cid"),
                         _as_double(F.col(vec_col)).alias("cv"))
    scored = v.join(F.broadcast(c)).select(
        "id", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("sim"))
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("cid"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1).select("id", "v", F.col("cid").alias("cluster")))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             nlist: int = IVF_NLIST) -> DataFrame:
    """IVF (inverted-file) approximate top-k: coarse-quantize the corpus
    into nlist clusters, then search only the query's cluster (nprobe=1).

    Scale shape: centroid assignment is a broadcast map over the corpus
    scan; the search join shuffles on the cluster id only, so each
    query scores ~|corpus|/nlist candidates instead of |corpus|.
    """
    centroids = corpus.where(F.col(id_col) < nlist)
    c_assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    q_assigned = ivf_assign(queries, centroids, id_col, vec_col)
    q = q_assigned.select(F.col("id").alias("query_id"),
                          F.col("v").alias("qv"), "cluster")
    c = c_assigned.select(F.col("id").alias("neighbor_id"),
                          F.col("v").alias("cv"), "cluster")
    scored = (
        c.join(q, on="cluster")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))


def probe_buckets(vec: Column, bits: int = SIGN_BITS) -> Column:
    """Multi-probe bucket list: the vector's own bucket plus every
    one-bit-flipped neighbor (Hamming ball of radius 1). Exploding the
    QUERY side into these probes keeps the search an EQUI-join on the
    bucket key — never a similarity theta-join."""
    b = sign_bucket(vec, bits)
    probes = [b]
    for i in range(bits):
        flipped = (F.when(F.substring(b, i + 1, 1) == "1", F.lit("0"))
                   .otherwise(F.lit("1")))
        probes.append(F.concat(F.substring(b, 1, i), flipped,
                               F.substring(b, i + 2, bits - i - 1)))
    return F.array(*probes)


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bits: int = SIGN_BITS,
                    multiprobe: bool = False) -> DataFrame:
    """Approximate top-k within the query's sign-LSH bucket.

    Equi-join on the bucket key (hash-shuffle, bucket-local candidates) —
    the candidate count per query is |corpus| / 2^bits in expectation.
    multiprobe=True explodes each query into its Hamming-radius-1 probe
    buckets (bits+1 probes): ~(bits+1)x the candidates, much higher
    recall, still a pure equi-join.
    """
    if multiprobe:
        q = (queries.select(F.col(id_col).alias("query_id"),
                            _as_double(F.col(vec_col)).alias("qv"),
                            F.explode(probe_buckets(F.col(vec_col), bits))
                            .alias("bucket")))
    else:
        q = queries.select(F.col(id_col).alias("query_id"),
                           _as_double(F.col(vec_col)).alias("qv"),
                           sign_bucket(F.col(vec_col), bits).alias("bucket"))
    c = corpus.select(F.col(id_col).alias("neighbor_id"),
                      _as_double(F.col(vec_col)).alias("cv"),
                      sign_bucket(F.col(vec_col), bits).alias("bucket"))
    scored = (
        c.join(q, on="bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id",
                cosine(F.col("qv"), F.col("cv")).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))
