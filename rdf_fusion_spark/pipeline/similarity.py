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


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bits: int = SIGN_BITS) -> DataFrame:
    """Approximate top-k within the query's sign-LSH bucket.

    Equi-join on the bucket key (hash-shuffle, bucket-local candidates) —
    the candidate count per query is |corpus| / 2^bits in expectation.
    May return fewer than k rows per query; recall improves with
    multi-probe (flip one bit) which composes as a union of joins.
    """
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
