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
# embedding dimensionality of the driver's corpus; callers with other dims
# pass `dim` explicitly
EMB_DIM = 64
# seed for the random hyperplanes — md5-derived so the DuckDB oracle can
# embed the exact same weights (they are plain literals on both sides)
HYPERPLANE_SEED = 42


def hyperplane_weights(bits: int = SIGN_BITS, dim: int = EMB_DIM,
                       seed: int = HYPERPLANE_SEED, table: int = 0) -> list:
    """Deterministic pseudo-random hyperplane normals, one row per bit.
    Tables index disjoint row ranges (row = table*bits + i), so L tables
    get independent hyperplanes from one seed.

    Each weight is md5-derived and quantized to k/1024 (exactly
    representable in binary), so embedding the repr as a literal in SQL
    reproduces the identical double on any engine."""
    import hashlib
    out = []
    for i in range(bits):
        row = []
        gi = table * bits + i
        for j in range(dim):
            h = int(hashlib.md5(f"{seed}:{gi}:{j}".encode())
                    .hexdigest()[:8], 16)
            row.append(((h % 2049) - 1024) / 1024.0)
        out.append(row)
    return out


def sign_bucket(vec: Column, bits: int = SIGN_BITS,
                dim: int = EMB_DIM, table: int = 0) -> Column:
    """LSH bucket id: sign pattern of `bits` seeded random-hyperplane
    projections (round-3 verdict upgraded this from first-`bits`
    coordinate signs, whose recall depended on coordinate distribution).

    Fold order is fixed (left-to-right over dims, 0.0 seed) so an oracle
    summing the same literal products left-associatively is bit-identical.
    `dim` must equal the vector length: zip_with pads a shorter vector
    with NULLs, collapsing every projection (and bucket) to '0'.
    """
    v = _as_double(vec)
    parts = []
    for row in hyperplane_weights(bits, dim, table=table):
        w = F.array(*[F.lit(x) for x in row])
        proj = F.aggregate(F.zip_with(v, w, lambda x, y: x * y),
                           F.lit(0.0), lambda acc, x: acc + x)
        parts.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*parts)


def table_buckets(vec: Column, bits: int, dim: int,
                  num_tables: int) -> Column:
    """Array of (t, b) structs — one bucket per hash table."""
    return F.array(*[
        F.struct(F.lit(t).alias("t"),
                 sign_bucket(vec, bits, dim, t).alias("b"))
        for t in range(num_tables)
    ])


# near-dup pair search: 8 tables × 8 bits. At cosine ≥ 0.9 (angle ≤ 25.8°,
# per-hyperplane agreement p ≈ 0.857) recall ≈ 1-(1-p^8)^8 ≈ 0.94 vs 0.29
# for the old single table.
EMB_NEARDUP_TABLES = 8


def embedding_near_dup_pairs(df: DataFrame, threshold: float,
                             id_col: str = "vec_id",
                             vec_col: str = "embedding",
                             bits: int = SIGN_BITS,
                             num_tables: int = EMB_NEARDUP_TABLES,
                             dim: int = EMB_DIM) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine) for
    pairs sharing a bucket in ANY of `num_tables` independent seeded
    sign-LSH tables, with cosine >= threshold.

    Scale shape: candidates come from equi self-joins on (table, bucket)
    carrying ONLY ids (the vectors re-join onto the deduped pairs — the
    minhash-LSH payload discipline); candidate pairs are bucket-local,
    never all-pairs.
    """
    v = df.select(F.col(id_col).alias("id"),
                  _as_double(F.col(vec_col)).alias("v"))
    tb = df.select(
        F.col(id_col).alias("id"),
        F.explode(table_buckets(F.col(vec_col), bits, dim, num_tables))
        .alias("tb")
    ).select("id", F.col("tb.t").alias("t"), F.col("tb.b").alias("b"))
    a = tb.select(F.col("id").alias("id_a"), "t", "b")
    b = tb.select(F.col("id").alias("id_b"), "t", "b")
    cand = (a.join(b, on=["t", "b"])
            .where(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct())
    cand = (cand
            .join(v.select(F.col("id").alias("id_a"),
                           F.col("v").alias("va")), "id_a")
            .join(v.select(F.col("id").alias("id_b"),
                           F.col("v").alias("vb")), "id_b"))
    return (cand.select("id_a", "id_b",
                        cosine(F.col("va"), F.col("vb")).alias("cosine"))
            .where(F.col("cosine") >= threshold))


# IVF coarse quantizer: nlist centroids from a deterministic k-means
# (init = the nlist lowest-id vectors; fixed iteration count; per-
# coordinate means ROUNDed to 6 decimals so a SQL oracle recomputing the
# same steps lands on bit-identical centroids regardless of each engine's
# float summation order). nprobe>1 searches the query's top-p clusters —
# the probe explosion keeps the search an equi-join on the cluster id.
IVF_NLIST = 16
IVF_NPROBE = 2
IVF_KMEANS_ITERS = 2


def _assign(v: DataFrame, cent: DataFrame, nprobe: int = 1) -> DataFrame:
    """(id, v, cluster) rows: each vector's top-`nprobe` centroids by
    cosine (ties → lowest centroid id). Centroids are broadcast — the
    corpus scan stays embarrassingly parallel with no shuffle."""
    scored = v.join(F.broadcast(cent)).select(
        "id", "v", "cid", cosine(F.col("v"), F.col("cv")).alias("sim"))
    w = Window.partitionBy("id").orderBy(F.desc("sim"), F.asc("cid"))
    return (scored.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= nprobe)
            .select("id", "v", F.col("cid").alias("cluster")))


def kmeans_centroids(corpus: DataFrame, nlist: int = IVF_NLIST,
                     iters: int = IVF_KMEANS_ITERS,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    """Deterministic distributed k-means: returns (cid, cv) centroids.

    Each iteration: broadcast-assign every vector to its nearest centroid,
    then recompute per-cluster per-coordinate means (posexplode →
    hash-agg → rebuild array). Means are rounded to 6 decimals to absorb
    engine-specific float summation order; a cluster that loses all its
    members keeps its previous centroid. The centroid relation is nlist
    rows — checkpointing per iteration is O(nlist·dim), trivially cheap.
    """
    v = corpus.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v"))
    cent = corpus.where(F.col(id_col) < nlist).select(
        F.col(id_col).alias("cid"), _as_double(F.col(vec_col)).alias("cv"))
    for _ in range(iters):
        assigned = _assign(v, cent)
        coords = assigned.select(
            "cluster", F.posexplode(F.col("v")).alias("dim", "val"))
        means = coords.groupBy("cluster", "dim").agg(
            F.round(F.avg("val"), 6).alias("m"))
        newc = (means.groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("dim", "m")))
                     .alias("a"))
                .select(F.col("cluster").alias("cid"),
                        F.transform(F.col("a"), lambda s: s["m"]).alias("cv")))
        p, n = cent.alias("p"), newc.alias("n")
        cent = (p.join(n, F.col("p.cid") == F.col("n.cid"), "left")
                .select(F.col("p.cid").alias("cid"),
                        F.coalesce(F.col("n.cv"), F.col("p.cv")).alias("cv"))
                .localCheckpoint(eager=True))
    return cent


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int,
             id_col: str = "vec_id", vec_col: str = "embedding",
             nlist: int = IVF_NLIST, nprobe: int = IVF_NPROBE,
             iters: int = IVF_KMEANS_ITERS) -> DataFrame:
    """IVF (inverted-file) approximate top-k: k-means-quantize the corpus
    into nlist clusters, then search the query's top-`nprobe` clusters.

    Scale shape: centroid assignment is a broadcast map over the corpus
    scan; the search join shuffles on the cluster id only, so each query
    scores ~nprobe·|corpus|/nlist candidates instead of |corpus|. A
    corpus vector lives in exactly one cluster, so probe explosion never
    duplicates (query, neighbor) pairs.
    """
    cent = kmeans_centroids(corpus, nlist, iters, id_col, vec_col)
    c_assigned = _assign(
        corpus.select(F.col(id_col).alias("id"),
                      _as_double(F.col(vec_col)).alias("v")), cent, 1)
    q_assigned = _assign(
        queries.select(F.col(id_col).alias("id"),
                       _as_double(F.col(vec_col)).alias("v")), cent, nprobe)
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


def probe_buckets(vec: Column, bits: int = SIGN_BITS,
                  dim: int = EMB_DIM, table: int = 0) -> Column:
    """Multi-probe bucket list: the vector's own bucket plus every
    one-bit-flipped neighbor (Hamming ball of radius 1). Exploding the
    QUERY side into these probes keeps the search an EQUI-join on the
    bucket key — never a similarity theta-join."""
    b = sign_bucket(vec, bits, dim, table)
    probes = [b]
    for i in range(bits):
        flipped = (F.when(F.substring(b, i + 1, 1) == "1", F.lit("0"))
                   .otherwise(F.lit("1")))
        probes.append(F.concat(F.substring(b, 1, i), flipped,
                               F.substring(b, i + 2, bits - i - 1)))
    return F.array(*probes)


# top-k search defaults: 16 tables × 4 bits. Chosen for the driver corpus,
# whose true top-k neighbors sit at ~70° (cos ≈ 0.33; per-hyperplane
# agreement p ≈ 0.61): per-table hit p^4 ≈ 0.14, union over 16 tables
# ≈ 0.90 recall. On corpora with genuinely close neighbors (cos ≥ 0.7)
# the same machinery reaches 0.9+ recall with far fewer/narrower tables —
# see BASELINE.md round-4 recall study.
LSH_TOPK_BITS = 4
LSH_TOPK_TABLES = 16


def lsh_bucket_topk(corpus: DataFrame, queries: DataFrame, k: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    bits: int = LSH_TOPK_BITS,
                    num_tables: int = LSH_TOPK_TABLES,
                    dim: int = EMB_DIM,
                    multiprobe: bool = False) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors sharing a bucket
    with the query in ANY of `num_tables` independent sign-LSH tables.

    Scale shape: the candidate join is an equi-join on (table, bucket)
    carrying only ids; each (query, neighbor) candidate is deduped across
    tables BEFORE the vectors re-join by id, so a pair is scored exactly
    once no matter how many tables it collides in. multiprobe=True
    additionally explodes each query into its Hamming-radius-1 probes per
    table — still a pure equi-join.
    """
    def buckets(df: DataFrame, out_id: str) -> DataFrame:
        if multiprobe and out_id == "query_id":
            arr = F.flatten(F.array(*[
                F.transform(
                    probe_buckets(F.col(vec_col), bits, dim, t),
                    lambda b, t=t: F.struct(F.lit(t).alias("t"),
                                            b.alias("b")))
                for t in range(num_tables)
            ]))
        else:
            arr = table_buckets(F.col(vec_col), bits, dim, num_tables)
        return (df.select(F.col(id_col).alias(out_id),
                          F.explode(arr).alias("tb"))
                .select(out_id, F.col("tb.t").alias("t"),
                        F.col("tb.b").alias("b")))

    qb = buckets(queries, "query_id")
    cb = buckets(corpus, "neighbor_id")
    cand = (cb.join(qb, on=["t", "b"])
            .where(F.col("query_id") != F.col("neighbor_id"))
            .select("query_id", "neighbor_id").distinct())
    qv = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("qv"))
    cv = corpus.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(F.col(vec_col)).alias("cv"))
    scored = (cand.join(qv, "query_id").join(cv, "neighbor_id")
              .select("query_id", "neighbor_id",
                      cosine(F.col("qv"), F.col("cv")).alias("cosine")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "rank", "neighbor_id", "cosine"))
