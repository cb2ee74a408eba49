"""Graph analytics over edge lists (beyond the reference's operator set —
the pipeline-side complement to the SPARQL engine's Kleene closure and
the dedup module's connected components).

PageRank is the classic graph-quality signal a training-data pipeline
derives from link structure (page quality weighting, spam demotion).
Implementation is the standard distributed power iteration: one hash
join edges⋈ranks + one aggregation per round — never an adjacency
matrix. Per-node contributions are summed as DECIMAL(38,18) so the sum
is order-independent and an ANSI oracle (unrolled CTE, one per
iteration) lands on bit-identical ranks; every other step is plain IEEE
double arithmetic executed in the same order on both engines.

Scale shape: iterations are a fixed small count; each is a shuffle on
dst keyed by node id. Ranks (one row per node) localCheckpoint per
round so the lineage stays flat. Dangling-node mass is dropped (the
non-stochastic simplification) — documented, mirrored in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PAGERANK_ITERS = 5
PAGERANK_DAMPING = 0.85


def pagerank(edges: DataFrame, iters: int = PAGERANK_ITERS,
             damping: float = PAGERANK_DAMPING,
             src: str = "src", dst: str = "dst") -> DataFrame:
    """(node, rank) after `iters` power iterations from a uniform start.

    rank_{t+1}(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_t(u) / outdeg(u)

    Deterministic across engines: contributions are summed in
    DECIMAL(38,18) (exact, order-independent); divisions and the final
    affine step are IEEE doubles evaluated in a fixed order.
    """
    # the three static relations are re-joined EVERY round — checkpoint
    # once, or each iteration recomputes the upstream edge pipeline
    # (measured 4x per-round cost on a 500k-edge graph without this)
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct().localCheckpoint(eager=True)
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg")) \
        .localCheckpoint(eager=True)
    base = (1.0 - damping) / n

    ranks = nodes.withColumn("rank", F.lit(1.0 / n)) \
        .localCheckpoint(eager=True)
    for _ in range(iters):
        contrib = (e.join(ranks, e["src"] == ranks["node"])
                   .join(out_deg, "src")
                   .select(F.col("dst").alias("node"),
                           (F.col("rank") / F.col("deg"))
                           .cast("decimal(38,18)").alias("c")))
        summed = contrib.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (nodes.join(summed, "node", "left")
                 .select("node",
                         (F.lit(base) + F.lit(damping) *
                          F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                          ).alias("rank"))
                 .localCheckpoint(eager=True))
    return ranks


def triangles_per_node(edges: DataFrame, src: str = "src",
                       dst: str = "dst") -> DataFrame:
    """(node, triangles): how many triangles each node participates in,
    treating the edge list as UNDIRECTED (self-loops and duplicate /
    reverse edges collapse).

    Plan: canonicalize to a<b ordered pairs, then the classic two-hop
    join — e(a,b) ⋈ e(b,c) ⋈ e(a,c) with a<b<c counts each triangle
    exactly once; every corner then gets credit via one explode +
    hash aggregate. All joins are equi-joins on node ids. Skew note: a
    degree-d hub contributes O(d²) wedge candidates — the classic
    triangle-count hot spot; at 100 TB shard hubs first (the same
    degree-cap discipline as the LSH bucket cap).
    """
    und = (edges.select(F.least(F.col(src), F.col(dst)).alias("a"),
                        F.greatest(F.col(src), F.col(dst)).alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct())
    e1 = und.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = und.select(F.col("a").alias("y"), F.col("b").alias("z"))
    e3 = und.select(F.col("a").alias("x"), F.col("b").alias("z"))
    tri = (e1.join(e2, "y")          # wedge x<y<z via (x,y),(y,z)
           .join(e3, ["x", "z"]))    # close it with (x,z)
    corners = tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).alias("triangles"))
