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
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")) \
        .distinct()
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct())
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
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
