"""Corpus-curation operators for LLM training-data pipelines:
benchmark decontamination, token-budget shard packing, and deterministic
weighted sampling (data mixing).

Pure Column expressions (JVM-side, whole-stage codegen, no Python UDFs).
Scale shapes, in order:

- decontaminate: the benchmark n-gram set is tiny next to the corpus
  (eval sets are thousands of documents; the corpus is billions), so the
  membership test is a broadcast hash join against the exploded training
  n-grams — a map-side operation — followed by one combiner-backed
  groupBy on doc_id. No corpus-sized shuffle of text payloads: only
  (doc_id, gram) pairs that HIT the benchmark reach the aggregation.
- pack_shards: a global greedy packing would serialize on one ordered
  scan; sharding by hash(doc_id) first makes each shard's running-sum
  window independent, so packing parallelizes across shards (the
  standard "shard, then order within shard" trick for writer
  parallelism). One shuffle on the shard key.
- weighted_sample: zero shuffle — the keep/drop decision is a pure
  function of (id, rate), reproducible across reruns and engines, which
  is the property that makes sampled corpora diffable and resumable.
  Spark's own df.sample() is seed-stable only under identical
  partitioning, so it cannot serve as a cross-engine contract.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DECON_NGRAM = 3
DECON_THRESHOLD = 0.05

PACK_BUDGET_TOKENS = 1024
PACK_NUM_SHARDS = 8

# 2^32: md5-prefix values are uniform over [0, 2^32)
_HASH_SPACE = float(1 << 32)


def word_ngrams(text: Column, n: int) -> Column:
    """Distinct word n-grams of a space-separated text column.

    Guarded for texts shorter than n words (Spark's `sequence(1, 0)`
    counts DOWN rather than returning an empty array).
    """
    # let-bind the split via a 1-element transform: referencing it from
    # the per-gram lambda re-ran the split per element (no CSE through
    # HOF lambdas — dedup.shingles_col's round-9 fix)
    def grams_of(w: Column) -> Column:
        grams = F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.array_join(F.slice(w, i, n), " "),
        )
        return F.when(F.size(w) >= n, F.array_distinct(grams)).otherwise(
            F.array().cast("array<string>"))

    return F.transform(F.array(F.split(text, " ")), grams_of)[0]


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = DECON_NGRAM,
    threshold: float = DECON_THRESHOLD,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Flag training documents that overlap a benchmark/eval set.

    The canonical pre-training decontamination pass: a training document
    is contaminated when >= `threshold` of its distinct word n-grams
    appear anywhere in the benchmark corpus (n=13 in the published
    recipes; lower here to suit the synthetic corpus scale).

    Returns one row per training document:
    (doc_id, n_ngrams, n_hits, contamination, is_contaminated).
    """
    grams = word_ngrams(F.col(text_col), n)
    bench_grams = (benchmark
                   .select(F.explode(grams).alias("gram"))
                   .distinct())
    doc_grams = train.select(
        F.col(id_col), F.size(grams).alias("n_ngrams"),
        grams.alias("grams"))
    hits = (doc_grams
            .select(id_col, "n_ngrams", F.explode("grams").alias("gram"))
            .join(F.broadcast(bench_grams), "gram")
            .groupBy(id_col, "n_ngrams")
            .agg(F.count("*").alias("n_hits")))
    base = doc_grams.select(id_col, "n_ngrams")
    out = (base.join(hits.select(id_col, "n_hits"), id_col, "left")
           .withColumn("n_hits", F.coalesce("n_hits", F.lit(0))))
    contamination = F.when(
        F.col("n_ngrams") > 0,
        F.col("n_hits").cast("double") / F.col("n_ngrams").cast("double"),
    ).otherwise(F.lit(0.0))
    return out.select(
        F.col(id_col),
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.col("n_hits").cast("long").alias("n_hits"),
        contamination.alias("contamination"),
        (contamination >= F.lit(threshold)).alias("is_contaminated"),
    )


def pack_shards(
    docs: DataFrame,
    budget: int = PACK_BUDGET_TOKENS,
    num_shards: int = PACK_NUM_SHARDS,
    id_col: str = "doc_id",
    tokens_col: str | Column = "n_tokens",
) -> DataFrame:
    """Greedy sequence packing: assign documents to fixed-token-budget
    packs (training shards / context-window batches).

    Documents are sharded by hash of id, ordered by id within the shard,
    and cut into packs wherever the running token total crosses the
    budget — `pack_id = floor(tokens_before_this_doc / budget)`, the
    standard contiguous greedy fill. Returns per-pack summaries:
    (shard, pack_id, n_docs, total_tokens, first_doc, last_doc).
    """
    tokens = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    shard = F.pmod(F.col(id_col), F.lit(num_shards))
    win = (Window.partitionBy("shard").orderBy(id_col)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    staged = docs.select(
        F.col(id_col), shard.alias("shard"), tokens.alias("toks"))
    cum = F.sum("toks").over(win)
    packed = staged.select(
        id_col, "shard", "toks",
        F.floor((cum - F.col("toks")) / F.lit(budget)).alias("pack_id"))
    return (packed.groupBy("shard", "pack_id")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum("toks").cast("long").alias("total_tokens"),
                 F.min(id_col).alias("first_doc"),
                 F.max(id_col).alias("last_doc"))
            .select(F.col("shard").cast("long").alias("shard"),
                    F.col("pack_id").cast("long").alias("pack_id"),
                    "n_docs", "total_tokens", "first_doc", "last_doc"))


def sample_hash(id_col: Column) -> Column:
    """Deterministic uniform hash of an id into [0, 2^32): the first 8 hex
    chars of md5 — identical in any engine with md5, which is what makes
    the sampling decision an oracle-checkable cross-engine contract."""
    return F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8),
                  16, 10).cast("long")


def weighted_sample(
    df: DataFrame,
    rate: Column,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-row weighted sampling (data mixing): keep a row
    iff hash(id) < rate * 2^32. `rate` is any Column in [0, 1] — per
    source, per language, per quality bucket. Adds a `sample_keep`
    boolean; callers filter or aggregate on it."""
    keep = sample_hash(F.col(id_col)) < (rate * F.lit(_HASH_SPACE))
    return df.withColumn("sample_keep", keep)


def top_k_per_group(df: DataFrame, k: int, group_cols,
                    order_col: str, tiebreak_col: str,
                    descending: bool = True) -> DataFrame:
    """Deterministic per-group top-k selection — the domain-capping /
    best-of-source curation step (keep the k highest-quality documents
    per domain, language, or shard).

    `tiebreak_col` makes the selection a total order, so the survivors
    are engine-independent (and oracle-checkable). One shuffle on the
    group key; the per-group sort is partial (row_number stops ranking
    being global), so the plan scales with group count, not corpus size.
    Adds a 1-based `rank` column and keeps only rank <= k.
    """
    group_cols = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    order = [F.desc(order_col) if descending else F.asc(order_col),
             F.asc(tiebreak_col)]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (df.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k))
