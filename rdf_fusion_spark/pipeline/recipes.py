"""End-to-end corpus-curation recipe: the composed pipeline a training
run actually executes, built entirely from the individual operators in
this package — language ID, quality scoring, repetition filtering,
exact + MinHash-LSH dedup, optional sub-document span removal
(ExactSubstr), benchmark decontamination, weighted sampling,
token-budget packing.

The output is the per-stage funnel (stage order, documents surviving,
tokens surviving) plus the final shard-packing summary — the numbers a
data engineer reads off a curation dashboard. Each stage consumes the
previous stage's survivors, so the funnel doubles as an integration test
of operator composability.

Scale shape: stages a-c and f-g are map-only over the scan; d is one
hash-groupBy; e reuses the banded-LSH candidate join (never all-pairs);
h windows per hash-shard. Nothing here is driver-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .curation import (
    DECON_NGRAM,
    DECON_THRESHOLD,
    PACK_BUDGET_TOKENS,
    PACK_NUM_SHARDS,
    decontaminate,
    pack_shards,
    weighted_sample,
)
from .dedup import exact_dedup_groups, minhash_lsh_pairs
from .text import with_language_id, with_quality_score, words_col


def curation_pipeline(
    docs: DataFrame,
    keep_lang: str = "en",
    min_quality: float = 0.72,
    lsh_threshold: float = 0.5,
    bench_mod: int = 37,
    sample_rate: Column = None,
    budget: int = PACK_BUDGET_TOKENS,
    num_shards: int = PACK_NUM_SHARDS,
    substring_dedup: bool = False,
) -> DataFrame:
    """Run the full curation funnel; returns one row per stage:
    (stage_idx, stage, n_docs, n_tokens) with a final ('packed') row
    whose n_docs is the PACK count."""
    n_tokens = F.size(words_col(F.col("text")))
    base = with_language_id(with_quality_score(docs)) \
        .withColumn("n_tokens", n_tokens)

    stages: list[tuple[str, DataFrame]] = [("input", base)]

    lang_kept = base.where(F.col("lang_pred") == keep_lang)
    stages.append(("lang_filter", lang_kept))

    qual_kept = lang_kept.where(F.col("quality_score") >= min_quality)
    stages.append(("quality_filter", qual_kept))

    # repetition filter: drop boilerplate / decoding-loop documents
    # (intra-doc bigram duplication above 0.5 — near 0 for prose)
    from .text import with_repetition_ratio
    rep_kept = with_repetition_ratio(qual_kept) \
        .where(F.col("repetition_ratio") <= 0.5) \
        .drop("repetition_ratio")
    stages.append(("repetition_filter", rep_kept))
    qual_kept = rep_kept

    # exact dedup: keep each content group's canonical (lowest id) doc
    canon = exact_dedup_groups(qual_kept).select(
        F.col("canonical_id").alias("doc_id"))
    exact_kept = qual_kept.join(canon, "doc_id")
    stages.append(("exact_dedup", exact_kept))

    # near-dup dedup: drop any doc with a SMALLER near-duplicate
    # (pairs are emitted id_a < id_b, so dropping every id_b keeps
    # exactly one representative per duplicate chain)
    pairs = minhash_lsh_pairs(exact_kept, lsh_threshold)
    near_kept = exact_kept.join(
        pairs.select(F.col("id_b").alias("doc_id")).distinct(),
        "doc_id", "left_anti")
    stages.append(("near_dedup", near_kept))

    # optional sub-document dedup (Lee et al. 2022 ExactSubstr): rewrite
    # the surviving docs with duplicated >=k-token spans removed (one
    # canonical occurrence kept corpus-wide), then drop docs whose text
    # was removed entirely. Doc count barely moves; the TOKEN column is
    # where this stage shows up in the funnel.
    if substring_dedup:
        from .dedup import remove_shared_windows
        rewritten = remove_shared_windows(near_kept)
        near_kept = (near_kept.drop("text", "n_tokens")
                     .join(rewritten.select(
                         "doc_id",
                         F.col("deduped_text").alias("text"),
                         (F.col("n_tokens") - F.col("n_removed_tokens"))
                         .alias("n_tokens")), "doc_id")
                     .where(F.col("n_tokens") > 0))
        stages.append(("substring_dedup", near_kept))

    # decontamination: the held-out benchmark slice leaves the corpus
    # entirely; contaminated training docs are dropped
    bench = near_kept.where(F.col("doc_id") % bench_mod == 0)
    train = near_kept.where(F.col("doc_id") % bench_mod != 0)
    decon = decontaminate(train, bench, DECON_NGRAM, DECON_THRESHOLD)
    clean = train.join(
        decon.where(~F.col("is_contaminated")).select("doc_id"), "doc_id")
    stages.append(("decontaminate", clean))

    rate = sample_rate if sample_rate is not None else F.lit(0.8)
    sampled = weighted_sample(clean, rate).where("sample_keep")
    stages.append(("mix_sample", sampled))

    funnel = None
    for i, (name, df) in enumerate(stages):
        row = df.agg(
            F.lit(i).cast("long").alias("stage_idx"),
            F.lit(name).alias("stage"),
            F.count("*").cast("long").alias("n_docs"),
            F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long")
            .alias("n_tokens"))
        funnel = row if funnel is None else funnel.unionByName(row)

    packs = pack_shards(sampled.select("doc_id", "n_tokens"),
                        budget, num_shards)
    packed = packs.agg(
        F.lit(len(stages)).cast("long").alias("stage_idx"),
        F.lit("packed").alias("stage"),
        F.count("*").cast("long").alias("n_docs"),
        F.coalesce(F.sum("total_tokens"), F.lit(0)).cast("long")
        .alias("n_tokens"))
    return funnel.unionByName(packed)
