"""Text-analysis operators for LLM training-data pipelines.

Pure Column expressions (JVM-side, whole-stage codegen, no Python UDFs):
at 100 TB these run embarrassingly parallel over the document scan with
no shuffle at all. Every operator is deterministic and has an exact
ANSI-SQL equivalent so it can be oracle-checked (see entry_queries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tokenizer: words, numbers, or single punctuation — a BPE-ish pre-split
TOKEN_RE = r"[a-z]+|[A-Z]+|[0-9]+|[^A-Za-z0-9\s]"

# tiny marker-word lists for the language-ID heuristic (function words are
# the classic high-coverage signal; extend per deployment)
LID_MARKERS = {
    "en": ["the", "a", "of", "and", "is", "to", "in"],
    "de": ["der", "die", "das", "und", "ist", "nicht"],
    "fr": ["le", "la", "les", "et", "est", "une"],
    "es": ["el", "la", "los", "y", "es", "una"],
}


def words_col(text: Column) -> Column:
    return F.split(text, " ")


def with_text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality/shape statistics per document: word counts, token count,
    average word length and a canonical bag-of-words fingerprint
    (md5 of the sorted distinct word set — an order-insensitive content id).
    """
    words = words_col(F.col(text_col))
    n_words = F.size(words)
    return df.select(
        "*",
        n_words.alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)).alias("n_tokens"),
        (F.length(F.regexp_replace(F.col(text_col), " ", "")).cast("double")
         / n_words.cast("double")).alias("avg_word_len"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(words))))
        .alias("fingerprint"),
    )


def with_repetition_ratio(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Intra-document repetition: 1 − distinct/total word bigrams — the
    boilerplate/loop-generation signal (near-0 for prose, →1 for
    template spam and decoding loops). Pure column expressions; one
    pass, no shuffle."""
    # words is let-bound via a 1-element transform: referencing the regex
    # split inside the bigram lambda re-ran it per element (no CSE
    # through HOF lambdas — dedup.shingles_col's round-9 fix, 4.9x)
    def bigrams_of(words: Column) -> Column:
        n = F.size(words)
        # guard: sequence(1, 0) counts DOWN in Spark, producing invalid
        # element_at indices for 1-word docs (ANSI mode raises)
        idx = F.when(n >= 2, F.sequence(F.lit(1), n - 1)) \
            .otherwise(F.array().cast("array<int>"))
        return F.transform(
            idx,
            lambda i: F.concat_ws(" ", F.element_at(words, i),
                                  F.element_at(words, i + 1)))

    bigrams = F.transform(F.array(words_col(F.col(text_col))),
                          bigrams_of)[0]
    total = F.size(bigrams)
    rep = F.when(total > 0,
                 1.0 - F.size(F.array_distinct(bigrams)).cast("double")
                 / total.cast("double")).otherwise(F.lit(0.0))
    return df.select("*", F.round(rep, 6).alias("repetition_ratio"))


# stopword list for the quality score (English function words — the
# "does this read like prose" signal; extend per corpus language mix)
STOPWORDS = ["the", "a", "an", "of", "and", "or", "is", "are", "to", "in",
             "that", "it", "for", "on", "with", "as", "was", "at", "by"]


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality scoring per document: punctuation / alphabetic /
    stopword / digit character ratios plus mean word length, combined
    into a [0,1] prose-likeness score.

    All pure Column math over one scan — no shuffle, no UDF; at corpus
    scale this is a map over the document files.
    """
    t = F.col(text_col)
    n_chars = F.length(t).cast("double")
    words = words_col(t)
    n_words = F.size(words).cast("double")
    punct = F.regexp_count(t, F.lit(r"[^\w\s]")).cast("double")
    alpha = F.regexp_count(t, F.lit(r"[A-Za-z]")).cast("double")
    digit = F.regexp_count(t, F.lit(r"[0-9]")).cast("double")
    stop_hits = F.size(
        F.filter(words, lambda w: F.lower(w).isin(*STOPWORDS))).cast("double")
    punct_ratio = punct / n_chars
    alpha_ratio = alpha / n_chars
    digit_ratio = digit / n_chars
    stopword_ratio = stop_hits / n_words
    mean_word_len = (F.length(F.regexp_replace(t, " ", "")).cast("double")
                     / n_words)
    # prose-likeness: mostly alphabetic, some stopwords, few digits,
    # plausible word length (3-10 chars); each term clipped to [0,1]
    clip = lambda c: F.greatest(F.lit(0.0), F.least(F.lit(1.0), c))  # noqa: E731
    score = clip(
        0.4 * clip(alpha_ratio * 1.25)
        + 0.3 * clip(stopword_ratio * 4.0)
        + 0.2 * clip(1.0 - digit_ratio * 5.0)
        + 0.1 * clip(1.0 - F.abs(mean_word_len - 6.0) / 6.0))
    return df.select(
        "*",
        punct_ratio.alias("punct_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        digit_ratio.alias("digit_ratio"),
        stopword_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        score.alias("quality_score"),
    )


# Rabin-Karp polynomial rolling hash: base/modulus chosen so the
# accumulator stays far below 2^63 (1e9+7 * 257 ≈ 2.6e11)
ROLL_B = 257
ROLL_P = 1_000_000_007


def rolling_fingerprint_col(text: Column) -> Column:
    """Order-SENSITIVE content fingerprint: polynomial rolling hash over
    the character stream (the complement of the order-insensitive
    bag-of-words fingerprint). Pure Column fold — one scan, no shuffle."""
    chars = F.filter(F.split(text, ""), lambda c: c != "")
    codes = F.transform(chars, F.ascii)
    return F.aggregate(
        codes, F.lit(0).cast("long"),
        lambda acc, x: (acc * ROLL_B + x.cast("long")) % ROLL_P)


def with_rolling_fingerprint(df: DataFrame, text_col: str = "text"
                             ) -> DataFrame:
    return df.select(
        "*", rolling_fingerprint_col(F.col(text_col)).alias("rolling_fp"))


def top_words(df: DataFrame, k: int = 20, text_col: str = "text"
              ) -> DataFrame:
    """Corpus-wide top-k word frequencies: (word, n_occurrences, n_docs).

    explode → hash-aggregate (map-side combined) → TakeOrdered(k).
    One shuffle on the word; the top-k never sorts the full vocabulary
    (Spark plans orderBy+limit as TakeOrderedAndProject).
    """
    words = (df.select(F.explode(words_col(F.col(text_col))).alias("word"),
                       F.col("doc_id"))
             .where(F.length("word") > 0))
    return (words.groupBy("word")
            .agg(F.count("*").alias("n_occurrences"),
                 F.countDistinct("doc_id").alias("n_docs"))
            .orderBy(F.desc("n_occurrences"), F.asc("word"))
            .limit(k))


LID_FLOOR = 0.02


def with_language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID: per language, the fraction of tokens that
    are high-frequency function words of that language; the max ratio wins
    when it clears a 2% floor (ties → alphabetically first language), else
    'und' (undetermined)."""
    words = words_col(F.col(text_col))
    n = F.size(words).cast("double")
    out = df
    langs = sorted(LID_MARKERS)
    for lang in langs:
        hits = F.size(F.filter(words, lambda w: w.isin(*LID_MARKERS[lang])))
        out = out.withColumn(f"ratio_{lang}", hits.cast("double") / n)
    m = F.greatest(*[F.col(f"ratio_{lang}") for lang in langs])
    pred = F.when(m < F.lit(LID_FLOOR), F.lit("und"))
    for lang in langs:
        pred = pred.when(F.col(f"ratio_{lang}") == m, F.lit(lang))
    return out.withColumn("lang_pred", pred)


def chunk_documents(df: DataFrame, chunk_size: int = 64, overlap: int = 16,
                    text_col: str = "text", id_col: str = "doc_id"
                    ) -> DataFrame:
    """Split documents into fixed-size word chunks with overlap — the
    standard pre-tokenization step of a training-data pipeline (context
    windows with carried-over boundary words).

    Output: (doc_id, chunk_idx, n_chunk_words, chunk_text), one row per
    chunk; empty documents produce no chunks. Pure Column plan: one
    posexplode over a computed start-offset sequence — zero shuffles, the
    chunking is embarrassingly parallel over the document scan.
    """
    if not 0 <= overlap < chunk_size:
        raise ValueError("need 0 <= overlap < chunk_size")
    stride = chunk_size - overlap
    w = words_col(F.col(text_col))
    nw = F.size(w)
    # last start index: ceil((nw - chunk_size) / stride), 0 for short docs
    max_ci = F.when(nw <= chunk_size, F.lit(0)).otherwise(
        F.floor((nw - F.lit(chunk_size) + F.lit(stride - 1))
                / F.lit(stride)).cast("int"))
    starts = F.sequence(F.lit(0), max_ci)
    out = (df.where(nw > 0)
           .select(F.col(id_col).alias("doc_id"), w.alias("__w"),
                   F.explode(starts).alias("chunk_idx")))
    chunk = F.slice(F.col("__w"),
                    F.col("chunk_idx") * stride + 1, chunk_size)
    return out.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.size(chunk).cast("long").alias("n_chunk_words"),
        F.array_join(chunk, " ").alias("chunk_text"))


# ---------------------------------------------------------------------------
# Lexical relevance (round 8): TF-IDF term extraction and BM25 retrieval —
# the non-embedding half of similarity search. Classic corpus-curation
# uses: characteristic-term profiling, lexical decontamination probes,
# query-based corpus slicing.
# ---------------------------------------------------------------------------

BM25_K1 = 1.2
BM25_B = 0.75


def _corpus_stats(docs: DataFrame, text_col: str, id_col: str):
    """(tokens relation (id, w), per-doc lengths (id, dl), 1-row stats
    (n_docs, avgdl)). Tokens are words_col terms; empty docs keep dl from
    split semantics (split('', ' ') = [''] → dl 1, consistent with
    with_text_stats)."""
    w = words_col(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), w.alias("__w"))
    toks = base.select("id", F.explode("__w").alias("w"))
    lens = base.select("id", F.size("__w").alias("dl"))
    stats = lens.agg(F.count(F.lit(1)).alias("n_docs"),
                     F.avg("dl").alias("avgdl"))
    return toks, lens, stats


def tfidf_top_terms(docs: DataFrame, k: int = 5, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Top-k characteristic terms per document by smoothed TF-IDF.

    score(t, D) = tf(t, D) * (ln((1 + N) / (1 + df(t))) + 1)   (sklearn's
    smooth idf — never negative, never divides by zero). Output one row
    per kept term: (doc_id, term, tf, score) with score rounded to 6
    decimals so the DuckDB oracle compares exactly; ties break on the
    term string for determinism.

    Scale shape: one explode scan → per-(doc, term) count (map-side
    combined) → per-term document frequency (second small aggregate,
    broadcast back — it's one row per distinct TERM, vocabulary-sized,
    not corpus-sized) → per-doc top-k via a row_number window
    partitioned by doc (shuffles the (doc, term, tf) relation once on
    the doc id). No driver-side work. The tf relation feeds both the
    df-aggregate and the scoring join, so Spark re-runs the explode
    scan once per consumer (2 linear passes total, each map-side
    combined before its shuffle) — persist tf at giant corpus sizes if
    the second scan matters more than the cache footprint.
    """
    from pyspark.sql import Window
    toks, _lens, stats = _corpus_stats(docs, text_col, id_col)
    tf = toks.groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    scored = (tf.join(dfreq, "w")
              .crossJoin(F.broadcast(stats))
              .withColumn("score", F.round(
                  F.col("tf") * (F.log((1 + F.col("n_docs"))
                                       / (1 + F.col("df"))) + F.lit(1.0)),
                  6)))
    win = Window.partitionBy("id").orderBy(F.col("score").desc(),
                                           F.col("w").asc())
    return (scored.withColumn("__rn", F.row_number().over(win))
            .where(F.col("__rn") <= k)
            .select(F.col("id").alias(id_col), F.col("w").alias("term"),
                    F.col("tf").cast("long").alias("tf"), "score"))


def bm25_topk(docs: DataFrame, query: str, k: int = 10,
              k1: float = BM25_K1, b: float = BM25_B,
              text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Top-k documents for a query string by BM25 (Robertson/Sparck
    Jones idf, the Lucene-standard formulation).

    score(D, q) = Σ_t idf(t) · tf(t,D)·(k1+1) / (tf(t,D) + k1·(1 − b + b·|D|/avgdl))
    with idf(t) = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5)), query terms
    deduplicated, tokenization = words_col (same as every text operator
    here). Output (doc_id, score) — score rounded to 6 decimals, global
    top-k ordered by (score desc, doc_id) → TakeOrderedAndProject.

    Scale shape: the token scan filters to the query's terms FIRST
    (predicate on the exploded word — a handful of values, pushed into
    the scan), so the per-(doc, term) aggregate only sees matching
    postings; df comes off that same relation; corpus N/avgdl is a 1-row
    broadcast. One shuffle on doc id for the final per-doc sum.
    """
    qterms = sorted({t for t in query.split(" ") if t})
    if not qterms:
        raise ValueError("empty query")
    _toks, _lens, stats = _corpus_stats(docs, text_col, id_col)
    # carry the doc length THROUGH the explode instead of joining the
    # corpus-sized lens relation back onto the (tiny) matching postings:
    # dl rides as 8 bytes per filtered token row and survives the
    # per-(doc, term) aggregate, so the only corpus-wide work left is
    # the 1-row stats aggregate (map-side partial) — no corpus shuffle
    # for a query over a handful of terms (r11 opt, guide §2.3/§2.4)
    w = words_col(F.col(text_col))
    base = docs.select(F.col(id_col).alias("id"), w.alias("__w"))
    toks_dl = base.select("id", F.size("__w").alias("dl"),
                          F.explode("__w").alias("w"))
    tf = (toks_dl.where(F.col("w").isin(qterms))
          .groupBy("id", "w").agg(F.count(F.lit(1)).alias("tf"),
                                  F.max("dl").alias("dl")))
    dfreq = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    denom = F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = idf * F.col("tf") * (k1 + 1) / denom
    scored = (tf.join(F.broadcast(dfreq), "w")
              .crossJoin(F.broadcast(stats))
              .groupBy("id").agg(F.round(F.sum(contrib), 6).alias("score")))
    return (scored.select(F.col("id").alias(id_col), "score")
            .orderBy(F.col("score").desc(), F.col(id_col).asc())
            .limit(k))
