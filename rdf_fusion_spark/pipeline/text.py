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
