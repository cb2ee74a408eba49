"""PII detection and redaction over a text column.

A standard curation stage in large-scale training-data pipelines:
count pattern-class hits per document (for filtering / reporting) and
rewrite the text with class tags (for redacted exports). Everything is
built-in Column expressions (regexp_count / regexp_replace), so the
whole stage stays inside whole-stage codegen — one scan, no shuffle,
no Python in the hot path; at 100 TB this runs at parquet-scan speed.

Pattern-language note: the patterns below use only the common subset of
Java regex (Spark) and RE2 (DuckDB, Go, etc.) — character classes,
bounded quantifiers, word boundaries; NO lookaround or backreferences —
so an external SQL engine replicates hits bit-for-bit (the oracle-
parity gate relies on this).

Reference analogue: none — the reference engine (rdf-fusion) has no
curation layer; this extends the pipeline suite alongside dedup.py /
curation.py / text.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# class → (pattern, redaction tag). Order matters for redaction (an
# SSN-shaped span inside a longer number must be consumed by the more
# specific class first); detection counts are per-class independent.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
     "[EMAIL]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def with_pii_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document hit count per PII class + their total.

    One codegen'd projection over the scan; column `pii_total` supports
    the usual curation filter (`pii_total == 0` keeps clean docs)."""
    out = df
    total: Column = F.lit(0)
    for name, pat, _ in PII_PATTERNS:
        c = F.regexp_count(F.col(text_col), F.lit(pat))
        out = out.withColumn(f"pii_{name}", c)
        total = total + c
    return out.withColumn("pii_total", total.cast("int"))


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Text with every PII span replaced by its class tag.

    Classes apply in PII_PATTERNS order, each globally; a span consumed
    by an earlier class is invisible to later ones (deterministic, and
    identical to a sequential regexp_replace chain in any RE2/PCRE
    engine)."""
    c = F.col(text_col)
    for _, pat, tag in PII_PATTERNS:
        c = F.regexp_replace(c, pat, tag)
    return df.withColumn(out_col, c)
