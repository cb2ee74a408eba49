"""N-Triples / N-Quads reader and serializer, fully distributed.

Reader: `spark.read.text` + Column-only regex decomposition — no Python
UDFs, so a 100 TB dump parses at parquet-scan speed with whole-stage
codegen. Serializer: term formatting as Column expressions + `write.text`.

reference: Store::load_from_reader (lib/rdf-fusion/src/store.rs:477-558)
and the oxrdfio parsers; here the grammar subset is line-based N-Triples /
N-Quads (the reference's default interchange format). Escapes handled:
\\\\ \\" \\n \\r \\t; \\uXXXX sequences are preserved verbatim (documented
limitation — pre-normalize exotic dumps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..terms import (
    RDF_LANG_STRING,
    TERM_TYPE,
    TT_BNODE,
    TT_IRI,
    TT_LITERAL,
    XSD_STRING,
    term_struct,
)

# IRIREF per the N-Triples grammar: ABSOLUTE (scheme required) and no
# control/space/angle/quote/brace/pipe/caret/backtick/backslash chars —
# `<foo>`, `<2http://x>`, `<b@d://x>` are all syntax errors, not data
_IRI = (r'<([A-Za-z][A-Za-z0-9+.\-]*:'
        r'(?:[^\x00-\x20<>"{}|^`\\]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*)>')
_BNODE = r"_:(\S+)"
_LIT = r'"((?:[^"\\]|\\.)*)"(?:@([A-Za-z0-9-]+)|\^\^<([^>]*)>)?'
_TERM = f"(?:{_IRI}|{_BNODE}|{_LIT})"
# groups per term: 1=iri, 2=bnode, 3=lit value, 4=lang, 5=dt
_G = 5
LINE_RE = (r"^\s*" + _TERM + r"\s+" + _TERM + r"\s+" + _TERM
           + r"(?:\s+" + _TERM + r")?\s*\.\s*$")


def _unescape(c: Column) -> Column:
    c = F.replace(c, F.lit("\\t"), F.lit("\t"))
    c = F.replace(c, F.lit("\\r"), F.lit("\r"))
    c = F.replace(c, F.lit("\\n"), F.lit("\n"))
    c = F.replace(c, F.lit('\\"'), F.lit('"'))
    c = F.replace(c, F.lit("\\\\"), F.lit("\\"))
    return c


def _escape(c: Column) -> Column:
    c = F.replace(c, F.lit("\\"), F.lit("\\\\"))
    c = F.replace(c, F.lit('"'), F.lit('\\"'))
    c = F.replace(c, F.lit("\n"), F.lit("\\n"))
    c = F.replace(c, F.lit("\r"), F.lit("\\r"))
    c = F.replace(c, F.lit("\t"), F.lit("\\t"))
    return c


def _term_from_groups(line: Column, base: int) -> Column:
    """Decode one term from regex groups base..base+4 (NULL if absent)."""
    iri = F.regexp_extract(line, LINE_RE, base)
    bnode = F.regexp_extract(line, LINE_RE, base + 1)
    lit = F.regexp_extract(line, LINE_RE, base + 2)
    lang = F.regexp_extract(line, LINE_RE, base + 3)
    dt = F.regexp_extract(line, LINE_RE, base + 4)
    # regexp_extract yields '' for non-participating groups; literals are
    # detected by the quote character still present in the raw line match —
    # distinguish '' (empty literal) from absent via iri/bnode emptiness.
    is_iri = iri != ""
    is_bnode = bnode != ""
    has_lit = (~is_iri) & (~is_bnode)
    lang_n = F.when(lang != "", F.lower(lang))
    dt_n = (
        F.when(lang != "", F.lit(RDF_LANG_STRING))
        .when(dt != "", dt)
        .otherwise(F.lit(XSD_STRING))
    )
    return (
        F.when(is_iri, term_struct(F.lit(TT_IRI), iri))
        .when(is_bnode, term_struct(F.lit(TT_BNODE), bnode))
        .when(has_lit, term_struct(F.lit(TT_LITERAL), _unescape(lit),
                                   dt_n, lang_n))
    )


def lines_to_quads(lines: DataFrame, strict: bool = True) -> DataFrame:
    """N-Triples/N-Quads lines (column `line`) → quads. Pure Column ops,
    so it applies unchanged to a STREAMING text source (streaming/ingest).

    strict=True (default) raises on the first malformed line — silently
    dropping corrupt lines from a 100 TB dump is data loss, not leniency.
    strict=False skips malformed lines (salvage/quarantine loading)."""
    lines = lines.where(
        (F.trim(F.col("line")) != "") & ~F.trim(F.col("line")).startswith("#"))
    ok = F.regexp_like(F.col("line"), F.lit(LINE_RE))
    if strict:
        lines = lines.select(
            F.when(ok, F.col("line")).otherwise(F.raise_error(F.concat(
                F.lit("malformed N-Triples/N-Quads line: "), F.col("line")
            ))).alias("line"))
        matched = lines
    else:
        matched = lines.where(ok)
    s = _term_from_groups(F.col("line"), 1)
    p = _term_from_groups(F.col("line"), 1 + _G)
    o = _term_from_groups(F.col("line"), 1 + 2 * _G)
    g = _term_from_groups(F.col("line"), 1 + 3 * _G)
    # a non-participating 4th term yields an all-empty IRI branch: detect by
    # raw absence of a 4th term in the line (graph col NULL)
    has_g = F.regexp_extract(F.col("line"), LINE_RE, 1 + 3 * _G) != ""
    has_g = has_g | (F.regexp_extract(F.col("line"), LINE_RE, 2 + 3 * _G) != "")
    return matched.select(
        F.when(has_g, g).alias("graph"),
        s.alias("subject"), p.alias("predicate"), o.alias("object"),
    )


def read_ntriples(spark: SparkSession, path: str,
                  strict: bool = True) -> DataFrame:
    """Parse an N-Triples/N-Quads file (or directory) into a quads DataFrame
    (graph = NULL for triples; 4th term becomes the graph for quads)."""
    return lines_to_quads(
        spark.read.text(path).select(F.col("value").alias("line")),
        strict=strict)


def format_term(c: Column) -> Column:
    """Term struct → N-Triples lexical form."""
    lit_body = F.concat(F.lit('"'), _escape(c["v"]), F.lit('"'))
    lit = (
        F.when(c["lang"].isNotNull(),
               F.concat(lit_body, F.lit("@"), c["lang"]))
        .when(c["dt"].isNotNull() & (c["dt"] != XSD_STRING),
              F.concat(lit_body, F.lit("^^<"), c["dt"], F.lit(">")))
        .otherwise(lit_body)
    )
    return (
        F.when(c["t"] == TT_IRI, F.concat(F.lit("<"), c["v"], F.lit(">")))
        .when(c["t"] == TT_BNODE, F.concat(F.lit("_:"), c["v"]))
        .otherwise(lit)
    )


def quads_to_lines(quads: DataFrame) -> DataFrame:
    """Quads → one N-Triples/N-Quads line per row (column `line`)."""
    parts = [
        format_term(F.col("subject")),
        F.lit(" "),
        format_term(F.col("predicate")),
        F.lit(" "),
        format_term(F.col("object")),
    ]
    g = F.when(F.col("graph").isNotNull(),
               F.concat(F.lit(" "), format_term(F.col("graph")))).otherwise(F.lit(""))
    return quads.select(F.concat(*parts, g, F.lit(" .")).alias("line"))


def write_ntriples(quads: DataFrame, path: str, mode: str = "overwrite") -> None:
    quads_to_lines(quads).write.mode(mode).text(path)
