"""Value-space views of plain terms, as pure Column expressions.

The reference materializes a TypedValue dense-union encoding and dispatches
per-variant (lib/encoding/src/typed_value/encoding.rs:16-136,
lib/functions/src/scalar/dispatch/binary.rs). In Spark we instead compute
value-space views lazily with CASE expressions over the plain-term struct —
whole-stage codegen folds these into tight JVM loops and we never carry a
wide union struct through shuffles.

SPARQL evaluation errors are modeled as NULL (the reference's ThinError),
which propagates naturally through Spark expressions and is dropped by
FILTER (reference: lib/functions/src/builtin/native/effective_boolean_value.rs).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..terms import (
    INTEGER_TYPES,
    NUMERIC_TYPES,
    RDF_LANG_STRING,
    TT_LITERAL,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_FLOAT,
    XSD_INTEGER,
    XSD_STRING,
    XSD_TIME,
    term_struct,
)

DECIMAL_T = "decimal(38,18)"

# numeric promotion ranks (reference ladder: lib/functions/src/aggregates/sum.rs:14-100)
RANK_INTEGER = 0
RANK_DECIMAL = 1
RANK_FLOAT = 2
RANK_DOUBLE = 3

_RANK_DT = [XSD_INTEGER, XSD_DECIMAL, XSD_FLOAT, XSD_DOUBLE]


def is_numeric(c: Column) -> Column:
    return (c["t"] == TT_LITERAL) & c["dt"].isin(*NUMERIC_TYPES)


def numeric_rank(c: Column) -> Column:
    """0=integer family, 1=decimal, 2=float, 3=double; NULL if not numeric."""
    return (
        F.when((c["t"] == TT_LITERAL) & c["dt"].isin(*INTEGER_TYPES), F.lit(RANK_INTEGER))
        .when((c["t"] == TT_LITERAL) & (c["dt"] == XSD_DECIMAL), F.lit(RANK_DECIMAL))
        .when((c["t"] == TT_LITERAL) & (c["dt"] == XSD_FLOAT), F.lit(RANK_FLOAT))
        .when((c["t"] == TT_LITERAL) & (c["dt"] == XSD_DOUBLE), F.lit(RANK_DOUBLE))
    )


def as_double(c: Column) -> Column:
    """Numeric value as double; NULL (error) for non-numerics / ill-typed."""
    return F.when(is_numeric(c), (c["v"]).try_cast("double"))


def as_long(c: Column) -> Column:
    return F.when(
        (c["t"] == TT_LITERAL) & c["dt"].isin(*INTEGER_TYPES),
        (c["v"]).try_cast("long"),
    )


def as_decimal(c: Column) -> Column:
    return F.when(
        (c["t"] == TT_LITERAL) & c["dt"].isin(*(INTEGER_TYPES + (XSD_DECIMAL,))),
        (c["v"]).try_cast(DECIMAL_T),
    )


def as_boolean(c: Column) -> Column:
    """xsd:boolean value; NULL for anything else."""
    return F.when(
        (c["t"] == TT_LITERAL) & (c["dt"] == XSD_BOOLEAN),
        F.when(c["v"].isin("true", "1"), F.lit(True))
        .when(c["v"].isin("false", "0"), F.lit(False)),
    )


def as_timestamp(c: Column) -> Column:
    """xsd:dateTime/date value as a session-UTC timestamp (offset applied).

    Spark's string→timestamp cast accepts ISO-8601 with 'T', optional
    fractional seconds and optional zone offsets; with
    spark.sql.session.timeZone=UTC the instant semantics match the oracle.
    """
    return F.when(
        (c["t"] == TT_LITERAL) & c["dt"].isin(XSD_DATETIME, XSD_DATE),
        (c["v"]).try_cast("timestamp"),
    )


def as_string(c: Column) -> Column:
    """String value of simple/xsd:string/lang literals; NULL otherwise
    (argument-compatibility guard for string functions)."""
    return F.when(
        (c["t"] == TT_LITERAL) & ((c["dt"] == XSD_STRING) | (c["dt"] == RDF_LANG_STRING)),
        c["v"],
    )


def str_or_iri(c: Column) -> Column:
    """Value for STR(): lexical form of any literal, or the IRI string."""
    return F.when(c["t"] != F.lit(1).cast("tinyint"), c["v"])


def is_string_like(c: Column) -> Column:
    return (c["t"] == TT_LITERAL) & ((c["dt"] == XSD_STRING) | (c["dt"] == RDF_LANG_STRING))


def is_plain_string(c: Column) -> Column:
    return (c["t"] == TT_LITERAL) & (c["dt"] == XSD_STRING)


# ---------------------------------------------------------------------------
# Effective boolean value
# ---------------------------------------------------------------------------

def ebv(c: Column) -> Column:
    """SPARQL effective boolean value; NULL = type error.

    reference: lib/functions/src/builtin/native/effective_boolean_value.rs:98-130
    """
    num = (c["v"]).try_cast("double")
    return (
        F.when(c.isNull(), F.lit(None).cast("boolean"))
        .when((c["t"] == TT_LITERAL) & (c["dt"] == XSD_BOOLEAN),
              F.when(c["v"].isin("true", "1"), True)
              .when(c["v"].isin("false", "0"), False))
        .when((c["t"] == TT_LITERAL) & c["dt"].isin(*NUMERIC_TYPES),
              # ill-typed numeric literal → false per spec (EBV of invalid lexical = false)
              F.coalesce((num != 0.0) & ~F.isnan(num), F.lit(False)))
        .when(is_string_like(c), F.length(c["v"]) > 0)
        .otherwise(F.lit(None).cast("boolean"))
    )


def bool_term(b: Column) -> Column:
    """Wrap a native boolean Column back into an xsd:boolean term
    (reference: NativeBooleanAsTerm, lib/functions/src/builtin/native/)."""
    return F.when(
        b.isNotNull(),
        term_struct(F.lit(TT_LITERAL), F.when(b, "true").otherwise("false"),
                    F.lit(XSD_BOOLEAN)),
    )


def int_term(n: Column) -> Column:
    return F.when(
        n.isNotNull(),
        term_struct(F.lit(TT_LITERAL), n.cast("string"), F.lit(XSD_INTEGER)),
    )


def double_term(x: Column) -> Column:
    return F.when(
        x.isNotNull(),
        term_struct(F.lit(TT_LITERAL), x.cast("string"), F.lit(XSD_DOUBLE)),
    )


def decimal_term(x: Column) -> Column:
    # canonical xsd:decimal lexical: strip trailing zeros but keep at least one digit
    s = x.cast("string")
    canon = F.when(
        s.contains("."),
        F.regexp_replace(F.regexp_replace(s, r"0+$", ""), r"\.$", ""),
    ).otherwise(s)
    return F.when(
        x.isNotNull(),
        term_struct(F.lit(TT_LITERAL), canon, F.lit(XSD_DECIMAL)),
    )


def string_term(s: Column) -> Column:
    return F.when(s.isNotNull(), term_struct(F.lit(TT_LITERAL), s, F.lit(XSD_STRING)))


# ---------------------------------------------------------------------------
# Value-space equality and ordering
# ---------------------------------------------------------------------------

def rdf_equal(a: Column, b: Column) -> Column:
    """SPARQL '=' (value space), 3-valued: NULL = error.

    reference: lib/functions/src/scalar/comparison/equal.rs semantics —
    numerics compare by value with promotion; strings by codepoints;
    booleans/dateTimes by value; other literals fall back to sameTerm with
    error when not identical; IRI/bnode compare by identity (false, not
    error, when different node kinds).
    """
    both_num = is_numeric(a) & is_numeric(b)
    both_str = is_plain_string(a) & is_plain_string(b)
    both_lang = ((a["dt"] == RDF_LANG_STRING) & (b["dt"] == RDF_LANG_STRING)
                 & (a["t"] == TT_LITERAL) & (b["t"] == TT_LITERAL))
    both_bool = ((a["t"] == TT_LITERAL) & (a["dt"] == XSD_BOOLEAN)
                 & (b["t"] == TT_LITERAL) & (b["dt"] == XSD_BOOLEAN))
    both_dt = ((a["t"] == TT_LITERAL) & a["dt"].isin(XSD_DATETIME, XSD_DATE)
               & (b["t"] == TT_LITERAL) & b["dt"].isin(XSD_DATETIME, XSD_DATE))
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("boolean"))
        .when(both_num,
              # exact within decimal range; doubles compared as double
              F.when((numeric_rank(a) <= RANK_DECIMAL) & (numeric_rank(b) <= RANK_DECIMAL),
                     as_decimal(a) == as_decimal(b))
              .otherwise(as_double(a) == as_double(b)))
        .when(both_str, a["v"] == b["v"])
        .when(both_lang, (a["v"] == b["v"]) & (a["lang"] == b["lang"]))
        .when(both_bool, as_boolean(a) == as_boolean(b))
        .when(both_dt, as_timestamp(a) == as_timestamp(b))
        .when((a["t"] != TT_LITERAL) | (b["t"] != TT_LITERAL), a == b)
        # both literals, at least one of unknown/unsupported datatype:
        .when(a == b, F.lit(True))
        .otherwise(F.lit(None).cast("boolean"))
    )


def rdf_not_equal(a: Column, b: Column) -> Column:
    return ~rdf_equal(a, b)


def rdf_compare(a: Column, b: Column) -> Column:
    """Three-way value comparison for < <= > >=: -1/0/1, NULL = not comparable.

    Comparable pairs per SPARQL 1.1 operator table: numeric/numeric,
    simple-or-xsd:string pairs, boolean/boolean, dateTime/dateTime.
    """
    both_num = is_numeric(a) & is_numeric(b)
    both_str = is_plain_string(a) & is_plain_string(b)
    both_bool = ((a["t"] == TT_LITERAL) & (a["dt"] == XSD_BOOLEAN)
                 & (b["t"] == TT_LITERAL) & (b["dt"] == XSD_BOOLEAN))
    both_dt = ((a["t"] == TT_LITERAL) & a["dt"].isin(XSD_DATETIME, XSD_DATE)
               & (b["t"] == TT_LITERAL) & b["dt"].isin(XSD_DATETIME, XSD_DATE))

    def cmp3(x: Column, y: Column) -> Column:
        return F.when(x < y, -1).when(x > y, 1).when(x == y, 0)

    return (
        F.when(a.isNull() | b.isNull(), F.lit(None).cast("int"))
        .when(both_num,
              F.when((numeric_rank(a) <= RANK_DECIMAL) & (numeric_rank(b) <= RANK_DECIMAL),
                     cmp3(as_decimal(a), as_decimal(b)))
              .otherwise(cmp3(as_double(a), as_double(b))))
        .when(both_str, cmp3(a["v"], b["v"]))
        .when(both_bool, cmp3(as_boolean(a).cast("int"), as_boolean(b).cast("int")))
        .when(both_dt, cmp3(as_timestamp(a), as_timestamp(b)))
        .otherwise(F.lit(None).cast("int"))
    )


def rdf_less(a: Column, b: Column) -> Column:
    return rdf_compare(a, b) < 0


def rdf_less_eq(a: Column, b: Column) -> Column:
    return rdf_compare(a, b) <= 0


def rdf_greater(a: Column, b: Column) -> Column:
    return rdf_compare(a, b) > 0


def rdf_greater_eq(a: Column, b: Column) -> Column:
    return rdf_compare(a, b) >= 0


# ---------------------------------------------------------------------------
# Arithmetic with numeric promotion
# ---------------------------------------------------------------------------

def _binary_numeric(a: Column, b: Column, op: str) -> Column:
    """a OP b with the XPath promotion ladder; result is a term struct.

    integer OP integer → integer (except '/': decimal);
    any decimal → decimal; any float/double → double
    (float kept as double internally; lexical forms match either way).
    reference: lib/functions/src/scalar/numeric/add.rs et al.
    """
    ra, rb = numeric_rank(a), numeric_rank(b)
    rank = F.greatest(ra, rb)
    la, lb = as_long(a), as_long(b)
    da, db = as_decimal(a), as_decimal(b)
    xa, xb = as_double(a), as_double(b)

    if op == "+":
        lres, dres, xres = la + lb, da + db, xa + xb
    elif op == "-":
        lres, dres, xres = la - lb, da - db, xa - xb
    elif op == "*":
        lres, dres, xres = la * lb, da * db, xa * xb
    elif op == "/":
        # integer ÷ integer → decimal; division by zero → error (NULL)
        lres = None
        dres = F.when(db != 0, da / db)
        xres = xa / xb
    else:  # pragma: no cover
        raise ValueError(op)

    valid = is_numeric(a) & is_numeric(b)
    out = (
        F.when(~valid, F.lit(None).cast("struct<t:tinyint,v:string,dt:string,lang:string>"))
        .when(rank >= RANK_FLOAT, double_term(xres))
        .when((rank == RANK_DECIMAL) | F.lit(op == "/"), decimal_term(dres))
    )
    # '/' has no integer branch: integer ÷ integer → decimal per the spec
    if op != "/":
        out = out.otherwise(int_term(lres))
    return out


def rdf_add(a: Column, b: Column) -> Column:
    return _binary_numeric(a, b, "+")


def rdf_sub(a: Column, b: Column) -> Column:
    return _binary_numeric(a, b, "-")


def rdf_mul(a: Column, b: Column) -> Column:
    return _binary_numeric(a, b, "*")


def rdf_div(a: Column, b: Column) -> Column:
    return _binary_numeric(a, b, "/")


def rdf_neg(a: Column) -> Column:
    rank = numeric_rank(a)
    return (
        F.when(rank.isNull(), F.lit(None).cast("struct<t:tinyint,v:string,dt:string,lang:string>"))
        .when(rank >= RANK_FLOAT, double_term(-as_double(a)))
        .when(rank == RANK_DECIMAL, decimal_term(-as_decimal(a)))
        .otherwise(int_term(-as_long(a)))
    )


def rdf_unary_plus(a: Column) -> Column:
    rank = numeric_rank(a)
    return (
        F.when(rank.isNull(), F.lit(None).cast("struct<t:tinyint,v:string,dt:string,lang:string>"))
        .when(rank >= RANK_FLOAT, double_term(as_double(a)))
        .when(rank == RANK_DECIMAL, decimal_term(as_decimal(a)))
        .otherwise(int_term(as_long(a)))
    )
