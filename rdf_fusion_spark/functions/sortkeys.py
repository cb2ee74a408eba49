"""ORDER BY total order via computed sort-key struct columns.

The reference works around DataFusion's lack of user-defined orderings with
a SortableTerm encoding — Struct{type: u8, numeric: f64, bytes: binary}
whose lexicographic struct order approximates the SPARQL total order
(lib/encoding/src/sortable_term/encoding.rs:13-96). Spark natively orders
structs lexicographically field-by-field (nulls first), so the same trick
is a plain computed column — no custom physical operator.

Order (ascending): unbound < blank nodes < IRIs < numeric literals (by
value, cross-type) < booleans < dateTimes < strings < other literals
(by datatype, then lexical form).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..terms import (
    RDF_LANG_STRING,
    TT_BNODE,
    TT_IRI,
    TT_LITERAL,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_STRING,
)
from .typed_ops import as_boolean, as_double, as_timestamp, is_numeric


def sort_key(c: Column) -> Column:
    """Sortable struct (rank, num, s1, s2) for a term column; NULL for unbound
    so orderBy(asc_nulls_first) puts unbound first like the reference."""
    rank = (
        F.when(c["t"] == TT_BNODE, 0)
        .when(c["t"] == TT_IRI, 1)
        .when(is_numeric(c), 2)
        .when(c["dt"] == XSD_BOOLEAN, 3)
        .when(c["dt"].isin(XSD_DATETIME, XSD_DATE), 4)
        .when((c["dt"] == XSD_STRING) | (c["dt"] == RDF_LANG_STRING), 5)
        .otherwise(6)
        .cast("tinyint")
    )
    num = (
        F.when(is_numeric(c), as_double(c))
        .when(c["dt"] == XSD_BOOLEAN, as_boolean(c).cast("double"))
        .when(c["dt"].isin(XSD_DATETIME, XSD_DATE),
              as_timestamp(c).cast("double"))
        .otherwise(F.lit(None).cast("double"))
    )
    s1 = (
        F.when(c["t"] != TT_LITERAL, c["v"])
        .when(rank == 5, c["v"])
        .when(rank == 6, c["dt"])
        .otherwise(F.lit(None).cast("string"))
    )
    s2 = F.when(rank == 6, c["v"]).otherwise(F.lit(None).cast("string"))
    return F.when(
        c.isNotNull(),
        F.struct(rank.alias("rank"), num.alias("num"), s1.alias("s1"), s2.alias("s2")),
    )
