"""Driver-facing query inventory: SPARQL over the RDF-ized warehouse,
each with an equivalent ANSI-SQL oracle on the raw relational tables.

This is the correctness gate (CORRECTNESS_r{N}.json): every operator family
from SURVEY.md §2 appears here as a named query whose Spark result must
hash-match the DuckDB oracle at sf=0.01.

Exactness conventions (doubles are the enemy):
  * Per-row double arithmetic (x*2, x*(1-y)) is bit-exact in both engines.
  * SUM/AVG over doubles is order-dependent → both sides convert each
    double to an exact DECIMAL(38,18) **via its shortest round-trip string**
    (SPARQL `xsd:decimal(?x)` parses our lexical form; the oracle uses
    CAST(CAST(x AS VARCHAR) AS DECIMAL(38,18))), sum exactly, then cast the
    total back to DOUBLE.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .store import GraphStore

PROLOGUE = """
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
PREFIX r: <x:r#>
PREFIX n: <x:n#>
PREFIX c: <x:c#>
PREFIX s: <x:s#>
PREFIX p: <x:p#>
PREFIX o: <x:o#>
PREFIX l: <x:l#>
PREFIX e: <x:e#>
PREFIX d: <x:d#>
"""

_GRAPH_CACHE: dict[str, GraphStore] = {}


def get_graph(spark: SparkSession, sf_dir: str) -> GraphStore:
    """Cached RDF view of the warehouse at sf_dir (built once per session)."""
    key = sf_dir.rstrip("/")
    store = _GRAPH_CACHE.get(key)
    if store is None or store.spark is not spark:
        store = GraphStore.from_relational(spark, key).cached()
        store.quads.count()  # materialize the cache eagerly
        _GRAPH_CACHE[key] = store
    return store


def _u(col: Column, typ: str) -> Column:
    """Un-term: extract the native value from a term struct column."""
    v = col["v"]
    if typ == "str":
        return v
    if typ == "long":
        return v.try_cast("long")
    if typ == "double":
        return v.try_cast("double")
    if typ == "timestamp":
        return v.try_cast("timestamp")
    if typ == "bool":
        return v == "true"
    raise ValueError(typ)


@dataclass
class QuerySpec:
    sparql: str                      # without prologue
    out: list[tuple[str, str]]       # (column, native type) in output order
    oracle: Optional[str]            # DuckDB SQL, or None for rows-only check

    def run(self, spark: SparkSession, sf_dir: str) -> DataFrame:
        store = get_graph(spark, sf_dir)
        res = store.query(PROLOGUE + self.sparql)
        cols = [_u(res.df[name], typ).alias(name) for name, typ in self.out]
        return res.df.select(*cols)


# exact decimal via round-trip string, for order-independent double sums
def _dec(sql_expr: str) -> str:
    return f"CAST(CAST({sql_expr} AS VARCHAR) AS DECIMAL(38,18))"


SPECS: dict[str, QuerySpec] = {}


def _q(name: str, sparql: str, out: list[tuple[str, str]], oracle: Optional[str]):
    SPECS[name] = QuerySpec(sparql, out, oracle)


# ---------------------------------------------------------------------------
# §2.4 aggregation — TPC-H Q1 shape (scan + filter + group + 5 aggregates)
# ---------------------------------------------------------------------------

_q(
    "q1_pricing_summary",
    """
    SELECT ?l_returnflag ?l_linestatus
           (xsd:double(SUM(xsd:decimal(?qty))) AS ?sum_qty)
           (xsd:double(SUM(xsd:decimal(?price))) AS ?sum_base_price)
           (xsd:double(SUM(xsd:decimal(?price * (1 - ?disc)))) AS ?sum_disc_price)
           (xsd:double(SUM(xsd:decimal(?disc))) / COUNT(?disc) AS ?avg_disc)
           (COUNT(*) AS ?count_order)
    WHERE {
      ?li l:l_quantity ?qty ; l:l_extendedprice ?price ; l:l_discount ?disc ;
          l:l_returnflag ?l_returnflag ; l:l_linestatus ?l_linestatus ;
          l:l_shipdate ?sd .
      FILTER(?sd <= "1998-09-02T00:00:00"^^xsd:dateTime)
    }
    GROUP BY ?l_returnflag ?l_linestatus
    """,
    [("l_returnflag", "str"), ("l_linestatus", "str"), ("sum_qty", "double"),
     ("sum_base_price", "double"), ("sum_disc_price", "double"),
     ("avg_disc", "double"), ("count_order", "long")],
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(CAST(SUM({_dec('l_quantity')}) AS VARCHAR) AS DOUBLE) AS sum_qty,
           CAST(CAST(SUM({_dec('l_extendedprice')}) AS VARCHAR) AS DOUBLE) AS sum_base_price,
           CAST(CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS VARCHAR) AS DOUBLE)
               AS sum_disc_price,
           CAST(CAST(SUM({_dec('l_discount')}) AS VARCHAR) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)

# ---------------------------------------------------------------------------
# §2.3 joins — BGP star join with constant + range filters
# ---------------------------------------------------------------------------

_q(
    "q2_join_region_filter",
    """
    SELECT ?c_name ?n_name WHERE {
      ?cust c:c_nationkey ?nat ; c:c_name ?c_name ; c:c_acctbal ?ab .
      ?nat n:n_regionkey ?reg ; n:n_name ?n_name .
      ?reg r:r_name "ASIA" .
      FILTER(?ab > 1000.0)
    }
    """,
    [("c_name", "str"), ("n_name", "str")],
    """
    SELECT c_name, n_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA' AND c_acctbal > 1000.0
    """,
)

_q(
    "q5_star_join",
    """
    SELECT ?n_name (xsd:double(SUM(xsd:decimal(?price * (1 - ?disc)))) AS ?revenue)
    WHERE {
      ?li l:l_orderkey ?ord ; l:l_suppkey ?sup ;
          l:l_extendedprice ?price ; l:l_discount ?disc .
      ?ord o:o_custkey ?cust .
      ?cust c:c_nationkey ?nat .
      ?sup s:s_nationkey ?nat .
      ?nat n:n_name ?n_name .
    }
    GROUP BY ?n_name
    """,
    [("n_name", "str"), ("revenue", "double")],
    f"""
    SELECT n_name,
           CAST(CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON c_nationkey = n_nationkey AND s_nationkey = n_nationkey
    GROUP BY n_name
    """,
)

# ---------------------------------------------------------------------------
# §2.6 sort/limit — top-k with deterministic tiebreak
# ---------------------------------------------------------------------------

_q(
    "q3_topk_revenue",
    """
    SELECT ?okey (xsd:double(SUM(xsd:decimal(?price * (1 - ?disc)))) AS ?revenue)
    WHERE {
      ?li l:l_orderkey ?ord ; l:l_extendedprice ?price ; l:l_discount ?disc .
      ?ord o:o_orderkey ?okey .
    }
    GROUP BY ?okey
    ORDER BY DESC(?revenue) ?okey
    LIMIT 10
    """,
    [("okey", "long"), ("revenue", "double")],
    f"""
    SELECT o_orderkey AS okey,
           CAST(CAST(SUM({_dec('l_extendedprice * (1 - l_discount)')}) AS VARCHAR) AS DOUBLE) AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderkey
    ORDER BY revenue DESC, okey
    LIMIT 10
    """,
)

# ---------------------------------------------------------------------------
# §2.3 OPTIONAL (left join) with filter inside the optional
# ---------------------------------------------------------------------------

_q(
    "q_optional_highqty",
    """
    SELECT ?okey ?qty WHERE {
      ?ord o:o_orderkey ?okey .
      OPTIONAL {
        ?li l:l_orderkey ?ord ; l:l_quantity ?qty .
        FILTER(?qty >= 48.0)
      }
    }
    """,
    [("okey", "long"), ("qty", "double")],
    """
    SELECT o_orderkey AS okey, l.l_quantity AS qty
    FROM orders
    LEFT JOIN (SELECT * FROM lineitem WHERE l_quantity >= 48.0) l
      ON l.l_orderkey = o_orderkey
    """,
)

# ---------------------------------------------------------------------------
# §2.3 NOT EXISTS (anti join)
# ---------------------------------------------------------------------------

_q(
    "q_not_exists_customers",
    """
    SELECT ?ckey WHERE {
      ?cust c:c_custkey ?ckey .
      FILTER NOT EXISTS { ?ord o:o_custkey ?cust }
    }
    """,
    [("ckey", "long")],
    """
    SELECT c_custkey AS ckey FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
    """,
)

# ---------------------------------------------------------------------------
# §2.3 MINUS
# ---------------------------------------------------------------------------

_q(
    "q_minus_nations",
    """
    SELECT ?nname WHERE {
      ?nat n:n_name ?nname .
      MINUS { ?cust c:c_nationkey ?nat . ?nat n:n_name ?nname . }
    }
    """,
    [("nname", "str")],
    """
    SELECT n_name AS nname FROM nation
    WHERE n_nationkey NOT IN (SELECT c_nationkey FROM customer)
    """,
)

# ---------------------------------------------------------------------------
# §2.6 UNION (bag semantics)
# ---------------------------------------------------------------------------

_q(
    "q_union_names",
    """
    SELECT ?name WHERE {
      { ?cust c:c_name ?name ; c:c_acctbal ?ab . FILTER(?ab > 9000.0) }
      UNION
      { ?sup s:s_name ?name }
    }
    """,
    [("name", "str")],
    """
    SELECT c_name AS name FROM customer WHERE c_acctbal > 9000.0
    UNION ALL
    SELECT s_name AS name FROM supplier
    """,
)

# ---------------------------------------------------------------------------
# §2.7 property paths — sequence path
# ---------------------------------------------------------------------------

_q(
    "q_path_seq_region",
    """
    SELECT ?ckey ?rname WHERE {
      ?cust c:c_custkey ?ckey .
      ?cust (c:c_nationkey/n:n_regionkey) ?reg .
      ?reg r:r_name ?rname .
    }
    """,
    [("ckey", "long"), ("rname", "str")],
    """
    SELECT c_custkey AS ckey, r_name AS rname
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)

# ---------------------------------------------------------------------------
# §2.7 Kleene plus — transitive closure, oracle via recursive CTE
# ---------------------------------------------------------------------------

_q(
    "q_path_kleene_plus",
    """
    SELECT ?x ?y WHERE { ?x (c:c_nationkey|n:n_regionkey)+ ?y }
    """,
    [("x", "str"), ("y", "str")],
    """
    WITH RECURSIVE edge AS (
      SELECT 'x:c:' || CAST(c_custkey AS VARCHAR) AS src,
             'x:n:' || CAST(c_nationkey AS VARCHAR) AS dst FROM customer
      UNION ALL
      SELECT 'x:n:' || CAST(n_nationkey AS VARCHAR),
             'x:r:' || CAST(n_regionkey AS VARCHAR) FROM nation
    ), closure AS (
      SELECT src, dst FROM edge
      UNION
      SELECT c.src, e.dst FROM closure c JOIN edge e ON c.dst = e.src
    )
    SELECT src AS x, dst AS y FROM closure
    """,
)

# ---------------------------------------------------------------------------
# §2.1 VALUES inline data
# ---------------------------------------------------------------------------

_q(
    "q_values_segment",
    """
    SELECT ?ckey ?seg WHERE {
      VALUES ?seg { "BUILDING" "AUTOMOBILE" }
      ?cust c:c_mktsegment ?seg ; c:c_custkey ?ckey .
    }
    """,
    [("ckey", "long"), ("seg", "str")],
    """
    SELECT c_custkey AS ckey, c_mktsegment AS seg FROM customer
    WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    """,
)

# ---------------------------------------------------------------------------
# §2.6 DISTINCT + ORDER BY
# ---------------------------------------------------------------------------

_q(
    "q_distinct_priorities",
    """
    SELECT DISTINCT ?prio WHERE { ?ord o:o_orderpriority ?prio } ORDER BY ?prio
    """,
    [("prio", "str")],
    "SELECT DISTINCT o_orderpriority AS prio FROM orders ORDER BY prio",
)

# ---------------------------------------------------------------------------
# §2.8 expressions — BIND, string + arithmetic functions
# ---------------------------------------------------------------------------

_q(
    "q_bind_expressions",
    """
    SELECT ?ckey ?up ?bal2 ?nlen WHERE {
      ?cust c:c_custkey ?ckey ; c:c_name ?nm ; c:c_acctbal ?ab .
      BIND(UCASE(?nm) AS ?up)
      BIND(?ab * 2 AS ?bal2)
      BIND(STRLEN(?nm) AS ?nlen)
      FILTER(CONTAINS(?nm, "1") || STRSTARTS(?nm, "Customer"))
    }
    """,
    [("ckey", "long"), ("up", "str"), ("bal2", "double"), ("nlen", "long")],
    """
    SELECT c_custkey AS ckey, UPPER(c_name) AS up, c_acctbal * 2 AS bal2,
           CAST(LENGTH(c_name) AS BIGINT) AS nlen
    FROM customer
    WHERE CONTAINS(c_name, '1') OR STARTS_WITH(c_name, 'Customer')
    """,
)

# ---------------------------------------------------------------------------
# §2.4 MIN/MAX/SAMPLE-style per-group extremes + HAVING
# ---------------------------------------------------------------------------

_q(
    "q_group_minmax_having",
    """
    SELECT ?nname (MIN(?cname) AS ?first_c) (MAX(?ab) AS ?max_bal)
           (COUNT(*) AS ?n)
    WHERE {
      ?cust c:c_nationkey ?nat ; c:c_name ?cname ; c:c_acctbal ?ab .
      ?nat n:n_name ?nname .
    }
    GROUP BY ?nname
    HAVING (COUNT(*) >= 2)
    """,
    [("nname", "str"), ("first_c", "str"), ("max_bal", "double"), ("n", "long")],
    """
    SELECT n_name AS nname, MIN(c_name) AS first_c, MAX(c_acctbal) AS max_bal,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name HAVING COUNT(*) >= 2
    """,
)

# ---------------------------------------------------------------------------
# events table — timestamp filter + datetime accessors
# ---------------------------------------------------------------------------

_q(
    "q_events_by_type",
    """
    SELECT ?etype (COUNT(*) AS ?n)
           (xsd:double(SUM(xsd:decimal(?val))) AS ?total)
    WHERE {
      ?ev e:event_type ?etype ; e:value ?val ; e:ts ?ts .
      FILTER(YEAR(?ts) >= 2024)
    }
    GROUP BY ?etype
    """,
    [("etype", "str"), ("n", "long"), ("total", "double")],
    f"""
    SELECT event_type AS etype, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(CAST(SUM({_dec('value')}) AS VARCHAR) AS DOUBLE) AS total
    FROM events WHERE YEAR(ts) >= 2024
    GROUP BY event_type
    """,
)

# ---------------------------------------------------------------------------
# §2.10 CONSTRUCT — graph result, oracle rebuilds the triples relationally
# ---------------------------------------------------------------------------


def _run_construct(spark: SparkSession, sf_dir: str) -> DataFrame:
    store = get_graph(spark, sf_dir)
    res = store.query(PROLOGUE + """
      CONSTRUCT { ?cust <x:hasOrder> ?ord }
      WHERE { ?ord o:o_custkey ?cust }
    """)
    return res.df.select(
        F.col("subject")["v"].alias("s"),
        F.col("predicate")["v"].alias("p"),
        F.col("object")["v"].alias("o"),
    )


CONSTRUCT_ORACLE = """
SELECT DISTINCT 'x:c:' || CAST(o_custkey AS VARCHAR) AS s,
       'x:hasOrder' AS p,
       'x:o:' || CAST(o_orderkey AS VARCHAR) AS o
FROM orders
"""

# ---------------------------------------------------------------------------
# §2.3 subquery (nested SELECT with aggregation) — BSBM BI shape
# ---------------------------------------------------------------------------

_q(
    "q_subquery_avg_per_nation",
    """
    SELECT ?nname ?avg_bal WHERE {
      ?nat n:n_name ?nname .
      {
        SELECT ?nat (xsd:double(SUM(xsd:decimal(?ab))) / COUNT(?ab) AS ?avg_bal)
        WHERE { ?cust c:c_nationkey ?nat ; c:c_acctbal ?ab }
        GROUP BY ?nat
      }
    }
    """,
    [("nname", "str"), ("avg_bal", "double")],
    f"""
    SELECT n_name AS nname,
           CAST(CAST(SUM({_dec('c_acctbal')}) AS VARCHAR) AS DOUBLE) / COUNT(c_acctbal) AS avg_bal
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, spec in SPECS.items():
        out[name] = (lambda sp: (lambda spark, sf: sp.run(spark, sf)))(spec)
    out["q_construct_triples"] = _run_construct
    return out


def oracle_sql() -> dict[str, str]:
    out = {name: spec.oracle for name, spec in SPECS.items()
           if spec.oracle is not None}
    out["q_construct_triples"] = CONSTRUCT_ORACLE
    return out
