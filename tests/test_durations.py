"""xsd:duration value model: parse/format round trips and engine
semantics (arithmetic, comparison, casts).
reference: lib/model/src/xsd/duration.rs."""

import pytest

from rdf_fusion_spark.store import GraphStore
from rdf_fusion_spark.terms import (
    XSD_DATETIME,
    Literal,
    NamedNode,
    format_duration,
    parse_duration,
    term_to_python,
)

PARSE_CASES = [
    ("P1Y", (12, 0)),
    ("P1Y2M3DT4H5M6.5S", (14, 3 * 86400 + 4 * 3600 + 5 * 60 + 6.5)),
    ("-P1M", (-1, 0)),
    ("PT0S", (0, 0)),
    ("P3D", (0, 3 * 86400)),
    ("PT90M", (0, 5400)),
]

INVALID = ["P", "PT", "1Y", "P1S", "P-1Y", "PT1Y", ""]


@pytest.mark.parametrize("lex,expected", PARSE_CASES)
def test_parse(lex, expected):
    got = parse_duration(lex)
    assert got is not None
    assert (got[0], float(got[1])) == expected


@pytest.mark.parametrize("lex", INVALID)
def test_parse_invalid(lex):
    assert parse_duration(lex) is None


@pytest.mark.parametrize("months,secs,lex", [
    (14, 0, "P1Y2M"),
    (0, 90061.5, "P1DT1H1M1.5S"),
    (0, 0, "PT0S"),
    (-12, 0, "-P1Y"),
    (0, 5400, "PT1H30M"),
])
def test_format(months, secs, lex):
    assert format_duration(months, secs) == lex


QUERY = """
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
SELECT {select} WHERE {{
  ?s <http://e/p> ?ts .
  {binds}
}}
"""


def _run(spark, binds, select):
    st = GraphStore.from_python_quads(spark, [
        (None, NamedNode("http://e/x"), NamedNode("http://e/p"),
         Literal("2024-01-31T10:00:00", XSD_DATETIME))])
    res = st.query(QUERY.format(select=select, binds=binds))
    row = res.df.collect()[0]
    return {v: term_to_python(row[v]) for v in res.variables}


def test_datetime_plus_duration_clamps(spark):
    out = _run(spark, 'BIND(?ts + "P1M"^^xsd:duration AS ?r)', "?r")
    assert out["r"].lexical == "2024-02-29T10:00:00"  # leap-year clamp


def test_datetime_minus_datetime(spark):
    out = _run(
        spark,
        'BIND(STR(("2024-03-01T00:00:00"^^xsd:dateTime - ?ts)) AS ?r)', "?r")
    assert out["r"].lexical == "P29DT14H"


def test_duration_indeterminate_comparison_is_error(spark):
    # P1M vs P30D: between 28 and 31 days — indeterminate, BIND -> unbound
    out = _run(
        spark,
        'BIND(("P1M"^^xsd:duration < "P30D"^^xsd:duration) AS ?r)', "?r")
    assert out["r"] is None


def test_duration_determinate_cross_family(spark):
    out = _run(
        spark,
        'BIND(("P1M"^^xsd:duration < "P32D"^^xsd:duration) AS ?r)', "?r")
    assert out["r"].lexical == "true"


def test_daytime_cast_drops_months(spark):
    out = _run(
        spark,
        'BIND(STR(xsd:dayTimeDuration("P1Y2M3DT4H"^^xsd:duration)) AS ?r)',
        "?r")
    assert out["r"].lexical == "P3DT4H"
