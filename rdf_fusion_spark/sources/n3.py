"""Notation3 (N3) reader/writer — protocol-parity format entry.

The reference negotiates `text/n3` on every RDF endpoint
(lib/web/src/repositories/content_negotiation.rs:28, service description
lib/web/src/repositories/service_description.rs:114) but its web layer
only ever round-trips RDF GRAPHS — formulas, rules and quantifiers never
appear in what it serves. This module mirrors that surface: the
Turtle-expressible subset of N3 (every Turtle document is valid N3, and
every graph the engine serializes is emitted in that subset), with the
N3-only constructs rejected by a clear error instead of a parse
failure."""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..terms import Term

# N3-only syntax the Turtle subset cannot express: formulas, implication
# and equality shorthands, universal/existential quantifiers, ! / ^ paths
_N3_ONLY = [
    (re.compile(r"(^|\s)\{"), "formula ({ ... })"),
    (re.compile(r"=>"), "implication (=>)"),
    (re.compile(r"<="), "reverse implication (<=)"),
    (re.compile(r"(^|\s)=(\s|$)"), "equality shorthand (=)"),
    (re.compile(r"@forAll\b"), "@forAll quantifier"),
    (re.compile(r"@forSome\b"), "@forSome quantifier"),
    (re.compile(r"@keywords\b"), "@keywords directive"),
]


def _strip_atoms(text: str) -> str:
    """Remove string literals, IRIs and comments so _N3_ONLY markers are
    only matched in actual syntax positions."""
    text = re.sub(r'""".*?"""|\'\'\'.*?\'\'\'', '""', text, flags=re.S)
    text = re.sub(r'"(?:[^"\\]|\\.)*"|\'(?:[^\'\\]|\\.)*\'', '""', text)
    # IRI spans must not cross whitespace or formula braces: a greedy
    # <[^>]*> would swallow N3-only tokens like '<=' (or a '{' between a
    # stray '<' and a later '>') into a fake IRI and the _N3_ONLY
    # rejection below would miss them (round-5 ADVICE)
    text = re.sub(r"<[^<>\s{}]*>", "<>", text)
    text = re.sub(r"#[^\n]*", "", text)
    return text


def parse_n3(text: str, base: Optional[str] = None
             ) -> list[tuple[Term, Term, Term]]:
    """N3 document (Turtle-expressible subset) → triples."""
    stripped = _strip_atoms(text)
    for rx, what in _N3_ONLY:
        if rx.search(stripped):
            raise NotImplementedError(
                f"N3 {what} is outside the Turtle-expressible subset this "
                "engine accepts (the reference's web layer serves only "
                "RDF graphs; see sources/n3.py)")
    from .turtle import parse_turtle
    return parse_turtle(text, base)


def read_n3(spark: SparkSession, path: str,
            base: Optional[str] = None) -> DataFrame:
    """N3 file → quads DataFrame (default graph)."""
    from ..store import GraphStore
    from .docio import read_doc
    triples = parse_n3(read_doc(path), base or f"file://{path}")
    return GraphStore.from_python_quads(
        spark, [(None, s, p, o) for s, p, o in triples]).quads
