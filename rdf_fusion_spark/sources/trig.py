"""TriG reader (RDF 1.1 TriG): Turtle plus GRAPH blocks.

Extends the recursive-descent Turtle parser (turtle.py) with the TriG block
grammar — `GRAPH <g> { ... }`, `<g> { ... }`, bare `{ ... }` (default graph)
and plain Turtle statements. Blank node labels are document-scoped, so one
parser instance covers all graphs.

reference: lib/rdf-fusion/src/store.rs:477-558 (load_from_reader accepts
TriG via oxttl); the grammar here is from the public TriG 1.1 spec.
Driver-side parse like Turtle: TriG is an interchange format for
hand-authored multi-graph fixtures, never the bulk path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..terms import BlankNode, NamedNode, Term
from .turtle import TurtleParseError, _Parser


class _TrigParser(_Parser):
    def __init__(self, text: str, base: Optional[str] = None):
        super().__init__(text, base)
        self.quads: list[tuple[Optional[Term], Term, Term, Term]] = []

    def parse_quads(self):
        while self.peek() is not None:
            self._block()
        return self.quads

    def _drain(self, mark: int, graph: Optional[Term]) -> None:
        """Move triples emitted since `mark` into quads under `graph`."""
        for s, p, o in self.triples[mark:]:
            self.quads.append((graph, s, p, o))
        del self.triples[mark:]

    def _block(self) -> None:
        kind, val = self.peek()
        if kind == "directive" or \
                (kind in ("kw", "word") and val.upper() in ("PREFIX", "BASE")):
            self._statement()
            return
        if kind == "word" and val.upper() == "GRAPH":
            self.take()
            label = self._label_or_subject()
            self._wrapped_graph(label)
            return
        if val == "{":
            self._wrapped_graph(None)
            return
        if kind in ("iri", "pname", "bnode"):
            # triplesOrGraph: label followed by '{' names a graph, anything
            # else is a Turtle triples statement in the default graph
            subj = self._subject()
            t = self.peek()
            if t is not None and t[1] == "{":
                self._wrapped_graph(subj)
                return
            mark = len(self.triples)
            self._predicate_object_list(subj)
            self.expect(".")
            self._drain(mark, None)
            return
        # remaining Turtle statement forms ('[...]', '(...)') — default graph
        mark = len(self.triples)
        self._statement()
        self._drain(mark, None)

    def _label_or_subject(self) -> Term:
        kind, val = self.peek()
        if kind in ("iri", "pname"):
            return self._iri_like()
        if kind == "bnode":
            self.take()
            return BlankNode(val[2:])
        raise TurtleParseError(f"bad graph label {val!r}")

    def _wrapped_graph(self, graph: Optional[Term]) -> None:
        self.expect("{")
        mark = len(self.triples)
        while True:
            t = self.peek()
            if t is None:
                raise TurtleParseError("unterminated graph block")
            if t[1] == "}":
                self.take()
                break
            subj = self._subject()
            self._predicate_object_list(subj)
            t = self.peek()
            if t is not None and t[1] == ".":
                self.take()
            elif t is None or t[1] != "}":
                raise TurtleParseError(f"expected '.' or '}}', got {t!r}")
        self._drain(mark, graph)


def parse_trig(text: str, base: Optional[str] = None
               ) -> list[tuple[Optional[Term], Term, Term, Term]]:
    """TriG document → list of (graph-or-None, s, p, o) quads."""
    return _TrigParser(text, base).parse_quads()


from .docio import read_doc as _read_doc


def read_trig(spark: SparkSession, path: str,
              base: Optional[str] = None) -> DataFrame:
    """TriG file → quads DataFrame (graph NULL for the default graph)."""
    from ..store import GraphStore
    quads = parse_trig(_read_doc(path), base or f"file://{path}")
    return GraphStore.from_python_quads(spark, quads).quads
