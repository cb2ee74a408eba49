"""Turtle reader (RDF 1.1 Turtle, the subset the W3C/oxigraph test
suites and typical datasets use).

Parsing happens DRIVER-SIDE: Turtle is a hand-authored interchange format
(manifests, fixtures, small ontologies), never the bulk format — large
graphs arrive as N-Triples (line-parallel, sources/ntriples.py) or
parquet. A recursive-descent parser into Python terms keeps the grammar
complete (nested bnode property lists, collections, multi-line strings)
where a regex line-parser cannot be.

reference: lib/rdf-fusion/src/store.rs:477-558 (load_from_reader accepts
Turtle via oxttl); the grammar here is from the public Turtle 1.1 spec.

Supported: @prefix/@base (+ SPARQL-style PREFIX/BASE), IRIs, prefixed
names, `a`, blank nodes (labelled and [...]), collections, numeric /
boolean / string literals (all four quote forms, escapes), @lang, ^^dt,
predicate-object and object lists.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..terms import (
    RDF_NS,
    XSD_BOOLEAN,
    XSD_DECIMAL,
    XSD_DOUBLE,
    XSD_INTEGER,
    BlankNode,
    Literal,
    NamedNode,
    Term,
)

RDF_FIRST = RDF_NS + "first"
RDF_REST = RDF_NS + "rest"
RDF_NIL = RDF_NS + "nil"

_STRING_ESCAPES = {
    "t": "\t", "b": "\b", "n": "\n", "r": "\r", "f": "\f",
    '"': '"', "'": "'", "\\": "\\",
}

# BCP 47 well-formedness (subtag length bounds): RDF requires language
# tags to be well-formed; a 14-char primary subtag is a syntax error
_BCP47_RE = re.compile(r"^[A-Za-z]{1,8}(-[A-Za-z0-9]{1,8})*$")

_LONG_STRING_RE = re.compile(
    r"\"\"\"(?:[^\"\\]|\\.|\"(?!\"\"))*\"\"\""
    r"|'''(?:[^'\\]|\\.|'(?!''))*'''")

# longest-match token alternatives, tried in order
_TOKEN_RE = re.compile(r"""
    (?P<ws>\s+|\#[^\n]*)
  | (?P<iri><(?:[^<>"{}|^`\\\x00-\x20]|\\u[0-9A-Fa-f]{4}|\\U[0-9A-Fa-f]{8})*>)
  | (?P<string>\"\"\"(?:[^"\\]|\\.|\"(?!\"\"))*\"\"\"
       |'''(?:[^'\\]|\\.|'(?!''))*'''
       |"(?:[^"\\\n]|\\.)*"
       |'(?:[^'\\\n]|\\.)*')
  | (?P<directive>@prefix\b|@base\b)
  | (?P<langtag>@[a-zA-Z]+(?:-[a-zA-Z0-9]+)*)
  | (?P<double>[+-]?(?:\d+\.\d*|\.\d+|\d+)[eE][+-]?\d+)
  | (?P<decimal>[+-]?\d*\.\d+)
  | (?P<integer>[+-]?\d+)
  | (?P<punct>\^\^|;|,|\.|\[|\]|\(|\)|\{|\})
  | (?P<bnode>_:[A-Za-z0-9_](?:[A-Za-z0-9_.-]*[A-Za-z0-9_-])?)
  | (?P<pname>[A-Za-z0-9_][A-Za-z0-9_.-]*?:(?:(?:\\.|[A-Za-z0-9_:%.-])*(?:\\.|[A-Za-z0-9_:%-]))?
       |:(?:(?:\\.|[A-Za-z0-9_:%.-])*(?:\\.|[A-Za-z0-9_:%-]))?)
  | (?P<kw>@prefix|@base|(?i:PREFIX|BASE)\b|a\b|true\b|false\b)
  | (?P<word>[A-Za-z][A-Za-z0-9_-]*)
""", re.VERBOSE)


def _hex_cp(s: str, width: int) -> int:
    # int(x, 16) accepts "+1f4" / " 1f4" — the grammar does not
    if len(s) != width or not re.fullmatch(r"[0-9A-Fa-f]+", s):
        raise TurtleParseError(f"invalid unicode escape digits {s!r}")
    return int(s, 16)


def _safe_chr(cp: int) -> str:
    if cp > 0x10FFFF:
        raise TurtleParseError(f"unicode escape out of range: {cp:#x}")
    return chr(cp)


def _unescape_string(body: str) -> str:
    out = []
    i = 0
    while i < len(body):
        ch = body[i]
        if ch != "\\":
            out.append(ch)
            i += 1
            continue
        nxt = body[i + 1]
        if nxt == "u":
            out.append(_safe_chr(_hex_cp(body[i + 2:i + 6], 4)))
            i += 6
        elif nxt == "U":
            out.append(_safe_chr(_hex_cp(body[i + 2:i + 10], 8)))
            i += 10
        else:
            if nxt not in _STRING_ESCAPES:
                raise TurtleParseError(f"invalid string escape \\{nxt}")
            out.append(_STRING_ESCAPES[nxt])
            i += 2
    return "".join(out)


_URI_SPLIT_RE = re.compile(
    r"^(?:([A-Za-z][A-Za-z0-9+.-]*):)?(?://([^/?#]*))?"
    r"([^?#]*)(?:\?([^#]*))?(?:#(.*))?$", re.DOTALL)


def _remove_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4."""
    out: list[str] = []
    inp = path
    while inp:
        if inp.startswith("../"):
            inp = inp[3:]
        elif inp.startswith("./"):
            inp = inp[2:]
        elif inp.startswith("/./"):
            inp = "/" + inp[3:]
        elif inp == "/.":
            inp = "/"
        elif inp.startswith("/../"):
            inp = "/" + inp[4:]
            if out:
                out.pop()
        elif inp == "/..":
            inp = "/"
            if out:
                out.pop()
        elif inp in (".", ".."):
            inp = ""
        else:
            m = re.match(r"^/?[^/]*", inp)
            out.append(m.group(0))
            inp = inp[m.end():]
    return "".join(out)


def _rfc3986_resolve(base: str, ref: str) -> str:
    """RFC 3986 §5.2 reference resolution (spec-literal transform;
    the serd good suite's test-uri exercises 48 edge cases of this)."""
    rs, ra, rp, rq, rf = _URI_SPLIT_RE.match(ref).groups()
    bs, ba, bp, bq, _ = _URI_SPLIT_RE.match(base).groups()
    if rs is not None:
        ts, ta, tp, tq = rs, ra, _remove_dot_segments(rp), rq
    elif ra is not None:
        ts, ta, tp, tq = bs, ra, _remove_dot_segments(rp), rq
    elif rp == "":
        ts, ta, tp = bs, ba, bp
        tq = rq if rq is not None else bq
    else:
        if rp.startswith("/"):
            tp = _remove_dot_segments(rp)
        else:
            if ba is not None and bp == "":
                merged = "/" + rp
            elif "/" in bp:
                merged = bp[:bp.rfind("/") + 1] + rp
            else:
                merged = rp
            tp = _remove_dot_segments(merged)
        ts, ta, tq = bs, ba, rq
    out = []
    if ts is not None:
        out.append(ts + ":")
    if ta is not None:
        out.append("//" + ta)
    out.append(tp)
    if tq is not None:
        out.append("?" + tq)
    if rf is not None:
        out.append("#" + rf)
    return "".join(out)


def _unescape_iri(s: str) -> str:
    if "\\" not in s:
        return s
    return re.sub(
        r"\\u([0-9A-Fa-f]{4})|\\U([0-9A-Fa-f]{8})",
        lambda m: chr(int(m.group(1) or m.group(2), 16)), s)


class TurtleParseError(ValueError):
    pass


class _Parser:
    def __init__(self, text: str, base: Optional[str] = None):
        self.text = text.lstrip("﻿")
        self.pos = 0
        self.base = base or ""
        self.prefixes: dict[str, str] = {}
        self.triples: list[tuple[Term, Term, Term]] = []
        self._bnode_n = 0
        self._tok: Optional[tuple[str, str]] = None  # (kind, value) lookahead

    # -- tokenizer --------------------------------------------------------

    def _next_token(self) -> Optional[tuple[str, str]]:
        while self.pos < len(self.text):
            # longest-match rule: text opening with a long-quote delimiter
            # MUST tokenize as a long literal — without this, `""""` would
            # backtrack into two empty short strings and parse "validly"
            head = self.text[self.pos:self.pos + 3]
            if head in ('"""', "'''"):
                m = _LONG_STRING_RE.match(self.text, self.pos)
                if m is None:
                    raise TurtleParseError(
                        f"unterminated long string literal at "
                        f"{self.text[self.pos:self.pos + 40]!r}")
                self.pos = m.end()
                return "string", m.group()
            m = _TOKEN_RE.match(self.text, self.pos)
            if m is None:
                raise TurtleParseError(
                    f"bad syntax at {self.text[self.pos:self.pos + 40]!r}")
            self.pos = m.end()
            kind = m.lastgroup
            if kind == "ws":
                continue
            return kind, m.group()
        return None

    def peek(self) -> Optional[tuple[str, str]]:
        if self._tok is None:
            self._tok = self._next_token()
        return self._tok

    def take(self) -> Optional[tuple[str, str]]:
        t = self.peek()
        self._tok = None
        return t

    def expect(self, value: str) -> None:
        t = self.take()
        if t is None or t[1] != value:
            raise TurtleParseError(f"expected {value!r}, got {t!r}")

    # -- grammar ----------------------------------------------------------

    def parse(self) -> list[tuple[Term, Term, Term]]:
        while self.peek() is not None:
            self._statement()
        return self.triples

    def _statement(self) -> None:
        kind, val = self.peek()
        if kind == "directive" or \
           (kind in ("kw", "word") and val.upper() in ("PREFIX", "BASE")):
            self.take()
            directive = val.lstrip("@").upper()
            if directive == "PREFIX":
                pk, pv = self.take()
                if pk != "pname" or not pv.endswith(":"):
                    raise TurtleParseError(f"bad prefix name {pv!r}")
                ik, iv = self.take()
                if ik != "iri":
                    raise TurtleParseError(f"bad prefix IRI {iv!r}")
                self.prefixes[pv[:-1]] = self._resolve(iv[1:-1])
            else:
                ik, iv = self.take()
                if ik != "iri":
                    raise TurtleParseError(f"bad base IRI {iv!r}")
                self.base = self._resolve(iv[1:-1])
            if val.startswith("@"):
                self.expect(".")
            return
        t = self.peek()
        was_bnode_list = t is not None and t[1] == "["
        subj = self._subject()
        t = self.peek()
        if was_bnode_list and t is not None and t[1] == ".":
            self.take()  # '[ ... ] .' — property list IS the statement
            return
        self._predicate_object_list(subj)
        self.expect(".")

    def _resolve(self, iri: str) -> str:
        iri = _unescape_iri(iri)
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return iri  # absolute
        return _rfc3986_resolve(self.base, iri)

    def _fresh_bnode(self) -> BlankNode:
        self._bnode_n += 1
        return BlankNode(f"tb{self._bnode_n}")

    def _subject(self) -> Term:
        kind, val = self.peek()
        if kind == "iri" or kind == "pname":
            return self._iri_like()
        if kind == "bnode":
            self.take()
            return BlankNode(val[2:])
        if val == "[":
            return self._bnode_property_list()
        if val == "(":
            return self._collection()
        raise TurtleParseError(f"bad subject {val!r}")

    def _iri_like(self) -> NamedNode:
        kind, val = self.take()
        if kind == "iri":
            return NamedNode(self._resolve(val[1:-1]))
        pfx, _, local = val.partition(":")
        if pfx not in self.prefixes:
            raise TurtleParseError(f"undefined prefix {pfx!r}:")
        local = re.sub(r"\\(.)", r"\1", local)  # PN_LOCAL_ESC
        return NamedNode(self.prefixes[pfx] + local)

    def _predicate(self) -> NamedNode:
        kind, val = self.peek()
        if kind == "kw" and val == "a":
            self.take()
            return NamedNode(RDF_NS + "type")
        if kind in ("iri", "pname"):
            return self._iri_like()
        raise TurtleParseError(f"bad predicate {val!r}")

    def _predicate_object_list(self, subj: Term) -> None:
        while True:
            pred = self._predicate()
            while True:
                obj = self._object()
                self.triples.append((subj, pred, obj))
                t = self.peek()
                if t is not None and t[1] == ",":
                    self.take()
                    continue
                break
            t = self.peek()
            if t is not None and t[1] == ";":
                self.take()
                # allow trailing ';' before '.' / ']'
                t = self.peek()
                if t is not None and t[1] in (".", "]"):
                    return
                continue
            return

    def _object(self) -> Term:
        kind, val = self.peek()
        if kind in ("iri", "pname"):
            return self._iri_like()
        if kind == "bnode":
            self.take()
            return BlankNode(val[2:])
        if kind == "string":
            return self._literal()
        if kind == "integer":
            self.take()
            return Literal(val, XSD_INTEGER)
        if kind == "decimal":
            self.take()
            return Literal(val, XSD_DECIMAL)
        if kind == "double":
            self.take()
            return Literal(val, XSD_DOUBLE)
        if kind == "kw" and val in ("true", "false"):
            self.take()
            return Literal(val, XSD_BOOLEAN)
        if val == "[":
            return self._bnode_property_list()
        if val == "(":
            return self._collection()
        raise TurtleParseError(f"bad object {val!r}")

    def _literal(self) -> Literal:
        _, val = self.take()
        for q in ('"""', "'''", '"', "'"):
            if val.startswith(q):
                body = val[len(q):-len(q)]
                break
        lex = _unescape_string(body)
        t = self.peek()
        # `@base` / `@prefix` directly after a string are language tags,
        # not directives (the tokenizer can't know; the grammar can)
        if t is not None and (t[0] == "langtag" or (
                t[0] == "directive" and t[1] in ("@base", "@prefix"))):
            self.take()
            lang = t[1][1:]
            if not _BCP47_RE.match(lang):
                raise TurtleParseError(f"ill-formed language tag @{lang}")
            return Literal(lex, language=lang)
        if t is not None and t[1] == "^^":
            self.take()
            return Literal(lex, self._iri_like().iri)
        return Literal(lex)

    def _bnode_property_list(self) -> BlankNode:
        self.expect("[")
        node = self._fresh_bnode()
        t = self.peek()
        if t is not None and t[1] != "]":
            self._predicate_object_list(node)
        self.expect("]")
        return node

    def _collection(self) -> Term:
        self.expect("(")
        items = []
        while True:
            t = self.peek()
            if t is None:
                raise TurtleParseError("unterminated collection")
            if t[1] == ")":
                self.take()
                break
            items.append(self._object())
        if not items:
            return NamedNode(RDF_NIL)
        head = self._fresh_bnode()
        first = NamedNode(RDF_FIRST)
        rest = NamedNode(RDF_REST)
        node = head
        for i, item in enumerate(items):
            self.triples.append((node, first, item))
            if i + 1 < len(items):
                nxt = self._fresh_bnode()
                self.triples.append((node, rest, nxt))
                node = nxt
            else:
                self.triples.append((node, rest, NamedNode(RDF_NIL)))
        return head


def parse_turtle(text: str, base: Optional[str] = None
                 ) -> list[tuple[Term, Term, Term]]:
    """Turtle document → list of (subject, predicate, object) triples."""
    return _Parser(text, base).parse()


from .docio import read_doc as _read_doc


def read_turtle(spark: SparkSession, path: str,
                base: Optional[str] = None) -> DataFrame:
    """Turtle file → quads DataFrame (default graph)."""
    from ..store import GraphStore
    triples = parse_turtle(_read_doc(path), base or f"file://{path}")
    return GraphStore.from_python_quads(
        spark, [(None, s, p, o) for s, p, o in triples]).quads


# ---------------------------------------------------------------------------
# Turtle WRITER: prefix-compressed, subject-grouped, `a` shorthand
# (reference dumps any oxrdfio format, lib/rdf-fusion/src/store.rs:586-657;
# round 3 only emitted N-Triples-as-Turtle). The per-subject grouping and
# prefix compression are Column expressions over two hash aggregations —
# distributed; only the final header+body concat is single-partition
# (Turtle is a document format; bulk dumps use the line formats).
# ---------------------------------------------------------------------------

_PN_LOCAL_RE = "^[A-Za-z_][A-Za-z0-9_-]*$"


_NS_SAMPLE_LIMIT = 100_000


def _top_namespaces(triples: DataFrame, max_prefixes: int) -> dict:
    """Most frequent IRI namespaces (up to the last # or /) across
    s/p/o, assigned deterministic prefixes ns1..nsN.

    Counted over a bounded SAMPLE (first 100k triples): prefix choice
    only affects compression, never correctness, so the plan-build-time
    aggregation must not scale with the corpus — before this cap every
    Turtle serialization (each HTTP content-negotiation response) paid a
    full 3-way corpus scan."""
    from pyspark.sql import functions as F

    sample = triples.limit(_NS_SAMPLE_LIMIT)

    def ns_col(name: str) -> DataFrame:
        c = F.col(name)
        return (sample.where(c["t"] == 0)
                .select(F.regexp_extract(c["v"], r"^(.*[#/])[^#/]*$", 1)
                        .alias("ns")))

    freq = (ns_col("subject")
            .unionAll(ns_col("predicate"))
            .unionAll(ns_col("object"))
            .where(F.col("ns") != "")
            .groupBy("ns").count()
            .orderBy(F.desc("count"), F.asc("ns"))
            .limit(max_prefixes).collect())
    return {f"ns{i + 1}": r["ns"] for i, r in enumerate(freq)}


def quads_to_turtle_lines(quads: DataFrame, max_prefixes: int = 8) -> DataFrame:
    """Triples → Turtle document rows: @prefix header + one row per
    subject (`s p1 o1, o2 ; p2 o3 .`, rdf:type as `a`). Graph column is
    ignored (Turtle has no graphs — callers pre-filter)."""
    from pyspark.sql import functions as F

    from ..terms import RDF_TYPE, TT_IRI
    from .ntriples import format_term

    triples = quads.select("subject", "predicate", "object")
    prefixes = _top_namespaces(triples, max_prefixes)
    # longest namespace first so the maximal prefix wins
    ordered = sorted(prefixes.items(), key=lambda kv: -len(kv[1]))

    def fmt(c, is_pred: bool = False):
        out = format_term(c)
        for pfx, ns in ordered:
            local = F.substring(c["v"], len(ns) + 1, 1 << 30)
            cond = ((c["t"] == TT_IRI) & c["v"].startswith(ns)
                    & F.regexp_like(local, F.lit(_PN_LOCAL_RE)))
            out = F.when(cond, F.concat(F.lit(pfx + ":"), local)) \
                .otherwise(out)
        if is_pred:
            out = F.when((c["t"] == TT_IRI) & (c["v"] == RDF_TYPE),
                         F.lit("a")).otherwise(out)
        return out

    # object-list grouping (s p o1, o2), then predicate grouping (s p ; q)
    by_sp = (triples.groupBy(
        fmt(F.col("subject")).alias("s"),
        fmt(F.col("predicate"), is_pred=True).alias("p"))
        .agg(F.concat_ws(", ", F.array_sort(
            F.collect_list(fmt(F.col("object"))))).alias("os")))
    by_s = (by_sp.groupBy("s")
            .agg(F.concat_ws(" ; ", F.array_sort(F.collect_list(
                F.concat(F.col("p"), F.lit(" "), F.col("os"))))).alias("pos")))
    body = by_s.select(
        F.concat(F.col("s"), F.lit(" "), F.col("pos"), F.lit(" .")).alias("line"))

    spark = quads.sparkSession
    head_rows = [(f"@prefix {pfx}: <{ns}> .",)
                 for pfx, ns in sorted(prefixes.items())]
    if not head_rows:
        return body
    head = spark.createDataFrame(head_rows, "line string")
    # explicit document ordering: union partition order is NOT stable
    # through the groupBy shuffle, and @prefix must precede first use
    from pyspark.sql import functions as F
    return (head.withColumn("__ord", F.lit(0))
            .unionByName(body.withColumn("__ord", F.lit(1)))
            .orderBy("__ord", "line").select("line").coalesce(1))
