"""W3C-style SPARQL test-suite harness: manifest loader + evaluator.

Mirrors the reference's primary test strategy — manifest-driven
conformance tests (reference: testsuite/src/manifest.rs +
testsuite/src/sparql_evaluator.rs) — over the same public manifest
vocabulary (mf:/qt:). Run against the suites bundled with the reference
(testsuite/oxigraph-tests/sparql, testsuite/rdf-fusion-tests/sparql).

Result comparison follows the W3C rules: SELECT results compare as
bags of bindings, graphs compare as sets of triples, and blank nodes
match under some bijection (found by backtracking — result sets are
small by construction).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

from ..terms import BlankNode, Literal, NamedNode, Term, term_to_python
from .vocab import MF, QT, RDF, RDFS, UT

SRX_NS = "{http://www.w3.org/2005/sparql-results#}"


# ---------------------------------------------------------------------------
# manifest loading
# ---------------------------------------------------------------------------

@dataclass
class TestCase:
    id: str
    type: str                      # local name, e.g. QueryEvaluationTest
    name: str
    query: Optional[str] = None    # file path
    data: list[str] = field(default_factory=list)
    graph_data: list[str] = field(default_factory=list)
    result: Optional[str] = None   # file path
    # UpdateEvaluationTest (ut: vocabulary): pre-state named graphs carry
    # explicit labels, and the expectation is a full dataset (default +
    # labeled named graphs) rather than a single result document
    graph_labels: dict = field(default_factory=dict)   # path -> graph IRI
    result_data: list[str] = field(default_factory=list)
    result_graph_data: list[tuple] = field(default_factory=list)  # (path, IRI)


class _Graph:
    """Tiny in-memory triple index for walking a parsed manifest."""

    def __init__(self, triples: list[tuple[Term, Term, Term]]):
        self.spo: dict[tuple, list[Term]] = {}
        for s, p, o in triples:
            self.spo.setdefault((s, p.iri), []).append(o)

    def obj(self, s: Term, p: str) -> Optional[Term]:
        vals = self.spo.get((s, p))
        return vals[0] if vals else None

    def objs(self, s: Term, p: str) -> list[Term]:
        return self.spo.get((s, p), [])

    def rdf_list(self, head: Optional[Term]) -> list[Term]:
        out = []
        while head is not None and not (
                isinstance(head, NamedNode) and head.iri == RDF + "nil"):
            first = self.obj(head, RDF + "first")
            if first is not None:
                out.append(first)
            head = self.obj(head, RDF + "rest")
        return out


def _to_path(term: Term, base_dir: Path) -> str:
    assert isinstance(term, NamedNode), term
    iri = term.iri
    if iri.startswith("file://"):
        return iri[len("file://"):]
    return str(base_dir / iri)


def _load_update_parts(g: "_Graph", node: Optional[Term], base_dir: Path,
                       case: TestCase, pre: bool) -> None:
    """Walk a ut: action/result node (SPARQL 1.1 update-evaluation
    vocabulary): ut:request, ut:data, and ut:graphData — the latter either
    a direct file reference or [ ut:graph <file> ; rdfs:label "iri" ]."""
    if node is None:
        return
    req = g.obj(node, UT + "request")
    if pre and req is not None:
        case.query = _to_path(req, base_dir)
    data = [_to_path(d, base_dir) for d in g.objs(node, UT + "data")]
    named: list[tuple] = []
    for gd in g.objs(node, UT + "graphData"):
        if isinstance(gd, NamedNode):
            path = _to_path(gd, base_dir)
            named.append((path, f"file://{path}"))
            continue
        f = g.obj(gd, UT + "graph")
        label = g.obj(gd, RDFS + "label")
        if f is None:
            continue
        path = _to_path(f, base_dir)
        iri = label.lexical if isinstance(label, Literal) else f"file://{path}"
        named.append((path, iri))
    if pre:
        case.data = data
        case.graph_data = [p for p, _ in named]
        case.graph_labels = {p: iri for p, iri in named}
    else:
        case.result_data = data
        case.result_graph_data = named


def load_manifest(path: str) -> list[TestCase]:
    """Parse a manifest.ttl (following mf:include) into test cases."""
    from ..sources.turtle import parse_turtle

    p = Path(path)
    base = f"file://{p}"
    g = _Graph(parse_turtle(p.read_text(encoding="utf-8"), base))
    cases: list[TestCase] = []

    manifest = NamedNode(base)
    for inc_head in g.objs(manifest, MF + "include"):
        for inc in g.rdf_list(inc_head):
            cases.extend(load_manifest(_to_path(inc, p.parent)))

    entries_head = g.obj(manifest, MF + "entries")
    for entry in g.rdf_list(entries_head):
        tnode = g.obj(entry, RDF + "type")
        ttype = tnode.iri.rsplit("#", 1)[-1] if isinstance(tnode, NamedNode) \
            else "?"
        name_t = g.obj(entry, MF + "name")
        case = TestCase(
            id=entry.iri if isinstance(entry, NamedNode) else str(entry),
            type=ttype,
            name=name_t.lexical if isinstance(name_t, Literal) else "",
        )
        action = g.obj(entry, MF + "action")
        if ttype == "UpdateEvaluationTest":
            _load_update_parts(g, action, p.parent, case, pre=True)
            result = g.obj(entry, MF + "result")
            if result is not None:
                _load_update_parts(g, result, p.parent, case, pre=False)
            cases.append(case)
            continue
        if isinstance(action, NamedNode) and g.obj(action, QT + "query") is None:
            # action is directly the query file (syntax tests)
            case.query = _to_path(action, p.parent)
        elif action is not None:
            q = g.obj(action, QT + "query")
            if q is not None:
                case.query = _to_path(q, p.parent)
            case.data = [_to_path(d, p.parent)
                         for d in g.objs(action, QT + "data")]
            case.graph_data = [_to_path(d, p.parent)
                               for d in g.objs(action, QT + "graphData")]
        result = g.obj(entry, MF + "result")
        if result is not None:
            case.result = _to_path(result, p.parent)
        cases.append(case)
    return cases


# ---------------------------------------------------------------------------
# expected-result parsing
# ---------------------------------------------------------------------------

def parse_srx(text: str):
    """SPARQL XML results → ('boolean', bool) | ('bindings', [dict])."""
    root = ET.fromstring(text)
    boolean = root.find(f"{SRX_NS}boolean")
    if boolean is not None:
        return ("boolean", boolean.text.strip() == "true")
    rows = []
    for result in root.iter(f"{SRX_NS}result"):
        row: dict[str, Term] = {}
        for b in result.findall(f"{SRX_NS}binding"):
            row[b.attrib["name"]] = _srx_term(b)
        rows.append(row)
    return ("bindings", rows)


def _srx_term(binding) -> Term:
    for child in binding:
        tag = child.tag.rsplit("}", 1)[-1]
        if tag == "uri":
            return NamedNode(child.text or "")
        if tag == "bnode":
            return BlankNode(child.text or "")
        if tag == "literal":
            lang = child.attrib.get(
                "{http://www.w3.org/XML/1998/namespace}lang")
            dt = child.attrib.get("datatype")
            if lang:
                return Literal(child.text or "", language=lang)
            if dt:
                return Literal(child.text or "", dt)
            return Literal(child.text or "")
    raise ValueError("empty binding")


# ---------------------------------------------------------------------------
# comparison under blank-node bijection
# ---------------------------------------------------------------------------

def _key(t: Optional[Term]):
    return ("b",) if isinstance(t, BlankNode) else (str(t),)


def _rows_match(got: dict, exp: dict, bij: dict) -> Optional[dict]:
    """Try to extend bijection so row `got` equals row `exp`; None if not."""
    if set(got) != set(exp):
        return None
    new = dict(bij)
    for var, gv in got.items():
        ev = exp[var]
        if isinstance(gv, BlankNode) and isinstance(ev, BlankNode):
            if gv.id in new:
                if new[gv.id] != ev.id:
                    return None
            elif ev.id in new.values():
                return None
            else:
                new[gv.id] = ev.id
        elif gv != ev:
            return None
    return new


def _has_bnode(row: dict) -> bool:
    return any(isinstance(v, BlankNode) for v in row.values())


def _bag_equal_rec(got: list[dict], exp: list[dict], bij: dict) -> bool:
    if not got:
        return True
    g0 = got[0]
    for i, e in enumerate(exp):
        new = _rows_match(g0, e, bij)
        if new is not None and _bag_equal_rec(
                got[1:], exp[:i] + exp[i + 1:], new):
            return True
    return False


def bag_equal(got: list[dict], exp: list[dict], bij: Optional[dict] = None
              ) -> bool:
    """Multiset equality of binding rows under some bnode bijection.

    Bnode-free rows are compared as plain multisets first; backtracking
    search runs only over the bnode-containing remainder (a 10,000-triple
    ground graph would otherwise blow the recursion limit)."""
    if bij is None:
        bij = {}
    if len(got) != len(exp):
        return False
    g_ground = [r for r in got if not _has_bnode(r)]
    e_ground = [r for r in exp if not _has_bnode(r)]
    if len(g_ground) != len(e_ground):
        return False

    def mkey(r):
        return tuple(sorted((k, str(v)) for k, v in r.items()))

    from collections import Counter
    if Counter(map(mkey, g_ground)) != Counter(map(mkey, e_ground)):
        return False
    g_b = [r for r in got if _has_bnode(r)]
    e_b = [r for r in exp if _has_bnode(r)]
    return _bag_equal_rec(g_b, e_b, bij)


def graphs_equal(got: list[tuple], exp: list[tuple]) -> bool:
    g = [{"s": s, "p": p, "o": o} for s, p, o in got]
    e = [{"s": s, "p": p, "o": o} for s, p, o in exp]
    return bag_equal(g, e)


# ---------------------------------------------------------------------------
# execution
# ---------------------------------------------------------------------------

def _load_store(spark, case: TestCase):
    from ..sources.turtle import parse_turtle
    from ..store import GraphStore

    quads = []
    for path in case.data:
        triples = parse_turtle(Path(path).read_text(encoding="utf-8"),
                               f"file://{path}")
        quads.extend((None, s, p, o) for s, p, o in triples)
    for path in case.graph_data:
        g = NamedNode(case.graph_labels.get(path, f"file://{path}"))
        triples = parse_turtle(Path(path).read_text(encoding="utf-8"),
                               f"file://{path}")
        quads.extend((g, s, p, o) for s, p, o in triples)
    return GraphStore.from_python_quads(spark, quads)


def datasets_equal(got: list[tuple], exp: list[tuple]) -> bool:
    """Quad-set equality under ONE bnode bijection spanning all graphs
    (graph names are IRIs, so they compare literally)."""
    g = [{"g": gr, "s": s, "p": p, "o": o} for gr, s, p, o in got]
    e = [{"g": gr, "s": s, "p": p, "o": o} for gr, s, p, o in exp]
    return bag_equal(g, e)


RS = "http://www.w3.org/2001/sw/DataAccess/tests/result-set#"


def _expected(case: TestCase):
    text = Path(case.result).read_text(encoding="utf-8")
    if case.result.endswith(".srx"):
        return parse_srx(text)
    from ..sources.turtle import parse_turtle
    triples = parse_turtle(text, f"file://{case.result}")
    g = _Graph(triples)
    roots = [s for (s, p), objs in g.spo.items()
             if p == RDF + "type" and any(
                 isinstance(o, NamedNode) and o.iri == RS + "ResultSet"
                 for o in objs)]
    if not roots:
        return ("graph", triples)
    # DAWG result-set vocabulary: rs:solution / rs:binding / rs:value;
    # rs:index present on every solution => the expectation is ORDERED
    rows = []
    for sol in g.objs(roots[0], RS + "solution"):
        idx_t = g.obj(sol, RS + "index")
        idx = float(idx_t.lexical) if isinstance(idx_t, Literal) else None
        row: dict[str, Term] = {}
        for b in g.objs(sol, RS + "binding"):
            var = g.obj(b, RS + "variable")
            val = g.obj(b, RS + "value")
            if isinstance(var, Literal) and val is not None:
                row[var.lexical] = val
        rows.append((idx, row))
    if rows and all(i is not None for i, _ in rows):
        rows.sort(key=lambda t: t[0])
        return ("bindings_ordered", [r for _, r in rows])
    return ("bindings", [r for _, r in rows])


def seq_equal(got: list[dict], exp: list[dict]) -> bool:
    """Ordered row-sequence equality under a bnode bijection."""
    if len(got) != len(exp):
        return False
    bij: Optional[dict] = {}
    for g, e in zip(got, exp):
        bij = _rows_match(g, e, bij)
        if bij is None:
            return False
    return True


# Out-of-scope tests, mirroring the reference's own #[ignore] scope
# (testsuite/tests/sparql.rs: no Federation/SERVICE, no Update, no
# SPARQL-star; oxigraph.rs marks the whole oxigraph suite ignored).
# LATERAL is an oxigraph extension beyond the reference's grammar, and
# order_terms pins oxigraph's implementation-defined (and intransitive)
# tie-break order for incomparable literals — SPARQL leaves that order
# to the implementation; ours is the consistent total order in
# functions/sortkeys.py.
SKIP_SUBSTRINGS = {
    # SERVICE is no longer skipped: federation is implemented
    # (sparql/service.py), and the oxigraph ask_{union,join}_error_*
    # cases (unbound variable endpoint → per-solution error → empty
    # branch) run against it
    "SPARQL-star": "reference ignores SPARQL-star (sparql.rs)",
    "literals have an order": "implementation-defined tie-break order",
}


def skip_reason(case: TestCase) -> Optional[str]:
    hay = case.name + " " + case.type
    if case.query:
        try:
            hay += " " + Path(case.query).read_text(encoding="utf-8")
        except OSError:
            pass
    for key, reason in SKIP_SUBSTRINGS.items():
        if key in hay:
            return reason
    return None


def _run_results_syntax_case(case: TestCase) -> tuple[bool, str]:
    """ox:{Positive,Negative}{Json,Xml,Tsv}ResultsSyntaxTest — result
    format readers must accept/reject; with an mf:result, the parsed
    bindings must equal the expected document's."""
    from ..results import readers as R

    fmt = ("json" if "Json" in case.type else
           "xml" if "Xml" in case.type else "tsv")
    read = {"json": R.read_json_results, "xml": R.read_xml_results,
            "tsv": R.read_tsv_results}[fmt]
    text = Path(case.query).read_text(encoding="utf-8")
    negative = case.type.startswith("Negative")
    try:
        got = read(text)
    except R.ResultParseError as e:
        if negative:
            return True, f"rejected: {e}"
        return False, f"rejected a valid document: {e}"
    if negative:
        return False, "accepted an invalid document"
    if case.result:
        exp = read(Path(case.result).read_text(encoding="utf-8"))
        if got[0] != exp[0]:
            return False, f"{got[0]} vs {exp[0]}"
        if got[0] == "bindings":
            ok = (sorted(got[1]) == sorted(exp[1])
                  and seq_equal(got[2], exp[2]))
        else:
            ok = got[1] == exp[1]
        return ok, "parsed results match" if ok else f"{got} != {exp}"
    return True, "parsed"


def _quad_row(g, s, p, o) -> dict:
    row = {"s": s, "p": p, "o": o}
    if g is not None:
        row["g"] = g
    return row


def _run_update_case(spark, case: TestCase, request: str) -> tuple[bool, str]:
    """ut:-vocabulary update evaluation: build the pre-state dataset, apply
    the update request, compare the full post-state dataset (default graph +
    labeled named graphs) against the expectation under one bnode bijection
    (W3C sparql11 UpdateEvaluationTest semantics)."""
    from ..sources.turtle import parse_turtle

    store = _load_store(spark, case)
    store.update(request)

    got = [
        _quad_row(term_to_python(r["graph"]), term_to_python(r["subject"]),
                  term_to_python(r["predicate"]), term_to_python(r["object"]))
        for r in store.quads.collect()
    ]
    exp: list[dict] = []
    for path in case.result_data:
        for s, p, o in parse_turtle(Path(path).read_text(encoding="utf-8"),
                                    f"file://{path}"):
            exp.append(_quad_row(None, s, p, o))
    for path, iri in case.result_graph_data:
        gn = NamedNode(iri)
        for s, p, o in parse_turtle(Path(path).read_text(encoding="utf-8"),
                                    f"file://{path}"):
            exp.append(_quad_row(gn, s, p, o))
    ok = bag_equal(got, exp)
    return ok, f"post-state {len(got)} quads vs {len(exp)} expected"


def run_case(spark, case: TestCase) -> tuple[bool, str]:
    """Execute one test case; (passed, detail)."""
    from ..plans.translator import AskResult, GraphResult, SelectResult
    from ..sparql.parser import parse_query

    if case.type.endswith("ResultsSyntaxTest"):
        return _run_results_syntax_case(case)

    query_text = Path(case.query).read_text(encoding="utf-8")

    if case.type in ("NegativeSyntaxTest", "NegativeSyntaxTest11"):
        try:
            parse_query(query_text)
        except Exception:
            return True, "rejected as expected"
        return False, "parser accepted an invalid query"
    if case.type in ("PositiveSyntaxTest", "PositiveSyntaxTest11"):
        parse_query(query_text)
        return True, "parsed"
    if case.type == "NegativeUpdateSyntaxTest11":
        from ..sparql.parser import parse_update
        try:
            parse_update(query_text)
        except Exception:
            return True, "rejected as expected"
        return False, "parser accepted an invalid update"
    if case.type == "PositiveUpdateSyntaxTest11":
        from ..sparql.parser import parse_update
        parse_update(query_text)
        return True, "parsed"
    if case.type == "UpdateEvaluationTest":
        return _run_update_case(spark, case, query_text)
    if case.type != "QueryEvaluationTest":
        return False, f"unsupported test type {case.type}"

    store = _load_store(spark, case)
    res = store.query(query_text)
    kind, expected = _expected(case)

    if isinstance(res, AskResult):
        if kind != "boolean":
            return False, f"ASK vs {kind} expectation"
        ok = res.value == expected
        return ok, f"got {res.value}, expected {expected}"

    if isinstance(res, SelectResult):
        if kind not in ("bindings", "bindings_ordered"):
            return False, f"SELECT vs {kind} expectation"
        got = []
        for row in res.df.collect():
            d = {}
            for var in res.variables:
                t = term_to_python(row[var])
                if t is not None:
                    d[var] = t
            got.append(d)
        ok = seq_equal(got, expected) if kind == "bindings_ordered" \
            else bag_equal(got, expected)
        return ok, f"{len(got)} rows vs {len(expected)} expected"

    if isinstance(res, GraphResult):
        if kind != "graph":
            return False, f"graph result vs {kind} expectation"
        got = [tuple(term_to_python(row[c])
                     for c in ("subject", "predicate", "object"))
               for row in res.df.collect()]
        ok = graphs_equal(got, [tuple(t) for t in expected])
        return ok, f"{len(got)} triples vs {len(expected)} expected"

    return False, f"unknown result type {type(res).__name__}"
