"""SPARQL result-format READERS (JSON / XML / TSV) with validation —
the inverse of serializers.py, covered by the oxigraph sparql-results
conformance suite (reference: testsuite/src/evaluator.rs result-syntax
test types; format specs are the public W3C SPARQL 1.1 Results notes).

Readers return ("boolean", bool) or ("bindings", vars, rows) where each
row maps variable name → Term. Malformed documents raise
ResultParseError; unknown keys/attributes are ignored per the specs.
"""

from __future__ import annotations

import json
import re
import xml.etree.ElementTree as ET

from ..terms import BlankNode, Literal, NamedNode, Term

SRX_NS = "{http://www.w3.org/2005/sparql-results#}"


class ResultParseError(ValueError):
    pass


def _check_vars(variables: list) -> list:
    if len(set(variables)) != len(variables):
        raise ResultParseError(f"duplicated variables in head: {variables}")
    return variables


# ---------------------------------------------------------------------------
# JSON (SRJ)
# ---------------------------------------------------------------------------

def _json_term(obj: dict) -> Term:
    t = obj.get("type")
    value = obj.get("value")
    if value is None:
        raise ResultParseError(f"binding without value: {obj}")
    if t == "uri":
        return NamedNode(value)
    if t == "bnode":
        return BlankNode(value)
    if t in ("literal", "typed-literal"):  # typed-literal: legacy alias
        lang = obj.get("xml:lang")
        if lang:
            return Literal(value, language=lang)
        dt = obj.get("datatype")
        if dt:
            return Literal(value, dt)
        return Literal(value)
    raise ResultParseError(f"unknown term type {t!r}")


def read_json_results(text: str):
    try:
        doc = json.loads(text)
    except json.JSONDecodeError as e:
        raise ResultParseError(str(e)) from e
    if not isinstance(doc, dict):
        raise ResultParseError("top-level value must be an object")
    if "boolean" in doc:
        b = doc["boolean"]
        if not isinstance(b, bool):
            raise ResultParseError("boolean must be true/false")
        return ("boolean", b)
    head = doc.get("head")
    results = doc.get("results")
    if head is None or results is None:
        raise ResultParseError("missing head or results")
    variables = _check_vars(list(head.get("vars", [])))
    rows = []
    for binding in results.get("bindings", []):
        row = {}
        for var, obj in binding.items():
            row[var] = _json_term(obj)
        rows.append(row)
    return ("bindings", variables, rows)


# ---------------------------------------------------------------------------
# XML (SRX)
# ---------------------------------------------------------------------------

def read_xml_results(text: str):
    try:
        root = ET.fromstring(text)
    except ET.ParseError as e:
        raise ResultParseError(str(e)) from e
    head = root.find(f"{SRX_NS}head")
    variables = _check_vars(
        [v.attrib["name"] for v in head.findall(f"{SRX_NS}variable")]
        if head is not None else [])
    boolean = root.find(f"{SRX_NS}boolean")
    if boolean is not None:
        return ("boolean", (boolean.text or "").strip() == "true")
    rows = []
    for result in root.iter(f"{SRX_NS}result"):
        row = {}
        for b in result.findall(f"{SRX_NS}binding"):
            row[b.attrib["name"]] = _xml_term(b)
        rows.append(row)
    return ("bindings", variables, rows)


def _xml_term(binding) -> Term:
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
    raise ResultParseError("empty binding element")


# ---------------------------------------------------------------------------
# TSV
# ---------------------------------------------------------------------------

_TSV_TERM_RE = re.compile(
    r"""^(?:<(?P<iri>[^>]*)>
        |_:(?P<bnode>\S+)
        |"(?P<lit>(?:[^"\\]|\\.)*)"
          (?:@(?P<lang>[A-Za-z0-9-]+)|\^\^<(?P<dt>[^>]*)>)?
        |(?P<num>[+-]?\d[\d.eE+-]*)
        |(?P<bool>true|false))$""", re.VERBOSE)

_UNESCAPES = {"t": "\t", "n": "\n", "r": "\r", '"': '"', "\\": "\\"}


def _tsv_term(tok: str) -> Term:
    from ..terms import (
        XSD_BOOLEAN,
        XSD_DECIMAL,
        XSD_DOUBLE,
        XSD_INTEGER,
    )
    m = _TSV_TERM_RE.match(tok)
    if m is None:
        raise ResultParseError(f"bad TSV term {tok!r}")
    if m.group("iri") is not None:
        return NamedNode(m.group("iri"))
    if m.group("bnode") is not None:
        return BlankNode(m.group("bnode"))
    if m.group("lit") is not None:
        lex = re.sub(r"\\(.)", lambda x: _UNESCAPES.get(x.group(1), x.group(1)),
                     m.group("lit"))
        if m.group("lang"):
            return Literal(lex, language=m.group("lang"))
        if m.group("dt"):
            return Literal(lex, m.group("dt"))
        return Literal(lex)
    if m.group("bool") is not None:
        return Literal(m.group("bool"), XSD_BOOLEAN)
    n = m.group("num")
    if re.fullmatch(r"[+-]?\d+", n):
        return Literal(n, XSD_INTEGER)
    if "e" in n.lower():
        return Literal(n, XSD_DOUBLE)
    return Literal(n, XSD_DECIMAL)


def read_tsv_results(text: str):
    lines = text.split("\n")
    if lines and lines[-1] == "":
        lines.pop()
    if not lines:
        raise ResultParseError("empty TSV document")
    header = lines[0].split("\t")
    variables = []
    for h in header:
        h = h.strip()
        if not h.startswith("?"):
            raise ResultParseError(f"TSV header cell {h!r} must start with ?")
        variables.append(h[1:])
    _check_vars(variables)
    rows = []
    for line in lines[1:]:
        cells = line.split("\t")
        row = {}
        for var, cell in zip(variables, cells):
            cell = cell.strip()
            if cell:
                row[var] = _tsv_term(cell)
        rows.append(row)
    return ("bindings", variables, rows)
