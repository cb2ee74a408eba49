"""RDF/XML reader (RDF 1.1 XML syntax) via a stdlib SAX walker.

Covers the syntax the W3C/oxigraph fixtures and typical ontology files use:
node elements (rdf:Description and typed), rdf:about / rdf:ID / rdf:nodeID,
property elements with rdf:resource / rdf:nodeID / nested node elements /
text content, rdf:datatype, xml:lang (inherited), property attributes,
rdf:parseType="Resource" | "Collection" | "Literal", rdf:li container items,
and xml:base resolution.

reference: lib/rdf-fusion/src/store.rs:477-558 (load_from_reader accepts
RDF/XML via oxrdfxml); the grammar here is from the public RDF/XML spec.
Driver-side parse: RDF/XML is an interchange format for ontologies and
fixtures, never the bulk-load path (that is N-Triples/parquet).
"""

from __future__ import annotations

import re
import xml.sax
import xml.sax.handler
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..terms import RDF_NS, BlankNode, Literal, NamedNode, Term

_RDF = RDF_NS
_SYNTAX_ATTRS = {  # attributes that are syntax, not property attributes
    (_RDF, "about"), (_RDF, "ID"), (_RDF, "nodeID"), (_RDF, "resource"),
    (_RDF, "datatype"), (_RDF, "parseType"), (_RDF, "li"),
}
_NODE_FORBIDDEN = {_RDF + n for n in
                   ("RDF", "ID", "about", "parseType", "resource", "nodeID",
                    "aboutEach", "aboutEachPrefix", "bagID", "li")}


class RdfXmlParseError(ValueError):
    pass


class _Frame:
    """One element on the SAX stack: either a NODE element (resource) or a
    PROPERTY element (predicate) of the node above it."""
    __slots__ = ("kind", "term", "pred", "lang", "base", "text", "datatype",
                 "object_seen", "parse_type", "collection", "li_counter",
                 "literal_depth", "literal_parts")

    def __init__(self, kind: str):
        self.kind = kind          # "node" | "prop" | "literal"
        self.term: Optional[Term] = None
        self.pred: Optional[NamedNode] = None
        self.lang: Optional[str] = None
        self.base: str = ""
        self.text: list = []
        self.datatype: Optional[str] = None
        self.object_seen = False
        self.parse_type: Optional[str] = None
        self.collection: list = []
        self.li_counter = 1
        self.literal_depth = 0
        self.literal_parts: list = []


class _Handler(xml.sax.handler.ContentHandler):
    def __init__(self, base: str):
        super().__init__()
        self.triples: list[tuple[Term, Term, Term]] = []
        self.stack: list[_Frame] = []
        self.base = base
        self._bnode_n = 0
        self._ids: dict[str, Term] = {}

    # -- helpers -----------------------------------------------------------

    def _fresh_bnode(self) -> BlankNode:
        self._bnode_n += 1
        return BlankNode(f"xb{self._bnode_n}")

    def _cur_base(self) -> str:
        for f in reversed(self.stack):
            if f.base:
                return f.base
        return self.base

    def _cur_lang(self) -> Optional[str]:
        for f in reversed(self.stack):
            if f.lang is not None:
                return f.lang or None
        return None

    def _resolve(self, iri: str) -> str:
        base = self._cur_base()
        if re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", iri):
            return iri
        if iri == "":
            return re.sub(r"#.*$", "", base)
        if iri.startswith("#"):
            return re.sub(r"#.*$", "", base) + iri
        if iri.startswith("/"):
            m = re.match(r"^([A-Za-z][A-Za-z0-9+.-]*://[^/]*)", base)
            return (m.group(1) if m else base) + iri
        if "/" in base:
            return base.rsplit("/", 1)[0] + "/" + iri
        return base + iri

    def _emit(self, s: Term, p: Term, o: Term) -> None:
        self.triples.append((s, p, o))

    # -- literal XML capture (parseType="Literal") -------------------------

    def _in_xml_literal(self) -> bool:
        return bool(self.stack) and self.stack[-1].kind == "literal"

    # -- SAX events --------------------------------------------------------

    def startElementNS(self, name, qname, attrs):
        if self._in_xml_literal():
            f = self.stack[-1]
            f.literal_depth += 1
            attrt = "".join(f' {q}="{attrs.getValueByQName(q)}"'
                            for q in attrs.getQNames())
            f.literal_parts.append(f"<{name[1]}{attrt}>")
            return
        uri, local = name
        full = (uri or "") + local

        xml_lang = attrs.get(("http://www.w3.org/XML/1998/namespace", "lang"))
        xml_base = attrs.get(("http://www.w3.org/XML/1998/namespace", "base"))

        parent = self.stack[-1] if self.stack else None

        if full == _RDF + "RDF" and parent is None:
            f = _Frame("root")
            f.lang, f.base = xml_lang, xml_base or ""
            self.stack.append(f)
            return

        if parent is None or parent.kind in ("root", "prop"):
            # NODE element
            f = _Frame("node")
            f.lang, f.base = xml_lang, xml_base or ""
            self.stack.append(f)
            if full in _NODE_FORBIDDEN:
                raise RdfXmlParseError(f"forbidden node element {full}")
            about = attrs.get((_RDF, "about"))
            rid = attrs.get((_RDF, "ID"))
            node_id = attrs.get((_RDF, "nodeID"))
            if about is not None:
                f.term = NamedNode(self._resolve(about))
            elif rid is not None:
                f.term = NamedNode(self._resolve("#" + rid))
            elif node_id is not None:
                f.term = BlankNode(node_id)
            else:
                f.term = self._fresh_bnode()
            if full != _RDF + "Description":
                self._emit(f.term, NamedNode(_RDF + "type"), NamedNode(full))
            # property attributes
            for (auri, alocal) in attrs.getNames():
                if auri == "http://www.w3.org/XML/1998/namespace":
                    continue
                if (auri or "", alocal) in [(a, b) for a, b in _SYNTAX_ATTRS]:
                    continue
                if auri is None:
                    continue  # unqualified non-syntax attribute: ignore
                val = attrs.get((auri, alocal))
                pred = NamedNode(auri + alocal)
                if pred.iri == _RDF + "type":
                    self._emit(f.term, pred, NamedNode(self._resolve(val)))
                else:
                    self._emit(f.term, pred,
                               Literal(val, language=self._cur_lang()))
            # link to enclosing property element
            if parent is not None and parent.kind == "prop":
                self._attach_object(parent, f.term)
            return

        # PROPERTY element (parent is a node)
        f = _Frame("prop")
        f.lang, f.base = xml_lang, xml_base or ""
        self.stack.append(f)
        if full == _RDF + "li":
            full = _RDF + f"_{parent.li_counter}"
            parent.li_counter += 1
        f.pred = NamedNode(full)
        f.datatype = attrs.get((_RDF, "datatype"))
        f.parse_type = attrs.get((_RDF, "parseType"))
        resource = attrs.get((_RDF, "resource"))
        node_id = attrs.get((_RDF, "nodeID"))

        if f.parse_type == "Resource":
            inner = self._fresh_bnode()
            self._emit(parent.term, f.pred, inner)
            f.object_seen = True
            # make the bnode the node context for nested property elements
            nf = _Frame("node")
            nf.term = inner
            self.stack.append(nf)
            return
        if f.parse_type == "Collection":
            f.object_seen = True
            return
        if f.parse_type == "Literal":
            lf = _Frame("literal")
            self.stack.append(lf)
            return
        if resource is not None:
            self._emit(parent.term, f.pred,
                       NamedNode(self._resolve(resource)))
            f.object_seen = True
            return
        if node_id is not None:
            self._emit(parent.term, f.pred, BlankNode(node_id))
            f.object_seen = True
            return
        # property attributes on an empty property element → bnode object
        prop_attrs = [(a, attrs.get(a)) for a in attrs.getNames()
                      if a[0] not in (None, "http://www.w3.org/XML/1998/namespace")
                      and (a[0] or "", a[1]) not in _SYNTAX_ATTRS]
        if prop_attrs:
            inner = self._fresh_bnode()
            self._emit(parent.term, f.pred, inner)
            for (auri, alocal), val in prop_attrs:
                self._emit(inner, NamedNode(auri + alocal),
                           Literal(val, language=self._cur_lang()))
            f.object_seen = True

    def endElementNS(self, name, qname):
        if self._in_xml_literal():
            f = self.stack[-1]
            if f.literal_depth == 0:
                self.stack.pop()  # closing the parseType="Literal" property
                prop = self.stack[-1]
                parent = self.stack[-2]
                self._emit(parent.term, prop.pred,
                           Literal("".join(f.literal_parts),
                                   _RDF + "XMLLiteral"))
                prop.object_seen = True
                self.stack.pop()  # the property frame
                return
            f.literal_parts.append(f"</{name[1]}>")
            f.literal_depth -= 1
            return

        f = self.stack.pop()
        if f.kind == "node":
            # a parseType="Resource" synthetic node closes with its property
            if self.stack and self.stack[-1].kind == "prop" \
                    and self.stack[-1].parse_type == "Resource":
                self.stack.pop()
            return
        if f.kind == "prop":
            parent = self.stack[-1]
            if f.parse_type == "Collection":
                first = NamedNode(_RDF + "first")
                rest = NamedNode(_RDF + "rest")
                nil = NamedNode(_RDF + "nil")
                if not f.collection:
                    self._emit(parent.term, f.pred, nil)
                else:
                    nodes = [self._fresh_bnode() for _ in f.collection]
                    self._emit(parent.term, f.pred, nodes[0])
                    for i, item in enumerate(f.collection):
                        self._emit(nodes[i], first, item)
                        self._emit(nodes[i], rest,
                                   nodes[i + 1] if i + 1 < len(nodes) else nil)
                return
            if not f.object_seen:
                text = "".join(f.text)
                if f.datatype is not None:
                    obj = Literal(text, f.datatype)
                else:
                    obj = Literal(text, language=self._effective_lang(f))
                self._emit(parent.term, f.pred, obj)

    def _effective_lang(self, f: _Frame) -> Optional[str]:
        if f.lang is not None:
            return f.lang or None
        for g in reversed(self.stack):
            if g.lang is not None:
                return g.lang or None
        return None

    def _attach_object(self, prop: _Frame, term: Term) -> None:
        if prop.parse_type == "Collection":
            prop.collection.append(term)
            return
        if prop.object_seen:
            raise RdfXmlParseError("multiple objects in one property element")
        if "".join(prop.text).strip():
            raise RdfXmlParseError(
                "property element mixes text and node content")
        # the node frame just pushed is stack[-1]; its property is stack[-2],
        # whose parent node is stack[-3]
        parent = self.stack[-3]
        self._emit(parent.term, prop.pred, term)
        prop.object_seen = True

    def characters(self, content):
        if self._in_xml_literal():
            self.stack[-1].literal_parts.append(
                content.replace("&", "&amp;").replace("<", "&lt;"))
            return
        if self.stack and self.stack[-1].kind == "prop":
            f = self.stack[-1]
            if f.object_seen and content.strip() \
                    and f.parse_type is None:
                raise RdfXmlParseError(
                    "property element mixes node and text content")
            f.text.append(content)


def parse_rdfxml(text: str, base: Optional[str] = None
                 ) -> list[tuple[Term, Term, Term]]:
    """RDF/XML document → list of (s, p, o) triples."""
    handler = _Handler(base or "")
    parser = xml.sax.make_parser()
    parser.setFeature(xml.sax.handler.feature_namespaces, True)
    # no external entity resolution: fixture parsing must not touch the net
    parser.setFeature(xml.sax.handler.feature_external_ges, False)
    parser.setContentHandler(handler)
    import io
    try:
        parser.parse(io.StringIO(text))
    except xml.sax.SAXParseException as e:
        raise RdfXmlParseError(str(e)) from e
    return handler.triples


from .docio import read_doc as _read_doc


def read_rdfxml(spark: SparkSession, path: str,
                base: Optional[str] = None) -> DataFrame:
    """RDF/XML file → quads DataFrame (default graph)."""
    from ..store import GraphStore
    triples = parse_rdfxml(_read_doc(path), base or f"file://{path}")
    return GraphStore.from_python_quads(
        spark, [(None, s, p, o) for s, p, o in triples]).quads
