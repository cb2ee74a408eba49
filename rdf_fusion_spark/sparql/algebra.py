"""SPARQL algebra IR — the parser's output, the translator's input.

Mirrors the node set of spargebra's `GraphPattern`
(reference: lib/execution/src/sparql/algebra.rs:37-57 dispatches on
Bgp/Join/LeftJoin/Filter/Extend/Union/Graph/Path/Minus/Group/Project/
Distinct/Slice/OrderBy/Values), but is a plain Python dataclass tree.
This is IR #1; translation lowers it *eagerly* to DataFrame operations —
no custom logical nodes, per SURVEY.md §7.2.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union as TUnion

from ..terms import Literal, NamedNode, BlankNode, Term, TermOrVar, Variable

# ---------------------------------------------------------------------------
# Expressions
# ---------------------------------------------------------------------------


@dataclass
class EVar:
    name: str


@dataclass
class ETerm:
    term: Term


@dataclass
class ECall:
    """Operator or builtin call. `name` is the uppercased SPARQL name
    ('+', '-', '*', '/', '=', '!=', '<', '<=', '>', '>=', '&&', '||', '!',
    'UMINUS', 'UPLUS', 'BOUND', 'IF', 'COALESCE', 'STR', 'REGEX', ...,
    'IN', 'NOT IN') or a custom-function IRI."""
    name: str
    args: list


@dataclass
class EExists:
    pattern: "GraphPattern"
    negated: bool = False


Expression = TUnion[EVar, ETerm, ECall, EExists]


@dataclass
class AggCall:
    """One aggregate: SUM/AVG/MIN/MAX/COUNT/SAMPLE/GROUP_CONCAT.
    expr is None for COUNT(*)."""
    name: str
    expr: Optional[Expression]
    distinct: bool = False
    separator: Optional[str] = None  # GROUP_CONCAT


# ---------------------------------------------------------------------------
# Property paths
# ---------------------------------------------------------------------------


@dataclass
class PathLink:
    iri: NamedNode


@dataclass
class PathInverse:
    inner: "Path"


@dataclass
class PathSequence:
    first: "Path"
    second: "Path"


@dataclass
class PathAlternative:
    left: "Path"
    right: "Path"


@dataclass
class PathZeroOrMore:
    inner: "Path"


@dataclass
class PathOneOrMore:
    inner: "Path"


@dataclass
class PathZeroOrOne:
    inner: "Path"


@dataclass
class PathNegatedSet:
    forward: list[NamedNode]
    inverse: list[NamedNode]


Path = TUnion[PathLink, PathInverse, PathSequence, PathAlternative,
             PathZeroOrMore, PathOneOrMore, PathZeroOrOne, PathNegatedSet]


# ---------------------------------------------------------------------------
# Graph patterns
# ---------------------------------------------------------------------------


@dataclass
class TriplePattern:
    subject: TermOrVar
    predicate: TermOrVar  # NamedNode or Variable (paths use PathPattern)
    object: TermOrVar


@dataclass
class BGP:
    triples: list[TriplePattern]


@dataclass
class PathPattern:
    subject: TermOrVar
    path: Path
    object: TermOrVar


@dataclass
class Join:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass
class LeftJoin:
    left: "GraphPattern"
    right: "GraphPattern"
    expr: Optional[Expression] = None


@dataclass
class Filter:
    expr: Expression
    inner: "GraphPattern"


@dataclass
class Union:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass
class GraphNode:
    name: TUnion[NamedNode, Variable]
    inner: "GraphPattern"


@dataclass
class Extend:
    inner: "GraphPattern"
    var: Variable
    expr: Expression


@dataclass
class Minus:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass
class Lateral:
    """A LATERAL B (SEP-0006): evaluate B once per solution of A with
    A's bindings substituted — a dependent join."""
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass
class ValuesNode:
    variables: list[Variable]
    rows: list[list[Optional[Term]]]  # None = UNDEF


@dataclass
class ServiceNode:
    """SERVICE [SILENT] <endpoint> { pattern } — SPARQL 1.1 Federated
    Query. `raw_text` is the inner group's source text (braces included);
    the remote request is rebuilt from it plus the outer query's prologue
    so prefixed names resolve identically on the remote engine. The
    reference `#[ignore]`s its service tests (this engine goes further).
    """
    endpoint: "Term"          # NamedNode; Variable endpoints unsupported
    inner: "GraphPattern"     # parsed inner pattern (scope/variable info)
    raw_text: str             # source text of `{ ... }`
    prologue: str             # regenerated BASE/PREFIX declarations
    silent: bool = False


@dataclass
class OrderCondition:
    expr: Expression
    ascending: bool = True


@dataclass
class OrderBy:
    inner: "GraphPattern"
    conditions: list[OrderCondition]


@dataclass
class Project:
    inner: "GraphPattern"
    variables: list[Variable]


@dataclass
class Distinct:
    inner: "GraphPattern"


@dataclass
class Reduced:
    inner: "GraphPattern"


@dataclass
class Slice:
    inner: "GraphPattern"
    start: int = 0
    length: Optional[int] = None


@dataclass
class Group:
    inner: "GraphPattern"
    keys: list[Variable]           # group-by exprs are pre-bound via Extend
    aggregates: list[tuple[Variable, AggCall]]


GraphPattern = TUnion[BGP, PathPattern, Join, LeftJoin, Filter, Union,
                     GraphNode, Extend, Minus, ValuesNode, OrderBy, Project,
                     Distinct, Reduced, Slice, Group]


# ---------------------------------------------------------------------------
# Query forms
# ---------------------------------------------------------------------------


@dataclass
class Dataset:
    default: list[NamedNode] = field(default_factory=list)   # FROM
    named: list[NamedNode] = field(default_factory=list)     # FROM NAMED


@dataclass
class SelectQuery:
    pattern: GraphPattern
    dataset: Optional[Dataset] = None


@dataclass
class AskQuery:
    pattern: GraphPattern
    dataset: Optional[Dataset] = None


@dataclass
class ConstructQuery:
    template: list[TriplePattern]
    pattern: GraphPattern
    dataset: Optional[Dataset] = None


@dataclass
class DescribeQuery:
    terms: list  # NamedNode or Variable
    pattern: Optional[GraphPattern] = None
    dataset: Optional[Dataset] = None


Query = TUnion[SelectQuery, AskQuery, ConstructQuery, DescribeQuery]


def pattern_variables(p) -> set[str]:
    """All variables potentially in scope of a pattern (the 'maybe' set)."""
    if isinstance(p, BGP):
        out: set[str] = set()
        for t in p.triples:
            for x in (t.subject, t.predicate, t.object):
                if isinstance(x, Variable):
                    out.add(x.name)
        return out
    if isinstance(p, PathPattern):
        out = set()
        for x in (p.subject, p.object):
            if isinstance(x, Variable):
                out.add(x.name)
        return out
    if isinstance(p, (Join, LeftJoin, Union, Minus)):
        if isinstance(p, Minus):
            return pattern_variables(p.left)
        return pattern_variables(p.left) | pattern_variables(p.right)
    if isinstance(p, Filter):
        return pattern_variables(p.inner)
    if isinstance(p, GraphNode):
        v = pattern_variables(p.inner)
        if isinstance(p.name, Variable):
            v = v | {p.name.name}
        return v
    if isinstance(p, Extend):
        return pattern_variables(p.inner) | {p.var.name}
    if isinstance(p, ValuesNode):
        return {v.name for v in p.variables}
    if isinstance(p, (OrderBy, Distinct, Reduced, Slice)):
        return pattern_variables(p.inner)
    if isinstance(p, Project):
        return {v.name for v in p.variables}
    if isinstance(p, Group):
        return {v.name for v in p.keys} | {v.name for v, _ in p.aggregates}
    if isinstance(p, Lateral):
        return pattern_variables(p.left) | pattern_variables(p.right)
    if isinstance(p, ServiceNode):
        return pattern_variables(p.inner)
    raise TypeError(f"unknown pattern: {p!r}")


# ---------------------------------------------------------------------------
# SPARQL 1.1 Update (reference: lib/rdf-fusion/src/store.rs:409-475 update();
# operation grammar from the public SPARQL 1.1 Update spec)
# ---------------------------------------------------------------------------

# A quad pattern/template: (graph, s, p, o) where graph is None (default),
# a NamedNode, or a Variable; positions are Terms or Variables.
QuadPattern = tuple


@dataclass
class InsertDataOp:
    quads: list  # ground QuadPatterns (bnodes allowed, minted per op)


@dataclass
class DeleteDataOp:
    quads: list  # ground QuadPatterns (bnodes forbidden by the grammar)


@dataclass
class DeleteWhereOp:
    quads: list  # QuadPatterns doubling as pattern and delete template


@dataclass
class ModifyOp:
    """[WITH g] DELETE {..} INSERT {..} [USING ..] WHERE {..}"""
    delete_quads: list
    insert_quads: list
    pattern: "GraphPattern"
    with_graph: Optional[NamedNode] = None
    dataset: Optional[Dataset] = None


@dataclass
class LoadOp:
    source: NamedNode
    graph: Optional[NamedNode] = None
    silent: bool = False


@dataclass
class ClearOp:
    target: object  # "default" | "named" | "all" | NamedNode
    silent: bool = False
    drop: bool = False  # DROP vs CLEAR (same effect in a quad store)


@dataclass
class CreateOp:
    graph: NamedNode
    silent: bool = False


@dataclass
class GraphManagementOp:
    """COPY / MOVE / ADD between graphs ("default" or NamedNode)."""
    kind: str  # "COPY" | "MOVE" | "ADD"
    source: object
    target: object
    silent: bool = False


UpdateOp = TUnion[InsertDataOp, DeleteDataOp, DeleteWhereOp, ModifyOp,
                  LoadOp, ClearOp, CreateOp, GraphManagementOp]
