"""Distributed multi-file RDF loading.

Turtle/TriG/RDF-XML are stateful formats (prefixes, nested bnodes) that
cannot be split WITHIN a file — but a corpus directory holds many files,
and each parses independently. `read_rdf_directory` ships whole files to
executors and runs the existing pure-Python parsers there, so ingest
parallelism = file count (the standard shape for bulk RDF drops, e.g.
one Turtle file per source document). N-Triples is parsed as the Turtle
subset it is, N-Quads as the TriG subset.

Blank-node labels are document-scoped per RDF Concepts: each file's
labels get a per-file suffix so `_:b0` in two files never collides.

reference: lib/rdf-fusion/src/store.rs:477-558 (load_from_reader; the
reference parses on one thread — this is the distributed upgrade).
"""

from __future__ import annotations

import hashlib
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from ..terms import QUADS_SCHEMA, BlankNode
from .formats import NQUADS, NTRIPLES, RDFXML, TRIG, TURTLE
from .formats import RdfFormat, format_from_path


def _rescope_bnode(term, suffix: str):
    if isinstance(term, BlankNode):
        return BlankNode(f"{term.id}{suffix}")
    return term


def _parse_one_file(fname: str, text: str, fmt: Optional[RdfFormat],
                    base: Optional[str]):
    """(file, content) → quad rows; runs on executors."""
    from ..terms import term_py_row
    from .rdfxml import parse_rdfxml
    from .trig import parse_trig
    from .turtle import parse_turtle

    f = fmt or format_from_path(fname)
    if f is None:
        raise ValueError(f"cannot determine RDF format of {fname}")
    b = base or fname
    if f in (TURTLE, NTRIPLES):  # N-Triples is a Turtle subset
        quads = [(None, s, p, o) for s, p, o in parse_turtle(text, b)]
    elif f in (TRIG, NQUADS):    # N-Quads is a TriG subset
        quads = parse_trig(text, b)
    elif f == RDFXML:
        quads = [(None, s, p, o) for s, p, o in parse_rdfxml(text, b)]
    else:  # pragma: no cover
        raise ValueError(f"unsupported bulk format {f}")
    suffix = "__f" + hashlib.md5(fname.encode()).hexdigest()[:8]
    out = []
    for g, s, p, o in quads:
        out.append((
            term_py_row(_rescope_bnode(g, suffix)) if g is not None else None,
            term_py_row(_rescope_bnode(s, suffix)),
            term_py_row(p),
            term_py_row(_rescope_bnode(o, suffix)),
        ))
    return out


def read_rdf_directory(spark: SparkSession, path: str,
                       fmt: Optional[RdfFormat] = None,
                       base: Optional[str] = None,
                       min_partitions: Optional[int] = None) -> DataFrame:
    """Parse every RDF file under `path` (a directory or glob) into one
    quads DataFrame, one executor task per file (or more with
    min_partitions)."""
    from .relational import configure_session
    configure_session(spark)  # ships the package zip to executors
    sc = spark.sparkContext
    rdd = sc.wholeTextFiles(path, minPartitions=min_partitions
                            or sc.defaultParallelism)
    rows = rdd.flatMap(lambda kv: _parse_one_file(kv[0], kv[1], fmt, base))
    return spark.createDataFrame(rows, QUADS_SCHEMA)
