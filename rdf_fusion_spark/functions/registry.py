"""Custom scalar function registry: IRI-callable UDFs.

reference: FunctionRegistry (lib/functions/src/registry.rs:130-165) and the
RdfFusionFunctions extension trait (lib/extensions/src/functions/).

A custom function is a builder `list[Column] -> Column` over term-struct
Columns (see terms.py for the struct layout; functions/typed_ops.py for the
value-space helpers). Builders compose into whole-stage codegen like every
builtin — register a Column-expression builder, NOT a Python UDF, unless
the semantics genuinely require Python (then wrap a pandas_udf yourself).

    from rdf_fusion_spark.functions import registry, typed_ops as tv
    registry.register("http://example.org/fn#double_it",
                      lambda args: tv.rdf_add(args[0], args[0]))
    store.query("SELECT (<http://example.org/fn#double_it>(?x) AS ?y) ...")
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column

Builder = Callable[[list], Column]

_REGISTRY: dict[str, Builder] = {}


def register(iri: str, builder: Builder) -> None:
    """Register (or replace) a custom function under an IRI."""
    _REGISTRY[iri] = builder


def unregister(iri: str) -> None:
    _REGISTRY.pop(iri, None)


def lookup(iri: str) -> Builder | None:
    return _REGISTRY.get(iri)


def registered() -> list[str]:
    return sorted(_REGISTRY)
