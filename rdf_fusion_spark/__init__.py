"""rdf_fusion_spark — a PySpark-native SPARQL 1.1 analytics engine.

Brand-new implementation with the query and data-processing capabilities of
tobixdev/rdf-fusion (reference studied read-only at /root/reference),
re-expressed Spark-first: DataFrame/SQL logical plans, Catalyst
optimization, Tungsten execution. Plus large-scale training-data pipeline
operators (dedup, similarity search, text analysis, multimodal plumbing).
"""

from .plans.builder import PlanBuilder
from .store import GraphStore, ActiveGraph


def __getattr__(name):
    # lazy: the DataFrame-mapping store pulls in the scan machinery
    if name == "VirtualDataFrameStore":
        from .sources.virtual import VirtualDataFrameStore
        return VirtualDataFrameStore
    raise AttributeError(name)

from .terms import (
    NamedNode, BlankNode, Literal, Variable,
    TERM_TYPE, QUADS_SCHEMA,
)

__all__ = [
    "GraphStore", "ActiveGraph", "PlanBuilder", "VirtualDataFrameStore",
    "NamedNode", "BlankNode", "Literal", "Variable",
    "TERM_TYPE", "QUADS_SCHEMA",
]
