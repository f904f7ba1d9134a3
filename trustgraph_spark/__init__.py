"""trustgraph_spark — a PySpark-native knowledge-graph construction engine.

A from-scratch reimplementation of the KG-construction core of
trustgraph-ai/trustgraph (reference at /root/reference, see SURVEY.md),
expressed Spark-first: DataFrame/SQL plans optimized by Catalyst, with
vectorized pandas/Arrow UDFs at exactly three seams (extraction, embedding,
similarity scoring).

Pipeline: transcripts -> turn assembly (chunks) -> triple extraction
(definitions + relationships) -> entity linking & canonicalization
(connected components) -> graph materialization (edges / quads_by_entity /
nodes), with per-stage lineage + metrics and checkpoint-based resume.
"""

__version__ = "0.1.0"

from .constants import (  # noqa: F401
    TRUSTGRAPH_ENTITIES,
    RDF_LABEL,
    DEFINITION,
    RDF_TYPE,
    GRAPH_SOURCE,
    GRAPH_RETRIEVAL,
    DEFAULT_GRAPH,
    OTYPE_URI,
    OTYPE_LITERAL,
    OTYPE_TRIPLE,
)
