"""KG construction over a generic documents table (dictionary-gazetteer
mention detection).

The transcript pipeline (pipeline.py) is the primary path; this module runs
the same triple-construction/materialization operators over the
`documents(doc_id, text, ...)` test corpus with a deterministic
dictionary-based mention detector — the trivially-SQL-expressible extractor
used for the DuckDB correctness oracle. Entity names here are lowercase
URI-safe ASCII tokens, so URI minting uses the native JVM fast path
(uris.to_uri_native), bit-identical to the pandas-UDF path for this input
class (tests/test_uris.py::test_to_uri_native_matches_on_safe_ascii).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import DEFAULT_COLLECTION, DEFAULT_GRAPH, OTYPE_LITERAL, OTYPE_URI, RDF_LABEL
from .uris import to_uri_native

# Gazetteer: tokens that appear in the synthetic documents corpus.
ENTITY_VOCAB = [
    "spark", "hash", "merge", "join", "table", "scan",
    "window", "batch", "stream", "vector", "query", "filter",
]

CO_OCCURS = "co_occurs_with"


def doc_tokens(documents: DataFrame) -> DataFrame:
    return documents.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )


def doc_mentions(documents: DataFrame, vocab: list[str] | None = None) -> DataFrame:
    """Dictionary mention detection: explode tokens, semi-match against the
    (broadcast) gazetteer, distinct per document. At 100 TB the explode is
    narrow and the distinct shuffles only (doc_id, entity) pairs."""
    vocab = vocab or ENTITY_VOCAB
    return (
        doc_tokens(documents)
        .where(F.col("token").isin(vocab))
        .select("doc_id", F.col("token").alias("entity"))
        .distinct()
    )


def mention_label_triples(mentions: DataFrame) -> DataFrame:
    """One rdfs:label triple per distinct entity (reference E2 label-triple
    semantics applied to gazetteer mentions)."""
    ents = mentions.select("entity").distinct()
    return ents.select(
        F.lit(DEFAULT_COLLECTION).alias("collection"),
        F.lit(DEFAULT_GRAPH).alias("g"),
        to_uri_native(F.col("entity")).alias("s"),
        F.lit(RDF_LABEL).alias("p"),
        F.col("entity").alias("o"),
        F.lit(OTYPE_LITERAL).alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )


def cooccurrence_edges(mentions: DataFrame) -> DataFrame:
    """Relationship triples from within-document co-occurrence: a<b pairs
    via self-join on doc_id (the blocking key), weight = distinct doc
    count. The join is bounded by per-doc mention count (≤|vocab|)."""
    a = mentions.select("doc_id", F.col("entity").alias("ent_a"))
    b = mentions.select("doc_id", F.col("entity").alias("ent_b"))
    pairs = (
        a.join(b, "doc_id")
        .where(F.col("ent_a") < F.col("ent_b"))
        .groupBy("ent_a", "ent_b")
        .agg(F.count("*").alias("n_docs"))
    )
    return pairs.select(
        to_uri_native(F.col("ent_a")).alias("s"),
        to_uri_native(F.lit(CO_OCCURS)).alias("p"),
        to_uri_native(F.col("ent_b")).alias("o"),
        F.col("n_docs"),
    )


def cooccurrence_triples(mentions: DataFrame) -> DataFrame:
    """Co-occurrence edges in the standard flat-quad schema (weight dropped;
    otype=u), unioned with the label triples — a complete documents-KG."""
    rel = cooccurrence_edges(mentions).select(
        F.lit(DEFAULT_COLLECTION).alias("collection"),
        F.lit(DEFAULT_GRAPH).alias("g"),
        "s",
        "p",
        "o",
        F.lit(OTYPE_URI).alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )
    return rel.unionByName(mention_label_triples(mentions))


def documents_kg(documents: DataFrame, vocab: list[str] | None = None) -> DataFrame:
    """documents -> mentions -> co-occurrence + label triples -> deduped
    edges manifest. The flagship smoke path over the test corpus."""
    from .operators.materialize import materialize_edges

    mentions = doc_mentions(documents, vocab)
    return materialize_edges(cooccurrence_triples(mentions))
