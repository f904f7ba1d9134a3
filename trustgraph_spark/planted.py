"""Planted-sentence corpus derivation for oracle-gating the extraction core.

The driver's correctness gate runs over the synthetic ``documents`` parquet
table, whose free text contains no extraction patterns. These helpers derive
— deterministically, in pure column expressions — planted chunk texts and
mention labels from each document row, so the correctness-critical E2/E3
path (RuleExtractor → definitions_to_triples / relationships_to_triples →
to_uri_udf percent-encoding), E11 provenance, and the linking/CC flow can be
verified against a DuckDB oracle that rebuilds the same planted text with
SQL and extracts from it with regexp_extract.

Reference semantics exercised (SURVEY.md §2.2):
- extract/kg/definitions/extract.py:113-259 (2 triples per definition)
- extract/kg/relationships/extract.py:96-237 (rel triple + s/p labels,
  o URI+label iff object-entity)
- to_uri percent-encoding incl. non-ASCII (definitions/extract.py:89-95)

Entity names deliberately include spaces (hyphenation), 'é'/'ï'
(UTF-8 percent-encoding %C3%A9 / %C3%AF) and '&' (%26) so the URI-minting
seam is driven through the gate, not just hypothesis tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import DEFAULT_COLLECTION

_DID = F.col("doc_id")


def _chunk_cols():
    return [
        F.concat(F.lit("urn:chunk:"), _DID.cast("string")).alias("chunk_id"),
        _DID.cast("string").alias("root_id"),
        F.lit(DEFAULT_COLLECTION).alias("collection"),
    ]


def planted_def_chunks(docs: DataFrame) -> DataFrame:
    """One chunk per document. doc_id % 11 == 0 rows carry no definition
    sentence (the zero-extraction case); % 7 rows plant a non-ASCII entity,
    % 13 rows a '&' entity, the rest plain two-token names."""
    n = (_DID % 97).cast("string")
    entity = (
        F.when(_DID % 7 == 0, F.concat(F.lit("café "), n))
        .when(_DID % 13 == 0, F.concat(F.lit("r&d "), n))
        .otherwise(F.concat(F.lit("term "), n))
    )
    definition = F.concat(
        F.lit("concept from "),
        F.col("source"),
        F.lit(" sized "),
        (F.col("n_chars") % 10).cast("string"),
    )
    text = F.when(_DID % 11 == 0, F.lit("no facts in this chunk")).otherwise(
        F.concat(entity, F.lit(" is defined as "), definition, F.lit("."))
    )
    return docs.select(*_chunk_cols(), text.alias("text"))


def planted_rel_chunks(docs: DataFrame) -> DataFrame:
    """One chunk per document: an entity-object relationship sentence
    (predicate rotates uses/contains/extends) plus a literal-object
    'produces value' sentence. doc_id % 11 == 0 rows carry neither."""
    s_ent = F.concat(F.lit("proc "), (_DID % 53).cast("string"))
    o_ent = F.when(
        _DID % 5 == 0, F.concat(F.lit("naïve "), (_DID % 31).cast("string"))
    ).otherwise(F.concat(F.lit("unit "), (_DID % 31).cast("string")))
    pred = (
        F.when(_DID % 3 == 0, F.lit("uses"))
        .when(_DID % 3 == 1, F.lit("contains"))
        .otherwise(F.lit("extends"))
    )
    value = (_DID % 29).cast("string")
    text = F.when(_DID % 11 == 0, F.lit("no facts in this chunk")).otherwise(
        F.concat(
            s_ent, F.lit(" "), pred, F.lit(" "), o_ent, F.lit(". "),
            s_ent, F.lit(" produces value "), value, F.lit("."),
        )
    )
    return docs.select(*_chunk_cols(), text.alias("text"))


def planted_mention_triples(docs: DataFrame) -> DataFrame:
    """rdfs:label triples whose labels form near-duplicate clusters
    ('entity N' vs 'entity Ns'), for oracle-gating the linking flow:
    blocking → trigram-Jaccard → connected components → canonical minimum.
    ASCII labels so the oracle URI is prefix || hyphenated label."""
    from .constants import DEFAULT_GRAPH, OTYPE_LITERAL, RDF_LABEL, TRUSTGRAPH_ENTITIES

    base = F.concat(F.lit("entity "), (_DID % 40).cast("string"))
    label = F.when(_DID % 3 == 0, F.concat(base, F.lit("s"))).otherwise(base)
    uri = F.concat(F.lit(TRUSTGRAPH_ENTITIES), F.regexp_replace(label, " ", "-"))
    return docs.select(
        F.lit(DEFAULT_COLLECTION).alias("collection"),
        F.lit(DEFAULT_GRAPH).alias("g"),
        uri.alias("s"),
        F.lit(RDF_LABEL).alias("p"),
        label.alias("o"),
        F.lit(OTYPE_LITERAL).alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )
