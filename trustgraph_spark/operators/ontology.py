"""Ontology-constrained validation (E5, SURVEY.md §2.2).

Reference: extract/kg/ontology/extract.py — is_valid_triple (:650-696)
checks that a triple's predicate is a known ontology property and the
subject/object classes satisfy its domain/range; expand_prefixed_uris
(:697-745) resolves `prefix:local` names against the ontology's namespace
table; build_entity_uri (entity_normalizer.py:72-110) mints
`{base}/{ontology}/{type}-{name}` URIs.

Spark-first: the ontology is a small dimension (classes, properties with
domain/range, prefixes) — validation is broadcast joins + filters, never a
per-row Python check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..uris import normalize_entity_name_col


def expand_prefixed_uris(
    df: DataFrame, prefixes: dict[str, str], col: str
) -> DataFrame:
    """Resolve `prefix:local` values against the ontology prefix table
    (reference :697-745). Unknown prefixes pass through unchanged. Pure
    column expressions over a literal map."""
    c = F.col(col)
    pfx = F.split(c, ":", 2).getItem(0)
    local = F.split(c, ":", 2).getItem(1)
    expr = c
    for p, ns in prefixes.items():
        expr = F.when(
            pfx.eqNullSafe(p) & ~c.startswith("http"), F.concat(F.lit(ns), local)
        ).otherwise(expr)
    return df.withColumn(col, expr)


def validate_against_ontology(
    triples: DataFrame,
    properties: DataFrame,
    entity_types: DataFrame,
) -> DataFrame:
    """is_valid_triple as a DataFrame program: keep triples whose predicate
    exists in the ontology property table AND whose subject/object entity
    types satisfy the property's domain/range (when declared).

    properties: (property_uri, domain, range) — domain/range nullable class
    URIs. entity_types: (entity_uri, class_uri). Both are broadcast dims.
    Returns triples + _valid flag (invalid kept for diagnostics, as the
    reference logs-and-drops)."""
    props = F.broadcast(
        properties.select(
            F.col("property_uri").alias("p"),
            F.col("domain").alias("_dom"),
            F.col("range").alias("_rng"),
            F.lit(True).alias("_known"),
        )
    )
    types = F.broadcast(
        entity_types.select(
            F.col("entity_uri").alias("_e"), F.col("class_uri").alias("_cls")
        )
    )

    t = (
        triples.join(props, "p", "left")
        .join(
            types.withColumnRenamed("_e", "s").withColumnRenamed("_cls", "_s_cls"),
            "s",
            "left",
        )
        .join(
            types.withColumnRenamed("_e", "o").withColumnRenamed("_cls", "_o_cls"),
            "o",
            "left",
        )
    )
    dom_ok = F.col("_dom").isNull() | F.col("_dom").eqNullSafe(F.col("_s_cls"))
    rng_ok = F.col("_rng").isNull() | (
        (F.col("otype") != "u") | F.col("_rng").eqNullSafe(F.col("_o_cls"))
    )
    valid = F.coalesce(F.col("_known"), F.lit(False)) & dom_ok & rng_ok
    return t.withColumn("_valid", valid).drop("_dom", "_rng", "_s_cls", "_o_cls", "_known")


def build_entity_uri_col(
    name_col, type_col, ontology_id: str, base_uri: str = "https://trustgraph.ai"
):
    """build_entity_uri as native columns:
    {base}/{ontology}/{norm(type)}-{norm(name)} with the type's ontology
    prefix stripped (entity_normalizer.py:72-110)."""
    bare_type = F.element_at(F.split(type_col, "/"), -1)
    type_part = normalize_entity_name_col(bare_type)
    name_part = normalize_entity_name_col(name_col)
    return F.concat(
        F.lit(f"{base_uri}/{ontology_id}/"), type_part, F.lit("-"), name_part
    )
