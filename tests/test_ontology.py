"""Ontology-constrained validation (E5)."""

from pyspark.sql import functions as F

from trustgraph_spark.operators.ontology import (
    build_entity_uri_col,
    expand_prefixed_uris,
    validate_against_ontology,
)

TRIPLES_DDL = (
    "collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string"
)


def test_expand_prefixed_uris(spark):
    df = spark.createDataFrame(
        [("fo:Recipe",), ("http://already/uri",), ("unknown:X",)], "p string"
    )
    out = [
        r.p
        for r in expand_prefixed_uris(df, {"fo": "http://food.org/"}, "p").collect()
    ]
    assert "http://food.org/Recipe" in out
    assert "http://already/uri" in out
    assert "unknown:X" in out  # unknown prefix passes through


def test_validate_against_ontology(spark):
    triples = spark.createDataFrame(
        [
            ("default", "", "http://e/pasty", "http://o/hasIngredient", "http://e/beef", "u", "", ""),
            ("default", "", "http://e/pasty", "http://o/hasIngredient", "http://e/paris", "u", "", ""),  # range violation
            ("default", "", "http://e/pasty", "http://o/unknownProp", "x", "l", "", ""),  # unknown property
            ("default", "", "http://e/pasty", "http://o/note", "tasty", "l", "", ""),  # literal object, no range check
        ],
        TRIPLES_DDL,
    )
    props = spark.createDataFrame(
        [
            ("http://o/hasIngredient", "http://o/Recipe", "http://o/Food"),
            ("http://o/note", "http://o/Recipe", None),
        ],
        "property_uri string, domain string, range string",
    )
    types = spark.createDataFrame(
        [
            ("http://e/pasty", "http://o/Recipe"),
            ("http://e/beef", "http://o/Food"),
            ("http://e/paris", "http://o/City"),
        ],
        "entity_uri string, class_uri string",
    )
    out = validate_against_ontology(triples, props, types).collect()
    by_o = {r.o: r._valid for r in out}
    assert by_o["http://e/beef"] is True
    assert by_o["http://e/paris"] is False  # City fails range Food
    assert by_o["x"] is False  # unknown property
    assert by_o["tasty"] is True  # literal object, range not applied


def test_build_entity_uri(spark):
    """Reference examples (entity_normalizer.py:89-97)."""
    df = spark.createDataFrame(
        [("Cornish pasty", "fo/Recipe"), ("beef", "fo/Food")],
        "name string, type string",
    )
    got = [
        r.u
        for r in df.select(
            build_entity_uri_col(F.col("name"), F.col("type"), "food").alias("u")
        ).collect()
    ]
    assert got == [
        "https://trustgraph.ai/food/recipe-cornish-pasty",
        "https://trustgraph.ai/food/food-beef",
    ]
