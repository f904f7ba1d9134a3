"""OntoRAG extraction parsing + triple conversion parity tests
(reference: extract/kg/ontology/simplified_parser.py, triple_converter.py,
entity_normalizer.py; validation matrix mirrors
tests/unit/test_extract/test_ontology/test_triple_converter_validation.py)."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.constants import (
    OTYPE_LITERAL,
    OTYPE_URI,
    RDF_LABEL,
    RDF_TYPE,
)
from trustgraph_spark.operators.ontology import (
    class_ancestors,
    convert_extraction_triples,
    extract_ontology_objects,
    parse_extraction_response,
)

ELEMENTS_DDL = (
    "ontology_id string, element_type string, element_id string, "
    "label string, comment string, subclass_of string, domain string, "
    "range string, inverse_of string"
)


# ---------------------------------------------------------------------------
# parse_extraction_response (simplified_parser.py:49-346)
# ---------------------------------------------------------------------------


class TestParseExtractionResponse:
    def test_jsonl_format(self):
        r = parse_extraction_response([
            {"type": "entity", "entity": "Alice", "entity_type": "Person"},
            {"type": "relationship", "subject": "Alice",
             "subject_type": "Person", "relation": "worksFor",
             "object": "Acme", "object_type": "Company"},
            {"type": "attribute", "entity": "Alice",
             "entity_type": "Person", "attribute": "age", "value": "30"},
        ])
        assert len(r.entities) == 1 and r.entities[0].entity == "Alice"
        assert len(r.relationships) == 1
        assert r.relationships[0].relation == "worksFor"
        assert len(r.attributes) == 1 and r.attributes[0].value == "30"

    def test_jsonl_entity_uses_entity_type_key(self):
        # 'type' is the discriminator in JSONL, so {'type': 'entity',
        # 'type': ...} can't carry the class — 'entity_type' does (:211-239)
        r = parse_extraction_response(
            [{"type": "entity", "entity": "A", "entity_type": "T"}])
        assert r.entities[0].type == "T"
        r = parse_extraction_response([{"type": "entity", "entity": "A"}])
        assert r.entities == []

    def test_legacy_format(self):
        r = parse_extraction_response({
            "entities": [{"entity": "Alice", "type": "Person"}],
            "relationships": [
                {"subject": "Alice", "subject-type": "Person",
                 "relation": "worksFor", "object": "Acme",
                 "object-type": "Company"}],
            "attributes": [
                {"entity": "Alice", "entity-type": "Person",
                 "attribute": "age", "value": 30}],
        })
        assert r.entities[0].type == "Person"
        assert r.relationships[0].object_type == "Company"
        assert r.attributes[0].value == "30"  # number stringified

    def test_string_response_parsed(self):
        r = parse_extraction_response(
            '[{"type": "entity", "entity": "A", "entity_type": "T"}]')
        assert len(r.entities) == 1

    def test_malformed_json_returns_none(self):
        assert parse_extraction_response("{ not json") is None

    def test_unexpected_type_returns_none(self):
        assert parse_extraction_response(42) is None

    def test_kebab_and_snake_case_both_accepted(self):
        for key in ("subject-type", "subject_type"):
            r = parse_extraction_response({"relationships": [
                {"subject": "A", key: "T", "relation": "r",
                 "object": "B", "object-type": "T2"}]})
            assert r.relationships[0].subject_type == "T"

    def test_invalid_items_skipped_resiliently(self):
        r = parse_extraction_response([
            "not a dict",
            {"type": "mystery"},
            {"type": "entity", "entity": "", "entity_type": "T"},
            {"type": "entity", "entity": "ok", "entity_type": "T"},
            {"type": "relationship", "subject": "A"},
            {"type": "attribute", "entity": "A", "entity_type": "T",
             "attribute": "a"},
        ])
        assert [e.entity for e in r.entities] == ["ok"]
        assert r.relationships == [] and r.attributes == []

    def test_non_string_fields_rejected(self):
        r = parse_extraction_response(
            [{"type": "entity", "entity": 7, "entity_type": "T"}])
        assert r.entities == []

    def test_non_list_sections_treated_empty(self):
        r = parse_extraction_response(
            {"entities": "oops", "relationships": {}, "attributes": None})
        assert (r.entities, r.relationships, r.attributes) == ([], [], [])

    def test_bool_value_stringified(self):
        r = parse_extraction_response({"attributes": [
            {"entity": "A", "entity_type": "T", "attribute": "a",
             "value": True}]})
        assert r.attributes[0].value == "True"


# ---------------------------------------------------------------------------
# Spark conversion (triple_converter.py:21-230 as broadcast joins)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def org_elements(spark):
    # Person > Employee > Manager chain, mirroring the reference
    # validation-test ontology
    return spark.createDataFrame(
        [
            ("org", "class", "Person", None, None, None, None, None, None),
            ("org", "class", "Employee", None, None, "Person",
             None, None, None),
            ("org", "class", "Manager", None, None, "Employee",
             None, None, None),
            ("org", "class", "Product", None, None, None, None, None, None),
            ("org", "objectProperty", "worksFor", None, None, None,
             "Person", "Product", None),
            ("org", "objectProperty", "manages", None, None, None,
             "Manager", "Employee", None),
            ("org", "objectProperty", "relatedTo", None, None, None,
             None, None, None),
            ("org", "datatypeProperty", "employeeId", None, None, None,
             "Employee", None, None),
        ],
        ELEMENTS_DDL,
    )


def _parsed(spark, rows):
    return spark.createDataFrame(
        rows,
        "chunk_id string, kind string, entity string, entity_type string, "
        "subject string, subject_type string, relation string, "
        "object string, object_type string, attribute string, value string",
    )


def _rel(subject, stype, relation, obj, otype_):
    return ("c1", "relationship", None, None, subject, stype, relation,
            obj, otype_, None, None)


def _attr(entity, etype, attribute, value):
    return ("c1", "attribute", entity, etype, None, None, None, None, None,
            attribute, value)


def _ent(entity, etype):
    return ("c1", "entity", entity, etype, None, None, None, None, None,
            None, None)


def _convert(spark, elements, rows):
    out = convert_extraction_triples(
        _parsed(spark, rows), elements, "org"
    ).collect()
    return [(r.s, r.p, r.o, r.otype) for r in out]


class TestClassAncestors:
    def test_chain(self, spark, org_elements):
        pairs = {(r.class_id, r.ancestor)
                 for r in class_ancestors(org_elements).collect()}
        assert pairs == {
            ("Employee", "Person"),
            ("Manager", "Employee"), ("Manager", "Person"),
        }

    def test_cycle_guard(self, spark):
        el = spark.createDataFrame(
            [("o", "class", "A", None, None, "B", None, None, None),
             ("o", "class", "B", None, None, "A", None, None, None)],
            ELEMENTS_DDL)
        pairs = {(r.class_id, r.ancestor)
                 for r in class_ancestors(el).collect()}
        # reference walk (:35-47) stops only when a parent REPEATS, so a
        # 2-cycle puts the class itself among its ancestors — kept as-is
        assert pairs == {("A", "B"), ("A", "A"), ("B", "A"), ("B", "B")}


class TestConvertEntities:
    def test_type_and_label_triples(self, spark, org_elements):
        out = _convert(spark, org_elements, [_ent("Alice Smith", "Person")])
        uri = "https://trustgraph.ai/org/person-alice-smith"
        assert (uri, RDF_TYPE,
                "https://trustgraph.ai/ontology/org#Person",
                OTYPE_URI) in out
        assert (uri, RDF_LABEL, "Alice Smith", OTYPE_LITERAL) in out
        assert len(out) == 2

    def test_unknown_class_skips_both(self, spark, org_elements):
        assert _convert(spark, org_elements, [_ent("X", "Alien")]) == []


class TestConvertRelationships:
    def test_valid_domain_and_range(self, spark, org_elements):
        out = _convert(spark, org_elements,
                       [_rel("Alice", "Person", "worksFor",
                             "Widget", "Product")])
        assert out == [(
            "https://trustgraph.ai/org/person-alice",
            "https://trustgraph.ai/ontology/org#worksFor",
            "https://trustgraph.ai/org/product-widget", OTYPE_URI)]

    def test_domain_violation_rejected(self, spark, org_elements):
        assert _convert(spark, org_elements,
                        [_rel("Widget", "Product", "worksFor",
                              "Thing", "Product")]) == []

    def test_range_violation_rejected(self, spark, org_elements):
        assert _convert(spark, org_elements,
                        [_rel("Alice", "Person", "worksFor",
                              "Bob", "Person")]) == []

    def test_transitive_subclass_matches_domain(self, spark, org_elements):
        # Manager -> Employee -> Person; worksFor domain is Person
        out = _convert(spark, org_elements,
                       [_rel("Carol", "Manager", "worksFor",
                             "Widget", "Product")])
        assert len(out) == 1

    def test_subclass_matches_range(self, spark, org_elements):
        # manages range Employee; Manager is its subclass
        out = _convert(spark, org_elements,
                       [_rel("Carol", "Manager", "manages",
                             "Dan", "Manager")])
        assert len(out) == 1

    def test_superclass_does_not_match_subclass_constraint(
            self, spark, org_elements):
        # manages domain Manager; Person is NOT a subclass of Manager
        assert _convert(spark, org_elements,
                        [_rel("Alice", "Person", "manages",
                              "Bob", "Employee")]) == []

    def test_unconstrained_property_allows_anything(self, spark,
                                                    org_elements):
        out = _convert(spark, org_elements,
                       [_rel("Widget", "Product", "relatedTo",
                             "Alice", "Person")])
        assert len(out) == 1

    def test_unknown_relation_skipped(self, spark, org_elements):
        assert _convert(spark, org_elements,
                        [_rel("A", "Person", "floats", "B", "Person")]) == []


class TestConvertAttributes:
    def test_valid_domain(self, spark, org_elements):
        out = _convert(spark, org_elements,
                       [_attr("Bob", "Employee", "employeeId", "E-1234")])
        assert out == [(
            "https://trustgraph.ai/org/employee-bob",
            "https://trustgraph.ai/ontology/org#employeeId",
            "E-1234", OTYPE_LITERAL)]

    def test_subclass_matches_domain(self, spark, org_elements):
        out = _convert(spark, org_elements,
                       [_attr("Carol", "Manager", "employeeId", "E-9")])
        assert len(out) == 1

    def test_domain_violation_rejected(self, spark, org_elements):
        assert _convert(spark, org_elements,
                        [_attr("Widget", "Product", "employeeId", "X")]) == []

    def test_unknown_attribute_skipped(self, spark, org_elements):
        assert _convert(spark, org_elements,
                        [_attr("Bob", "Employee", "nope", "X")]) == []


class TestExtractSeam:
    def test_three_formats_end_to_end(self, spark, org_elements):
        from trustgraph_spark.planted import planted_onto_responses

        chunks = spark.range(0, 12).select(
            F.col("id").cast("string").alias("chunk_id"),
            F.lit("irrelevant").alias("text"),
        )
        parsed = extract_ontology_objects(chunks, planted_onto_responses)
        pdf = parsed.toPandas()
        # doc 0 and 11 are malformed (% 11) -> no rows
        assert set(pdf.chunk_id) == {str(i) for i in range(1, 11)}
        kinds = pdf.groupby("kind").size().to_dict()
        assert set(kinds) == {"entity", "relationship", "attribute"}
        # fmt0 docs (3,6,9) emit two entities; junk items skipped
        assert (pdf[pdf.chunk_id == "3"].kind == "entity").sum() == 2

    def test_type_prefix_stripped_in_uri(self, spark):
        # "fo/Recipe" -> type part "recipe" (entity_normalizer.py:99-101)
        el = spark.createDataFrame(
            [("fo", "class", "fo/Recipe", None, None, None,
              None, None, None)], ELEMENTS_DDL)
        out = convert_extraction_triples(
            _parsed(spark, [_ent("Cornish pasty", "fo/Recipe")]), el, "fo"
        ).collect()
        subjects = {r.s for r in out}
        assert subjects == {"https://trustgraph.ai/fo/recipe-cornish-pasty"}
