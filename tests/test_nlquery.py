"""NL-question -> SPARQL -> answer orchestration (trustgraph_spark.nlquery).

Parity model: query/ontology/question_analyzer.py (deterministic regex
decomposition), ontology_matcher.py (query-variant selection top_k 15 /
threshold 0.6 + enhancements), sparql_generator.py (template shapes +
fallback), answer_generator.py (template shaping), query_service.py
(orchestration order + error shaping)."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.constants import RDF_LABEL, RDF_TYPE
from trustgraph_spark.nlquery import (
    GeneratedSPARQL,
    QuestionType,
    analyze_question,
    enhance_subset_for_query,
    generate_answer,
    generate_sparql,
    inference_rules,
    match_question_to_ontology,
    nl_graph_query,
    question_segments,
    subset_to_dicts,
)
from trustgraph_spark.operators.ontology import ELEMENTS_DDL

TRIPLES_DDL = (
    "collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string"
)
NS = "http://example.org/"


# --- question analysis (question_analyzer.py parity) ------------------------


@pytest.mark.parametrize(
    "question,qtype,answer_type",
    [
        ("What is a transformer?", QuestionType.FACTUAL, "text"),
        ("find all Device", QuestionType.RETRIEVAL, "list"),
        ("list the sensors in the lab", QuestionType.RETRIEVAL, "list"),
        # 'how many' sets the type but carries no aggregation KEYWORD, so
        # the answer type falls through to 'text' (reference
        # _determine_answer_type has no AGGREGATION branch)
        ("How many sensors are there?", QuestionType.AGGREGATION, "text"),
        ("count the devices", QuestionType.AGGREGATION, "number"),
        ("Is a GPU better than a CPU?", QuestionType.COMPARISON, "comparison"),
        ("how is Alice related to Bob", QuestionType.RELATIONSHIP, "text"),
        ("Is Berlin a city?", QuestionType.BOOLEAN, "boolean"),
        ("how to install spark", QuestionType.PROCESS, "text"),
        ("when did the run start", QuestionType.TEMPORAL, "datetime"),
        ("where is the gateway", QuestionType.SPATIAL, "location"),
        ("tell me about grids", QuestionType.FACTUAL, "text"),  # default
    ],
)
def test_question_type_classification(question, qtype, answer_type):
    c = analyze_question(question)
    assert c.question_type == qtype
    assert c.expected_answer_type == answer_type


def test_first_matching_type_wins_in_reference_order():
    # '^what is' (FACTUAL) fires before 'relationship between'
    # (RELATIONSHIP) because FACTUAL precedes it in the pattern table
    c = analyze_question("What is the relationship between Device and Hub?")
    assert c.question_type == QuestionType.FACTUAL


def test_entities_capitalized_and_quoted():
    c = analyze_question('find all Device near "main hall" at Data Center')
    assert c.entities == ["Device", "Data Center", "main hall"]


def test_aggregations_constraints_keywords():
    c = analyze_question("count sensors with voltage greater than 40")
    assert "count" in c.aggregations
    assert any("40" in x for x in c.constraints)
    assert "sensors" in c.keywords and "the" not in c.keywords
    # stop words and <3-char words excluded
    assert all(len(k) > 2 for k in c.keywords)


def test_question_segments_dedup_order():
    segs = question_segments("find all Device")
    assert segs[0] == "find all Device"
    assert "Device" in segs and "device" in segs
    assert len(segs) == len(set(segs))


# --- ontology fixtures ------------------------------------------------------


@pytest.fixture(scope="module")
def elements(spark):
    rows = [
        # (ontology, type, id, label, comment, subclass_of, domain, range, inverse_of)
        ("kb", "class", "device", None, None, None, None, None, None),
        ("kb", "class", "sensor", None, None, "device", None, None, None),
        ("kb", "objectProperty", "connects", None, None, None,
         "device", "sensor", "attached"),
        ("kb", "objectProperty", "attached", None, None, None,
         "sensor", "device", "connects"),
        # element texts tuned so cosine vs the question segments stays
        # below the 0.6 threshold (repeating 'device' in a property text
        # would legitimately pull it into the base selection): linkswith
        # ranges over sensor, sensorcount carries a dilution comment
        ("kb", "objectProperty", "linkswith", None, None, None,
         "device", "sensor", None),
        ("kb", "datatypeProperty", "sensorcount", None, "meter", None,
         "device", None, None),
    ]
    df = spark.createDataFrame(rows, ELEMENTS_DDL).cache()
    df.count()
    return df


def _base(spark, *ids):
    """Hand-built base selection over the kb fixture."""
    type_of = {
        "device": "class", "sensor": "class",
        "connects": "objectProperty", "attached": "objectProperty",
        "linkswith": "objectProperty", "sensorcount": "datatypeProperty",
    }
    return spark.createDataFrame(
        [("kb", type_of[i], i, "selected", 1.0) for i in ids],
        "ontology_id string, element_type string, element_id string, "
        "role string, score double",
    )


# --- query-variant matcher (ontology_matcher.py) ----------------------------


def test_match_retrieval_selects_class_and_domain_props(spark, elements):
    out = match_question_to_ontology("find all Device", elements)
    rows = {(r.element_id, r.role) for r in out.collect()}
    # 'Device' segment matches the device class at cosine 1.0
    assert ("device", "selected") in rows
    # RETRIEVAL -> properties with domain in selected classes as traversal
    assert ("connects", "traversal") in rows
    assert ("linkswith", "traversal") in rows
    assert ("sensorcount", "traversal") in rows
    # range-only hits are NOT added for retrieval questions
    assert ("attached", "traversal") not in rows


def test_enhance_relationship_adds_connecting_object_props(spark, elements):
    out = enhance_subset_for_query(
        _base(spark, "device"), elements, QuestionType.RELATIONSHIP
    )
    rows = {(r.element_id, r.role) for r in out.collect()}
    # domain hit (connects, linkswith) + range hit (attached); datatype
    # props excluded for relationship questions
    assert ("connects", "traversal") in rows
    assert ("attached", "traversal") in rows
    assert ("linkswith", "traversal") in rows
    assert ("sensorcount", "traversal") not in rows


def test_enhance_aggregation_adds_count_props(spark, elements):
    out = enhance_subset_for_query(
        _base(spark, "sensor"), elements, QuestionType.AGGREGATION
    )
    rows = {(r.element_id, r.role) for r in out.collect()}
    assert ("sensorcount", "traversal") in rows


def test_enhance_inverse_and_sibling(spark, elements):
    # selected object property 'connects' (FACTUAL -> no qtype traversal):
    # its inverse 'attached' joins as 'inverse'; same-domain sibling
    # 'linkswith' fills traversal (cap 3, none used)
    out = enhance_subset_for_query(
        _base(spark, "connects"), elements, QuestionType.FACTUAL
    )
    rows = {(r.element_id, r.role) for r in out.collect()}
    assert ("attached", "inverse") in rows
    assert ("linkswith", "sibling") in rows
    # datatype property with same domain is NOT a sibling (object only)
    assert ("sensorcount", "sibling") not in rows


def test_enhance_sibling_cap(spark):
    rows = [("kb", "objectProperty", "p0", None, None, None, "hub", "hub", None)]
    rows += [
        ("kb", "objectProperty", f"sib{i}", None, None, None, "hub", "hub", None)
        for i in range(5)
    ]
    elements = spark.createDataFrame(rows, ELEMENTS_DDL)
    out = enhance_subset_for_query(
        _base_generic(spark, [("kb", "objectProperty", "p0")]),
        elements,
        QuestionType.FACTUAL,
    )
    sibs = sorted(
        r.element_id for r in out.collect() if r.role == "sibling"
    )
    # cap 3 total traversal slots, 0 used -> first 3 by element_id
    assert sibs == ["sib0", "sib1", "sib2"]


def _base_generic(spark, keys):
    return spark.createDataFrame(
        [(o, t, i, "selected", 1.0) for (o, t, i) in keys],
        "ontology_id string, element_type string, element_id string, "
        "role string, score double",
    )


def test_inference_rules(spark, elements):
    subset = _base(spark, "sensor", "connects")
    rules = inference_rules(subset, elements)
    types = {r["type"] for r in rules}
    assert "transitivity" in types  # sensor declares subclass_of
    inv = [r for r in rules if r["type"] == "inverse"]
    assert {(r["property"], r["inverse"]) for r in inv} == {("connects", "attached")}


# --- SPARQL generation (sparql_generator.py) --------------------------------


def _subset_dicts(spark, elements, *ids):
    return subset_to_dicts(_base(spark, *ids), elements)


def test_template_retrieval(spark, elements):
    c = analyze_question("find all Device")
    sub = _subset_dicts(spark, elements, "device")
    g = generate_sparql(c, sub, namespace=NS)
    assert g.query_type == "SELECT"
    assert "rdf:type :device" in g.query
    assert "OPTIONAL { ?entity rdfs:label ?label }" in g.query
    assert g.variables == ["entity", "label"]
    assert g.complexity_score == 0.3


def test_template_retrieval_requires_exact_class_hit(spark, elements):
    # 'Devices' (plural) is not an exact lower-case class match -> the
    # retrieval template does NOT fire (sparql_generator.py:131-135);
    # generation falls through to the keyword fallback
    c = analyze_question("find all Devices")
    sub = _subset_dicts(spark, elements, "device")
    g = generate_sparql(c, sub, namespace=NS)
    assert "CONTAINS" in g.query
    assert g.explanation.startswith("Fallback")


def test_template_count(spark, elements):
    # the 'with ...' clause is what lands in constraints (pattern 1);
    # the bare 'greater than N' capture is just '40' and carries no
    # keyword, so it adds no FILTER — reference-faithful
    c = analyze_question("count Device with level greater than 40")
    sub = _subset_dicts(spark, elements, "device")
    g = generate_sparql(c, sub, namespace=NS)
    assert g.query_type == "SELECT"
    assert "(COUNT(?entity) AS ?count)" in g.query
    assert "FILTER(?value > 40)" in g.query


def test_template_boolean(spark, elements):
    # lowercase 'is' so the capitalized-phrase entity extractor sees
    # exactly [Alice, Robot] (a leading 'Is' would itself be an entity,
    # as in the reference)
    c = analyze_question("is Alice a Robot?")
    sub = _subset_dicts(spark, elements)  # no object properties selected
    g = generate_sparql(c, sub, namespace=NS)
    assert g.query_type == "ASK"
    assert ":Alice rdf:type :Robot ." in g.query


def test_translator_seam_and_validation(spark, elements):
    c = analyze_question("something with no template match")
    sub = _subset_dicts(spark, elements)

    calls = []

    def translator(question, subset):
        calls.append(question)
        return "SELECT ?s WHERE { ?s ?p ?o }"

    g = generate_sparql(c, sub, namespace=NS, translator=translator)
    assert calls == ["something with no template match"]
    assert g.explanation == "Generated by translator seam"

    # invalid translator output falls through to the fallback (:203-215)
    g2 = generate_sparql(
        c, sub, namespace=NS, translator=lambda q, s: "DELETE WHERE { ?s ?p ?o }"
    )
    assert g2.explanation.startswith("Fallback")
    assert "LIMIT 10" in g2.query


# --- answer shaping (answer_generator.py) -----------------------------------


def test_answer_templates():
    c_list = analyze_question("find all Device")
    a = generate_answer(
        c_list,
        [{"entity": "http://e/dev1"}, {"entity": "http://e/dev2"}],
        classes={"device": {}},
    )
    assert a["answer"] == "The device are: dev1, dev2."

    a1 = generate_answer(c_list, [{"entity": "http://e/dev1"}])
    assert a1["answer"] == "The value of Device is dev1."

    c_count = analyze_question("count the Devices")
    a2 = generate_answer(c_count, [{"count": 7}])
    assert a2["answer"] == "There are 7 Devices."
    # no capitalized entity -> the generic 'entities' noun (reference
    # _infer_entity_type fallback)
    a2b = generate_answer(analyze_question("how many devices"), [{"count": 7}])
    assert a2b["answer"] == "There are 7 entities."

    c_bool = analyze_question("Is Berlin a city?")
    a3 = generate_answer(c_bool, [], ask_result=True)
    assert a3["answer"] == "Yes, berlin a city is true."
    a4 = generate_answer(c_bool, [], ask_result=False)
    assert a4["answer"].startswith("No, ")

    c_fact = analyze_question("What is dev1 connected to?")
    a5 = generate_answer(c_fact, [{"x": "http://e/dev2", "y": "lab"}])
    assert a5["answer"] == "x: dev2, y: lab"

    a6 = generate_answer(c_fact, [])
    assert a6["answer"] == "No results were found for your query."


def test_supporting_facts_capped_at_five():
    c = analyze_question("find all Device")
    rows = [{"entity": f"e{i}"} for i in range(9)]
    a = generate_answer(c, rows)
    assert len(a["supporting_facts"]) == 5
    assert a["result_count"] == 9


# --- orchestration (query_service.py flow) ----------------------------------


@pytest.fixture(scope="module")
def kg_edges(spark):
    rows = []
    for i in range(4):
        rows.append(("default", "", f"{NS}dev{i}", RDF_TYPE, f"{NS}device",
                     "u", "", ""))
        rows.append(("default", "", f"{NS}dev{i}", RDF_LABEL, f"device {i}",
                     "l", "", ""))
    rows.append(("default", "", f"{NS}s0", RDF_TYPE, f"{NS}sensor", "u", "", ""))
    df = spark.createDataFrame(rows, TRIPLES_DDL).cache()
    df.count()
    return df


def test_nl_graph_query_end_to_end(spark, kg_edges, elements):
    out = nl_graph_query(kg_edges, elements, "find all Device", namespace=NS)
    assert out["metadata"]["query_type"] == "SELECT"
    assert out["confidence"] == 0.8
    got = {(r.entity, r.label) for r in out["result"].collect()}
    assert got == {(f"{NS}dev{i}", f"device {i}") for i in range(4)}
    assert out["answer"].startswith("The device are: ")
    assert set(out["answer"][len("The device are: "):-1].split(", ")) == {
        f"dev{i}" for i in range(4)
    }
    assert out["result_count"] == 4


def test_nl_graph_query_count(spark, kg_edges, elements):
    out = nl_graph_query(kg_edges, elements, "count Device entries",
                         namespace=NS)
    assert "(COUNT(?entity) AS ?count)" in out["sparql"].query
    assert out["answer"] == "There are 4 device."


def test_nl_graph_query_error_shaping(spark, kg_edges, elements):
    def broken(question, subset):
        raise RuntimeError("translator exploded")

    out = nl_graph_query(
        kg_edges, elements, "no template matches this sentence",
        translator=broken, namespace=NS,
    )
    assert out["confidence"] == 0.0
    assert out["answer"].startswith(
        "I encountered an error processing your query: "
    )
    assert "translator exploded" in out["metadata"]["error"]
    assert out["result"] is None


def test_mmr_pool_matches_pandas_normalization(spark):
    """mmr_normalized_pool (the oracle-able prefix) computes exactly the
    normalization mmr_select applies inside its pandas group."""
    from trustgraph_spark.operators.docrag import (
        mmr_normalized_pool,
        mmr_select,
    )

    rows = [
        ("q0", "c0", 0.9, "alpha beta"),
        ("q0", "c1", 0.5, "gamma delta"),
        ("q0", "c2", 0.1, "epsilon zeta"),
        ("q1", "c3", 0.7, "eta theta"),   # all-equal group -> 0.5
        ("q1", "c4", 0.7, "iota kappa"),
    ]
    cand = spark.createDataFrame(
        rows, "query_id string, chunk_id string, score double, text string"
    )
    pool = {
        (r.query_id, r.chunk_id): r.norm_score
        for r in mmr_normalized_pool(cand).collect()
    }
    assert pool[("q0", "c0")] == 1.0
    assert pool[("q0", "c1")] == 0.5
    assert pool[("q0", "c2")] == 0.0
    assert pool[("q1", "c3")] == 0.5 and pool[("q1", "c4")] == 0.5

    # with disjoint texts (zero overlap penalty), MMR selection order is
    # the normalized-relevance order — pinning the two paths together
    sel = mmr_select(cand, limit=3, lambda_mult=0.5).collect()
    order = [r.chunk_id for r in sel if r.query_id == "q0"]
    assert order == ["c0", "c1", "c2"]
