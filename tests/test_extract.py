"""Extraction semantics vs the reference golden behavior
(tests/unit/test_extract/test_streaming_triples/test_definitions_batching.py,
test_relationships_batching.py, and
tests/integration/test_kg_extract_store_integration.py in /root/reference).
"""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trustgraph_spark.constants import (
    DEFINITION,
    OTYPE_LITERAL,
    OTYPE_URI,
    RDF_LABEL,
    TRUSTGRAPH_ENTITIES,
)
from trustgraph_spark.operators.extract import (
    FixtureExtractor,
    RuleExtractor,
    definitions_entity_contexts,
    definitions_to_triples,
    extract_definitions,
    extract_relationships,
    relationships_to_triples,
)


def one_chunk(spark, text="some text"):
    return spark.createDataFrame(
        [("chunk-1", "conv-1", "default", 0, text)],
        "chunk_id string, root_id string, collection string, turn_idx int, text string",
    )


def test_two_triples_per_definition(spark):
    """Integration-test parity: 3 definitions -> exactly 6 content triples
    (test_kg_extract_store_integration.py:284-292)."""
    defs = [
        {"entity": "Machine Learning", "definition": "AI subset that learns."},
        {"entity": "Neural Network", "definition": "Connected layers."},
        {"entity": "Deep Learning", "definition": "Many-layer networks."},
    ]
    chunks = one_chunk(spark)
    out = definitions_to_triples(extract_definitions(chunks, FixtureExtractor(defs=defs)))
    rows = out.collect()
    assert len(rows) == 6
    ml = TRUSTGRAPH_ENTITIES + "machine-learning"
    got = {(r.s, r.p, r.o, r.otype) for r in rows}
    assert (ml, RDF_LABEL, "Machine Learning", OTYPE_LITERAL) in got
    assert (ml, DEFINITION, "AI subset that learns.", OTYPE_LITERAL) in got
    assert all(r.g == "" for r in rows)
    assert all(r.chunk_id == "chunk-1" for r in rows)


def test_definitions_filtering(spark):
    """Empty-string and None entity/definition objects are skipped
    (definitions/extract.py:163-167; test_definitions_batching.py:257-332)."""
    defs = [
        {"entity": "", "definition": "x"},
        {"entity": "E", "definition": ""},
        {"entity": None, "definition": "x"},
        {"entity": "E2", "definition": None},
        {"entity": "Valid", "definition": "kept"},
    ]
    out = definitions_to_triples(
        extract_definitions(one_chunk(spark), FixtureExtractor(defs=defs))
    )
    rows = out.collect()
    assert len(rows) == 2
    assert {r.o for r in rows} == {"Valid", "kept"}


def test_empty_extraction_zero_rows(spark):
    """A chunk with zero valid objects produces zero output rows
    (test_kg_extract_store_integration.py:497-518)."""
    out = definitions_to_triples(
        extract_definitions(one_chunk(spark), FixtureExtractor(defs=[]))
    )
    assert out.count() == 0
    out2 = relationships_to_triples(
        extract_relationships(one_chunk(spark), FixtureExtractor(rels=[]))
    )
    assert out2.count() == 0


def test_entity_contexts_two_per_definition(spark):
    """2 EntityContexts per definition: name + definition context
    (definitions/extract.py:189-201, test_definitions_batching.py:207-220)."""
    defs = [{"entity": "Machine Learning", "definition": "A learning system."}]
    ec = definitions_entity_contexts(
        extract_definitions(one_chunk(spark), FixtureExtractor(defs=defs))
    ).collect()
    assert len(ec) == 2
    uri = TRUSTGRAPH_ENTITIES + "machine-learning"
    assert {(r.entity_uri, r.context) for r in ec} == {
        (uri, "Machine Learning"),
        (uri, "A learning system."),
    }
    assert all(r.chunk_id == "chunk-1" for r in ec)


def test_relationship_uri_object(spark):
    """object-entity=true: minted o URI + 4 triples (rel + 3 labels)
    (relationships/extract.py:160-195, test_relationships_batching.py:241-257)."""
    rels = [
        {
            "subject": "Machine Learning",
            "predicate": "is_subset_of",
            "object": "Artificial Intelligence",
            "object-entity": True,
        }
    ]
    rows = relationships_to_triples(
        extract_relationships(one_chunk(spark), FixtureExtractor(rels=rels))
    ).collect()
    assert len(rows) == 4
    s = TRUSTGRAPH_ENTITIES + "machine-learning"
    p = TRUSTGRAPH_ENTITIES + "is_subset_of"
    o = TRUSTGRAPH_ENTITIES + "artificial-intelligence"
    got = {(r.s, r.p, r.o, r.otype) for r in rows}
    assert (s, p, o, OTYPE_URI) in got
    assert (s, RDF_LABEL, "Machine Learning", OTYPE_LITERAL) in got
    assert (p, RDF_LABEL, "is_subset_of", OTYPE_LITERAL) in got
    assert (o, RDF_LABEL, "Artificial Intelligence", OTYPE_LITERAL) in got


def test_relationship_literal_object(spark):
    """object-entity=false: literal object, no o label -> 3 triples
    (test_relationships_batching.py:205-238)."""
    rels = [
        {
            "subject": "Machine Learning",
            "predicate": "processes",
            "object": "data patterns",
            "object-entity": False,
        }
    ]
    rows = relationships_to_triples(
        extract_relationships(one_chunk(spark), FixtureExtractor(rels=rels))
    ).collect()
    assert len(rows) == 3
    s = TRUSTGRAPH_ENTITIES + "machine-learning"
    p = TRUSTGRAPH_ENTITIES + "processes"
    got = {(r.s, r.p, r.o, r.otype) for r in rows}
    assert (s, p, "data patterns", OTYPE_LITERAL) in got
    assert not any(r.s.endswith("data-patterns") for r in rows)


def test_relationship_filtering(spark):
    """Empty/None s/p/o rows skipped (relationships/extract.py:146-152)."""
    rels = [
        {"subject": "", "predicate": "p", "object": "o", "object-entity": True},
        {"subject": "s", "predicate": None, "object": "o", "object-entity": True},
        {"subject": "s", "predicate": "p", "object": "", "object-entity": False},
        {"subject": "OK", "predicate": "rel", "object": "fine", "object-entity": True},
    ]
    rows = relationships_to_triples(
        extract_relationships(one_chunk(spark), FixtureExtractor(rels=rels))
    ).collect()
    assert len(rows) == 4  # only the valid one: rel + 3 labels


def test_uri_consistency_across_extractors(spark):
    """Same surface form -> same URI in both extractors
    (test_kg_extract_store_integration.py:218-241)."""
    defs = [{"entity": "Shared Entity", "definition": "d"}]
    rels = [
        {"subject": "Shared Entity", "predicate": "links", "object": "X",
         "object-entity": True}
    ]
    d_rows = definitions_to_triples(
        extract_definitions(one_chunk(spark), FixtureExtractor(defs=defs))
    ).collect()
    r_rows = relationships_to_triples(
        extract_relationships(one_chunk(spark), FixtureExtractor(rels=rels))
    ).collect()
    d_uri = {r.s for r in d_rows}
    r_uri = {r.s for r in r_rows if r.p != RDF_LABEL or r.o == "Shared Entity"}
    assert d_uri == {TRUSTGRAPH_ENTITIES + "shared-entity"}
    assert TRUSTGRAPH_ENTITIES + "shared-entity" in r_uri


def test_rule_extractor_parity_full_corpus(spark, tiny_transcripts, tiny_chunks):
    """End-to-end P/R vs golden derivation == 1.0 on the synthetic corpus
    (the BASELINE.json target is >= 0.95)."""
    from trustgraph_spark.synth import golden_triple_set

    ex = RuleExtractor()
    triples = definitions_to_triples(extract_definitions(tiny_chunks, ex)).unionByName(
        relationships_to_triples(extract_relationships(tiny_chunks, ex))
    )
    got = {(r.s, r.p, r.o, r.otype) for r in triples.collect()}
    src = tiny_transcripts.select("conv_id", "turn_idx", "text").collect()
    golden = golden_triple_set([(r.conv_id, r.turn_idx, r.text) for r in src])
    tp = len(got & golden)
    precision = tp / len(got)
    recall = tp / len(golden)
    assert precision == 1.0
    assert recall == 1.0
