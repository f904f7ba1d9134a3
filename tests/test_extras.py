"""Secondary operators: topics, agent dialect, JSONL resilience, row
validation, reranker, provenance trace, collections, knowledge cores,
multimodal plumbing."""

import urllib.parse

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trustgraph_spark.constants import DEFINITION, RDF_LABEL, TRUSTGRAPH_ENTITIES
from trustgraph_spark.operators.admin import (
    OverlapReranker,
    delete_collection,
    export_knowledge_core,
    import_knowledge_core,
    rerank,
    trace_provenance,
)
from trustgraph_spark.operators.extract_extras import (
    parse_jsonl_py,
    to_uri_agent_py,
    topics_to_triples,
    validate_rows,
)


def test_agent_uri_dialect():
    """E4: no lowercase/hyphenation (extract/kg/agent/extract.py:114-115)."""
    assert to_uri_agent_py("Machine Learning") == (
        TRUSTGRAPH_ENTITIES + urllib.parse.quote("Machine Learning")
    )
    assert "Machine%20Learning" in to_uri_agent_py("Machine Learning")


def test_topics_triples(spark):
    t = spark.createDataFrame(
        [
            ("c1", "r1", "default", "Graph Theory", "study of graphs"),
            ("c1", "r1", "default", "", "skipped"),
            ("c1", "r1", "default", "Empty Def", ""),
        ],
        "chunk_id string, root_id string, collection string, topic string, definition string",
    )
    rows = topics_to_triples(t).collect()
    assert len(rows) == 2
    got = {(r.p, r.o) for r in rows}
    assert (RDF_LABEL, "Graph Theory") in got
    assert (DEFINITION, "study of graphs") in got


def test_parse_jsonl_resilience():
    """E9 incl. truncation resilience (prompt_manager.py:97-132; reference
    test test_prompt_manager.py:446-510)."""
    text = """```json
{"entity": "A", "definition": "first"}
{"entity": "B", "definition": "second"}
{"entity": "C", "defini
```"""
    objs = parse_jsonl_py(text)
    assert len(objs) == 2
    assert objs[0]["entity"] == "A"
    assert parse_jsonl_py("") == []
    assert parse_jsonl_py("not json at all") == []
    # non-dict lines skipped
    assert parse_jsonl_py('["array"]\n{"k": 1}') == [{"k": 1}]


def test_validate_rows(spark):
    fields = [
        {"name": "name", "type": "string", "primary": True},
        {"name": "status", "type": "string", "enum_values": ["open", "closed"]},
    ]
    objs = spark.createDataFrame(
        [
            ('{"name": "x", "status": "open"}',),
            ('{"name": "", "status": "open"}',),      # missing primary
            ('{"name": "y", "status": "weird"}',),    # enum violation
            ('{"name": "z"}',),                        # optional absent -> valid
        ],
        "obj_json string",
    )
    out = validate_rows(objs, fields).collect()
    valid = [r["name"] for r in out if r._valid]
    assert sorted(valid) == ["x", "z"]


def test_reranker(spark):
    cands = spark.createDataFrame(
        [
            ("what is spark", "spark is an engine"),
            ("what is spark", "databases store rows"),
            ("what is spark", "spark what engine is this"),
        ],
        "query string, text string",
    )
    top = rerank(cands, limit=2).collect()
    assert len(top) == 2
    assert top[0].text == "spark what engine is this" or top[0].score >= top[1].score
    assert all(r.score > 0 for r in top if r.rank == 1)


def test_collections_and_knowledge_core(spark, tmp_path):
    edges = spark.createDataFrame(
        [
            ("tenant_a", "", "s1", "p1", "o1", "u", "", ""),
            ("tenant_b", "", "s2", "p2", "o2", "u", "", ""),
        ],
        "collection string, g string, s string, p string, o string, otype string, dtype string, lang string",
    )
    kept = delete_collection(edges, "tenant_a")
    assert {r.collection for r in kept.collect()} == {"tenant_b"}

    export_knowledge_core(edges, None, str(tmp_path / "core"), "tenant_a")
    core = import_knowledge_core(spark, str(tmp_path / "core"))
    rows = core["triples"].collect()
    assert len(rows) == 1 and rows[0].s == "s1"


def test_trace_provenance(spark, tiny_chunks):
    """Content triple -> subgraph -> chunk derivation chain."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.operators.provenance import subgraph_provenance_triples

    content = definitions_to_triples(extract_definitions(tiny_chunks, RuleExtractor()))
    prov = subgraph_provenance_triples(content, "kg-extract-definitions")
    sample = content.limit(1).collect()[0]
    chain = trace_provenance(
        content.unionByName(prov), sample.s, sample.p, sample.o
    ).collect()
    hops = {r.hop for r in chain}
    assert 0 in hops  # the containing subgraph
    assert 1 in hops  # derived-from chunk
    nodes1 = {r.node for r in chain if r.hop == 1}
    assert any(n.startswith("urn:chunk:") for n in nodes1)


def test_multimodal_features(spark):
    from trustgraph_spark.multimodal import (
        extract_media_features,
        frame_sample_plan,
        synth_media,
    )

    media = synth_media(spark, 12)
    feats = extract_media_features(media).collect()
    assert len(feats) == 12
    assert all(len(r.feature) == 16 for r in feats)
    # deterministic
    feats2 = {r.media_id: r.feature for r in extract_media_features(media).collect()}
    assert feats2["m0"] == [r.feature for r in feats if r.media_id == "m0"][0]

    frames = frame_sample_plan(media, every_ms=1000)
    per_video = frames.groupBy("media_id").count().collect()
    assert all(r["count"] == 5 for r in per_video)  # 5000ms / 1000ms


def test_multimodal_strict_decode_raises(spark):
    from trustgraph_spark.multimodal import extract_media_features, strict_decode, synth_media

    media = synth_media(spark, 3)
    with pytest.raises(Exception):
        extract_media_features(media, decode_fn=strict_decode).collect()


def test_agent_combined_extraction_flow(spark):
    """E4 golden: type-discriminated single-prompt parse with object-entity
    default True and the agent URI dialect (quote only, no lower/hyphen)."""
    from trustgraph_spark.operators.extract_extras import (
        AgentExtractor,
        agent_entity_contexts,
        agent_extractions_to_triples,
        extract_agent,
    )

    jsonl = "\n".join(
        [
            "```json",
            '{"type": "definition", "entity": "Big Cat", "definition": "a feline"}',
            '{"type": "relationship", "subject": "Big Cat", "predicate": "eats",'
            ' "object": "Mouse"}',  # object-entity absent -> default True
            '{"type": "relationship", "subject": "Big Cat", "predicate": "weighs",'
            ' "object": "5kg", "object-entity": false}',
            '{"type": "topic", "topic": "ignored"}',
            "not json at all",
            "```",
        ]
    )
    chunks = spark.createDataFrame(
        [("c1", "r1", "default", "whatever text")],
        "chunk_id string, root_id string, collection string, text string",
    )
    ex = extract_agent(chunks, AgentExtractor(lambda t: jsonl))
    triples = agent_extractions_to_triples(ex)
    got = {(r.s, r.p, r.o, r.otype) for r in triples.collect()}

    E = "http://trustgraph.ai/e/"
    RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
    SKOS_DEF = "http://www.w3.org/2004/02/skos/core#definition"
    # agent dialect: quote() only -> 'Big%20Cat' (no lowercase, no hyphen)
    bc = E + "Big%20Cat"
    assert got == {
        (bc, RDFS_LABEL, "Big Cat", "l"),
        (bc, SKOS_DEF, "a feline", "l"),
        (bc, E + "eats", E + "Mouse", "u"),
        (bc, RDFS_LABEL, "Big Cat", "l"),
        (bc, E + "eats", E + "Mouse", "u"),
        (E + "eats", RDFS_LABEL, "eats", "l"),
        (E + "Mouse", RDFS_LABEL, "Mouse", "l"),
        (bc, E + "weighs", "5kg", "l"),
        (E + "weighs", RDFS_LABEL, "weighs", "l"),
    }

    ctx = agent_entity_contexts(ex).collect()
    assert len(ctx) == 1  # ONE context per definition (definition only)
    assert ctx[0].entity_uri == bc and ctx[0].context == "a feline"


def test_agent_extraction_empty_and_invalid_only(spark):
    from trustgraph_spark.operators.extract_extras import (
        AgentExtractor,
        agent_extractions_to_triples,
        extract_agent,
    )

    chunks = spark.createDataFrame(
        [("c1", "r1", "default", "x"), ("c2", "r1", "default", "y")],
        "chunk_id string, root_id string, collection string, text string",
    )
    ex = extract_agent(chunks, AgentExtractor(lambda t: "garbage\nmore garbage"))
    assert agent_extractions_to_triples(ex).count() == 0


def test_multimodal_resize_plumbing(spark):
    from trustgraph_spark.multimodal import resize_images, synth_media

    media = synth_media(spark, n=9)
    out = resize_images(media, 32, 32)
    rows = {r.media_id: r for r in out.collect()}
    assert len(rows) == 9  # non-images pass through
    for r in rows.values():
        if r.kind == "image":
            assert r.width == 32 and r.height == 32 and len(r.payload) == 4
        else:
            assert r.duration_ms == 5000  # untouched metadata
    # deterministic: same input -> same resized payload
    again = {r.media_id: bytes(r.payload) for r in resize_images(media, 32, 32).collect()}
    assert all(bytes(rows[k].payload) == v for k, v in again.items())


def test_decode_documents_pdf_plumbing(spark):
    """decoding/pdf plumbing: %PDF- magic validation drops non-PDF rows
    (the reference logs and ignores), base64 payloads decode, and the
    page seam explodes one row per page; strict mode raises loudly."""
    import base64

    import pytest as _pytest

    from trustgraph_spark.multimodal import (
        decode_documents,
        fake_pdf_pages,
        strict_pdf_pages,
    )

    rows = [
        ("d1", b"%PDF-1.7 fake body one"),
        ("d2", b"  \n%PDF-1.4 leading whitespace ok"),
        ("d3", b"GIF89a not a pdf"),
        ("d4", None),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, data binary")
    out = decode_documents(docs).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append((r.page, r.text))
    assert set(by_doc) == {"d1", "d2"}  # d3 fails magic, d4 null
    assert [p for p, _ in sorted(by_doc["d1"])] == list(
        range(1, len(fake_pdf_pages(rows[0][1])) + 1)
    )
    assert by_doc["d1"] == [
        (i + 1, t) for i, t in enumerate(fake_pdf_pages(rows[0][1]))
    ]

    # base64 transport form (pdf_decoder.py:104-110)
    b64 = spark.createDataFrame(
        [("e1", base64.b64encode(b"%PDF-1.5 via b64"))],
        "doc_id string, data binary",
    )
    out64 = decode_documents(b64, base64_encoded=True).collect()
    assert {r.doc_id for r in out64} == {"e1"}

    with _pytest.raises(Exception):
        decode_documents(docs, pages_fn=strict_pdf_pages).collect()


def test_decode_documents_malformed_base64_drops(spark):
    """A malformed-base64 row must DROP (reference log-and-ignore), not
    abort the job under ANSI mode (review r3)."""
    import base64

    from trustgraph_spark.multimodal import decode_documents

    rows = [
        ("ok", base64.b64encode(b"%PDF-1.4 good")),
        ("bad", b"!!not-base64!!"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, data binary")
    out = decode_documents(docs, base64_encoded=True).collect()
    assert {r.doc_id for r in out} == {"ok"}
