"""Universal decoder: section strategies, assembly, page dispatch.

Mirrors trustgraph-unstructured/trustgraph/decoding/universal/
strategies.py:13-150 and processor.py:73-517. Parity strategy: a
literal Python replay of each reference strategy runs over randomized
element lists and must agree with the window/fold implementations.
"""

import random

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.unstructured import (
    assemble_sections,
    assign_sections,
    decode_universal,
    partition_documents,
    text_partition,
    universal_prov_triples,
)

_ELS = ("doc_id string, mime_type string, element_idx int, "
        "category string, text string, text_as_html string, "
        "page_number int")


# --- reference strategy replays (strategies.py:13-150) -----------------

def _replay(strategy, els, element_count=20, max_size=4000):
    """Return the 1-based group index per element, reference semantics."""
    if not els:
        return []
    if strategy == "whole-document":
        return [1] * len(els)
    if strategy == "heading":
        if not any(c == "Title" for c, _ in els):
            return [1] * len(els)
        out, g, n_in_group = [], 1, 0
        for c, _ in els:
            if c == "Title" and n_in_group:
                g += 1
                n_in_group = 0
            out.append(g)
            n_in_group += 1
        return out
    if strategy == "element-type":
        out, g, prev = [], 1, None
        for c, _ in els:
            is_t = c == "Table"
            if prev is not None and is_t != prev:
                g += 1
            out.append(g)
            prev = is_t
        return out
    if strategy == "count":
        return [i // element_count + 1 for i in range(len(els))]
    # size
    out, g, sz, cnt = [], 1, 0, 0
    for _, t in els:
        n = len(t or "")
        if cnt and sz + n > max_size:
            g += 1
            sz, cnt = 0, 0
        out.append(g)
        sz += n
        cnt += 1
    return out


@pytest.mark.parametrize("strategy,kw", [
    ("whole-document", {}),
    ("heading", {}),
    ("element-type", {}),
    ("count", {"element_count": 3}),
    ("size", {"max_size": 25}),
])
def test_strategy_matches_reference_replay(spark, strategy, kw):
    rng = random.Random(17)
    cats = ["NarrativeText", "Title", "Table", "ListItem"]
    rows, expected = [], {}
    for doc in range(12):
        els = [(rng.choice(cats), "x" * rng.randint(0, 15))
               for _ in range(rng.randint(1, 14))]
        for i, (c, t) in enumerate(els):
            rows.append((f"d{doc}", "text/plain", i, c, t, None, None))
        expected[f"d{doc}"] = _replay(strategy, els, **kw)
    # one single-element and one oversize-element doc (size edge cases)
    rows.append(("one", "text/plain", 0, "NarrativeText", "y" * 100,
                 None, None))
    expected["one"] = [1]
    df = spark.createDataFrame(rows, _ELS)
    got = assign_sections(df, strategy, **kw).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r["doc_id"], {})[r["element_idx"]] = \
            r["section_idx"]
    for doc, exp in expected.items():
        assert [by_doc[doc][i] for i in range(len(exp))] == exp, \
            (strategy, doc)


def test_size_strategy_oversize_element_is_own_section(spark):
    # strategies.py:105-135 — an element exceeding max_size still lands
    # whole in one section; the NEXT element opens a new one
    df = spark.createDataFrame(
        [("d", "t", 0, "NarrativeText", "a" * 100, None, None),
         ("d", "t", 1, "NarrativeText", "b", None, None),
         ("d", "t", 2, "NarrativeText", "c" * 100, None, None)],
        _ELS)
    got = {r["element_idx"]: r["section_idx"]
           for r in assign_sections(df, "size", max_size=10).collect()}
    assert got == {0: 1, 1: 2, 2: 3}


def test_unknown_strategy_raises(spark):
    df = spark.createDataFrame(
        [("d", "t", 0, "NarrativeText", "a", None, None)], _ELS)
    with pytest.raises(ValueError, match="Unknown section strategy"):
        assign_sections(df, "nope")


def test_assemble_rules(spark):
    # processor.py:73-115: tables prefer html (empty-string html falls
    # back to text), images are counted + typed but excluded from text,
    # empty texts dropped from the join, element_types sorted csv
    df = spark.createDataFrame(
        [("d", "t", 0, "NarrativeText", "hello", None, None),
         ("d", "t", 1, "Table", "fallback", "<table>x</table>", None),
         ("d", "t", 2, "Table", "plain tbl", "", None),
         ("d", "t", 3, "Image", "alt text", None, None),
         ("d", "t", 4, "NarrativeText", "", None, None),
         ("d", "t", 5, "NarrativeText", "world", None, None)],
        _ELS)
    out = assemble_sections(df, ["doc_id"]).collect()
    assert len(out) == 1
    r = out[0]
    assert r["text"] == "hello\n\n<table>x</table>\n\nplain tbl\n\nworld"
    assert r["element_types"] == "Image,NarrativeText,Table"
    assert r["table_count"] == 2 and r["image_count"] == 1
    assert r["char_length"] == len(r["text"])


def test_assemble_skips_whitespace_empty_sections(spark):
    df = spark.createDataFrame(
        [("d", "t", 0, "NarrativeText", "  ", None, None),
         ("e", "t", 0, "NarrativeText", "kept", None, None)],
        _ELS)
    out = assemble_sections(df, ["doc_id"]).collect()
    assert [r["doc_id"] for r in out] == ["e"]


def test_decode_page_vs_section_dispatch(spark):
    rows = [
        # page-based by mime (pdf), pages 2 and missing->1
        ("p1", "application/pdf", 0, "NarrativeText", "pg2 text", None, 2),
        ("p1", "application/pdf", 1, "NarrativeText", "pg1 text", None,
         None),
        # page-based by element page numbers despite text mime
        ("p2", "text/plain", 0, "NarrativeText", "has page", None, 3),
        # section path: heading-free -> whole document
        ("s1", "text/plain", 0, "NarrativeText", "a", None, None),
        ("s1", "text/plain", 1, "NarrativeText", "b", None, None),
    ]
    out = decode_universal(spark.createDataFrame(rows, _ELS),
                           strategy="whole-document")
    secs = {(r["doc_id"], r["label"]): r
            for r in out["sections"].collect()}
    assert ("p1", "Page 1") in secs and ("p1", "Page 2") in secs
    assert ("p2", "Page 3") in secs
    assert ("s1", "Section 1") in secs
    s = secs[("s1", "Section 1")]
    assert s["text"] == "a\n\nb" and s["section"] is True
    assert s["entity_uri"].startswith("urn:section:")
    assert secs[("p1", "Page 2")]["entity_uri"].startswith("urn:page:")
    assert secs[("p1", "Page 2")]["parent_uri"] == "urn:doc:p1"
    assert secs[("p1", "Page 2")]["page_number"] == 2


def test_image_parenting(spark):
    rows = [
        # page 1 has text -> its image parents to the page section
        ("p", "application/pdf", 0, "NarrativeText", "text", None, 1),
        ("p", "application/pdf", 1, "Image", None, None, 1),
        # page 2 is image-only -> empty section skipped, image parents
        # to the doc (processor.py:473 page_uri_str or doc_uri_str)
        ("p", "application/pdf", 2, "Image", None, None, 2),
        # non-page doc: image parents to the doc, label plain 'Image'
        ("s", "text/plain", 0, "NarrativeText", "body", None, None),
        ("s", "text/plain", 1, "Image", None, None, None),
    ]
    out = decode_universal(spark.createDataFrame(rows, _ELS))
    secs = {r["label"]: r for r in
            out["sections"].where("doc_id = 'p'").collect()}
    assert set(secs) == {"Page 1"}  # page 2 emitted nothing
    # sections never count images: the flow filters them pre-assembly
    assert secs["Page 1"]["image_count"] == 0
    assert "Image" not in secs["Page 1"]["element_types"]
    imgs = {(r["doc_id"], r["page_number"]): r
            for r in out["images"].collect()}
    assert imgs[("p", 1)]["parent_uri"] == secs["Page 1"]["entity_uri"]
    assert imgs[("p", 1)]["label"] == "Image from page 1"
    assert imgs[("p", 2)]["parent_uri"] == "urn:doc:p"
    assert imgs[("s", None)]["parent_uri"] == "urn:doc:s"
    assert imgs[("s", None)]["label"] == "Image"


def test_universal_prov_gates_counts(spark):
    rows = [
        ("d", "text/plain", 0, "NarrativeText", "text", None, None),
        ("d", "text/plain", 1, "Table", "t", "<table/>", None),
        ("e", "text/plain", 0, "NarrativeText", "plain", None, None),
        ("e", "text/plain", 1, "Image", None, None, None),
    ]
    out = decode_universal(spark.createDataFrame(rows, _ELS))
    prov = universal_prov_triples(out, timestamp="2026-01-01T00:00:00Z")
    tg = "https://trustgraph.ai/ns/"
    by = {}
    for r in prov.collect():
        by.setdefault(r["s"], {}).setdefault(r["p"], []).append(r["o"])
    d_sec = [u for u in by if u.startswith("urn:section:")
             and tg + "tableCount" in by[u]]
    assert len(d_sec) == 1
    assert by[d_sec[0]][tg + "tableCount"] == ["1"]
    assert by[d_sec[0]][tg + "elementTypes"] == ["NarrativeText,Table"]
    # e's section has zero tables -> gated off (processor.py:287-289)
    e_secs = [u for u in by if u.startswith("urn:section:")
              and u not in d_sec]
    assert e_secs and all(tg + "tableCount" not in by[u]
                          and tg + "imageCount" not in by[u]
                          for u in e_secs)
    # the image entity: typed Image, labeled, no charLength
    img = [u for u in by if u.startswith("urn:image:")]
    assert len(img) == 1
    assert tg + "Image" in by[img[0]][
        "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"]
    assert tg + "charLength" not in by[img[0]]


def test_partition_seam_text_real_binary_stub(spark):
    docs = spark.createDataFrame(
        [("a", bytearray("para one\n\n\npara two\n\nthree".encode()),
          "text/plain")],
        "doc_id string, content binary, mime_type string")
    els = partition_documents(docs).collect()
    assert [(r["element_idx"], r["category"], r["text"]) for r in els] == [
        (0, "NarrativeText", "para one"),
        (1, "NarrativeText", "para two"),
        (2, "NarrativeText", "three"),
    ]
    pdf = spark.createDataFrame(
        [("b", bytearray(b"%PDF-1.4"), "application/pdf")],
        "doc_id string, content binary, mime_type string")
    with pytest.raises(Exception, match="no partitioner"):
        partition_documents(pdf).collect()


def test_text_partition_pure():
    assert text_partition(b"a\n\nb\n\n\n\nc", "text/plain") == [
        {"category": "NarrativeText", "text": "a", "text_as_html": None,
         "page_number": None},
        {"category": "NarrativeText", "text": "b", "text_as_html": None,
         "page_number": None},
        {"category": "NarrativeText", "text": "c", "text_as_html": None,
         "page_number": None},
    ]


def test_end_to_end_partition_to_sections(spark):
    docs = spark.createDataFrame(
        [("a", bytearray(b"first block\n\nsecond block"), "text/plain")],
        "doc_id string, content binary, mime_type string")
    out = decode_universal(partition_documents(docs))
    secs = out["sections"].collect()
    assert len(secs) == 1
    assert secs[0]["text"] == "first block\n\nsecond block"
    assert secs[0]["label"] == "Section 1"
