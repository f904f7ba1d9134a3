"""Explainability provenance: emit chains + set-oriented reconstruction.

Mirrors trustgraph-base/trustgraph/api/explainability.py (from_triples
dispatch :85-118, per-type parsers :121-416, parse_edge_selection_triples
:419-443, fetch_graphrag_trace :735-864, fetch_docrag_trace :866-972,
list_sessions :1097-1150) and provenance/triples.py:97-833 emitters.

Parity strategy: a minimal independent Python replay of the reference's
from_triples dispatch runs over the collected triples and must agree with
the Spark groupBy parser for every subject (modulo the documented
sort_array ordering).
"""

import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.explain import (
    DC_TITLE,
    PROV_STARTED_AT_TIME,
    PROV_WAS_DERIVED_FROM,
    RDF_TYPE,
    TG,
    chunk_selections,
    derived_entity_prov_triples,
    docrag_session_triples,
    document_prov_triples,
    edge_selections,
    explain_entities,
    graphrag_session_triples,
    list_sessions,
    rag_traces,
)

GRAPHRAG_SESSIONS = [
    # (session_id, query, ts, concepts, entities, edge_count,
    #  selected_edges, document_id, in_token, out_token, model)
    ("s1", "who founded acme?", "2026-01-01T00:00:01Z",
     ["acme", "founder"], ["http://t/e/acme"], 7,
     [("http://t/e/acme", TG + "founder", "http://t/e/jane",
       "acme", "0.97", ""),
      ("http://t/e/jane", TG + "role", "http://t/e/ceo",
       "", "", "seed-adjacent")],
     "urn:doc:ans1", 11, 22, "test-model"),
    ("s2", "empty tail", "2026-01-01T00:00:02Z",
     [], [], 0, [], None, None, None, None),
]

DOCRAG_SESSIONS = [
    # (session_id, query, ts, concepts, chunk_count, chunk_ids,
    #  reranked, document_id, in_token, out_token, model)
    ("d1", "what is in chunk 9?", "2026-01-01T00:00:03Z",
     ["chunk"], 3, ["urn:chunk:9", "urn:chunk:4"],
     [("urn:chunk:9", "0.88"), ("", "0.5"), ("urn:chunk:4", "")],
     "urn:doc:ans2", None, None, None),
    ("d2", "no rerank", "2026-01-01T00:00:04Z",
     [], 0, [], [], None, 1, 2, None),
]

_GR_SCHEMA = (
    "session_id string, query string, ts string, "
    "concepts array<string>, entities array<string>, edge_count int, "
    "selected_edges array<struct<s:string,p:string,o:string,"
    "concept:string,score:string,reasoning:string>>, "
    "document_id string, in_token long, out_token long, model string"
)
_DR_SCHEMA = (
    "session_id string, query string, ts string, "
    "concepts array<string>, chunk_count int, chunk_ids array<string>, "
    "reranked array<struct<chunk_id:string,score:string>>, "
    "document_id string, in_token long, out_token long, model string"
)


@pytest.fixture(scope="module")
def store(spark):
    """Emitted provenance store: 2 GraphRAG + 2 DocRAG sessions, plus a
    sub-trace question (s1 gains a parent link) for list_sessions."""
    gr = spark.createDataFrame(GRAPHRAG_SESSIONS, _GR_SCHEMA)
    dr = spark.createDataFrame(DOCRAG_SESSIONS, _DR_SCHEMA)
    triples = graphrag_session_triples(gr).unionByName(
        docrag_session_triples(dr))
    # s2 is a sub-trace hanging off an agent iteration
    extra = triples.sparkSession.createDataFrame(
        [("default", "urn:graph:retrieval", "urn:trustgraph:question:s2",
          PROV_WAS_DERIVED_FROM, "urn:trustgraph:agent:a1/i1", "u",
          "", "")],
        "collection string, g string, s string, p string, o string, "
        "otype string, dtype string, lang string")
    return triples.unionByName(extra).cache()


# ---------------------------------------------------------------------------
# Independent replay of the reference parsers (explainability.py:85-443)
# ---------------------------------------------------------------------------

def _replay_entity(uri, triples):
    """Literal re-implementation of ExplainEntity.from_triples and the
    per-type parsers, over (p, o, otype) tuples."""
    types = [o for p, o, _ in triples if p == RDF_TYPE]

    def has(t):
        return TG + t in types

    out = {"uri": uri, "question_type": "", "query": "", "timestamp": "",
           "concepts": [], "edge_count": 0, "chunk_count": 0,
           "entities": [], "selected_edge_uris": [], "document": "",
           "reflection_type": "", "action": "", "arguments": "",
           "thought": "", "goals": [], "goal": "", "steps": [], "step": ""}

    def val(pred, default=""):
        for p, o, _ in triples:
            if p == pred:
                return o
        return default

    if has("GraphRagQuestion") or has("DocRagQuestion") \
            or has("AgentQuestion"):
        out["entity_type"] = "question"
        out["question_type"] = ("graph-rag" if has("GraphRagQuestion")
                                else "document-rag" if has("DocRagQuestion")
                                else "agent")
        out["query"] = val(TG + "query")
        out["timestamp"] = val(PROV_STARTED_AT_TIME)
    elif has("Grounding"):
        out["entity_type"] = "grounding"
        out["concepts"] = sorted(
            o for p, o, _ in triples if p == TG + "concept")
    elif has("Exploration"):
        out["entity_type"] = "exploration"
        for key, pred in (("edge_count", TG + "edgeCount"),
                          ("chunk_count", TG + "chunkCount")):
            try:
                out[key] = int(val(pred, "0") or "0")
            except ValueError:
                pass
        out["entities"] = sorted(
            o for p, o, _ in triples if p == TG + "entity")
    elif has("Focus"):
        out["entity_type"] = "focus"
        out["selected_edge_uris"] = sorted(
            o for p, o, ot in triples
            if p == TG + "selectedEdge" and ot == "u")
    elif has("Decomposition"):
        out["entity_type"] = "decomposition"
        out["goals"] = sorted(
            o for p, o, _ in triples if p == TG + "subagentGoal")
    elif has("Finding"):
        out["entity_type"] = "finding"
        out["goal"] = val(TG + "subagentGoal")
        out["document"] = val(TG + "document")
    elif has("Plan"):
        out["entity_type"] = "plan"
        out["steps"] = sorted(
            o for p, o, _ in triples if p == TG + "planStep")
    elif has("StepResult"):
        out["entity_type"] = "step-result"
        out["step"] = val(TG + "planStep")
        out["document"] = val(TG + "document")
    elif has("Synthesis"):
        out["entity_type"] = "synthesis"
        out["document"] = val(TG + "document")
    elif has("Observation") and not has("Reflection"):
        out["entity_type"] = "observation"
        out["document"] = val(TG + "document")
    elif has("Reflection"):
        out["entity_type"] = "reflection"
        out["reflection_type"] = ("thought" if has("Thought")
                                  else "observation" if has("Observation")
                                  else "")
        out["document"] = val(TG + "document")
    elif has("Analysis"):
        out["entity_type"] = "analysis"
        out["action"] = val(TG + "action")
        out["arguments"] = val(TG + "arguments")
        out["thought"] = val(TG + "thought")
    elif has("Conclusion"):
        out["entity_type"] = "conclusion"
        out["document"] = val(TG + "document")
    else:
        out["entity_type"] = "unknown"
    return out


def test_entity_parse_matches_reference_replay(store):
    by_subject = {}
    for r in store.collect():
        by_subject.setdefault(r["s"], []).append(
            (r["p"], r["o"], r["otype"]))
    expected = {u: _replay_entity(u, ts) for u, ts in by_subject.items()}

    got = {r["uri"]: r.asDict() for r in explain_entities(store).collect()}
    assert set(got) == set(expected)
    for uri, exp in expected.items():
        assert got[uri] == exp, uri


@pytest.mark.skipif(
    not __import__("os").path.exists("/root/testdata/sf0.001"),
    reason="sf0.001 testdata not present")
def test_entity_parse_agent_prov_integration(spark):
    """The parser consumes the agent provenance emitter's output: every
    subject classifies to a non-unknown type with the reference
    dispatch (incl. the Observation-vs-Reflection priority)."""
    from trustgraph_spark.agent import agent_prov_triples, react_tool_trace

    sf_dir = "/root/testdata/sf0.001"
    trace = react_tool_trace(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        spark.read.parquet(f"{sf_dir}/orders.parquet"))
    prov = agent_prov_triples(trace, timestamp="2026-01-01T00:00:00Z")
    ents = explain_entities(prov, graph=None)
    kinds = {r["entity_type"] for r in ents.collect()}
    assert kinds == {"question", "analysis", "reflection", "observation",
                     "conclusion"}
    refl = ents.where("entity_type = 'reflection'").collect()
    assert refl and all(r["reflection_type"] == "thought" for r in refl)
    ana = ents.where("entity_type = 'analysis'").limit(1).collect()[0]
    assert ana["action"] and ana["thought"].endswith("/thought")


def test_edge_selections_roundtrip(store):
    sels = {r["uri"]: r for r in edge_selections(store).collect()}
    assert set(sels) == {"urn:trustgraph:prov:edge:s1:0",
                         "urn:trustgraph:prov:edge:s1:1"}
    e0 = sels["urn:trustgraph:prov:edge:s1:0"]
    assert e0["edge"].asDict() == {
        "s": "http://t/e/acme", "p": TG + "founder", "o": "http://t/e/jane"}
    assert e0["concept"] == "acme" and e0["score"] == 0.97
    assert e0["reasoning"] == ""
    e1 = sels["urn:trustgraph:prov:edge:s1:1"]
    assert e1["score"] is None and e1["reasoning"] == "seed-adjacent"
    assert e1["concept"] == ""


def test_chunk_selections_skip_empty_chunk_id(store):
    sels = {r["uri"]: r for r in chunk_selections(store).collect()}
    # reranked index 1 had an empty chunk_id -> skipped by the emitter
    # (reference :763-766), so only indices 0 and 2 exist
    assert set(sels) == {"urn:trustgraph:prov:chunk:d1:0",
                         "urn:trustgraph:prov:chunk:d1:2"}
    assert sels["urn:trustgraph:prov:chunk:d1:0"]["score"] == 0.88
    assert sels["urn:trustgraph:prov:chunk:d1:2"]["score"] is None
    assert sels["urn:trustgraph:prov:chunk:d1:2"]["chunk_id"] == "urn:chunk:4"


def test_graphrag_trace_chain(store):
    traces = {r["question_uri"]: r
              for r in rag_traces(store, question_type="graph-rag").collect()}
    t1 = traces["urn:trustgraph:question:s1"]
    assert t1["query"] == "who founded acme?"
    assert t1["grounding_uri"] == "urn:trustgraph:prov:grounding:s1"
    assert t1["grounding_concepts"] == ["acme", "founder"]
    assert t1["exploration_uri"] == "urn:trustgraph:prov:exploration:s1"
    assert t1["exploration_edge_count"] == 7
    assert t1["focus_uri"] == "urn:trustgraph:prov:focus:s1"
    assert t1["focus_selected_edge_uris"] == [
        "urn:trustgraph:prov:edge:s1:0", "urn:trustgraph:prov:edge:s1:1"]
    assert t1["synthesis_uri"] == "urn:trustgraph:prov:synthesis:s1"
    assert t1["synthesis_document"] == "urn:doc:ans1"
    # s2 has the full chain too (emitter always writes the envelope)
    assert traces["urn:trustgraph:question:s2"]["synthesis_uri"] \
        == "urn:trustgraph:prov:synthesis:s2"


def test_docrag_trace_synthesis_skips_focus(store):
    traces = {r["question_uri"]: r
              for r in rag_traces(store,
                                  question_type="document-rag").collect()}
    t = traces["urn:trustgraph:docrag:d1"]
    assert t["exploration_uri"] == "urn:trustgraph:docrag:d1/exploration"
    assert t["exploration_chunk_count"] == 3
    # focus exists for d1 (reranked non-empty) but synthesis still
    # derives from exploration (reference :795-833)
    assert t["focus_uri"] == "urn:trustgraph:docrag:d1/focus"
    assert t["synthesis_uri"] == "urn:trustgraph:docrag:d1/synthesis"
    assert t["synthesis_document"] == "urn:doc:ans2"
    # d2: no reranked entries -> no focus entity at all, chain intact
    t2 = traces["urn:trustgraph:docrag:d2"]
    assert t2["focus_uri"] is None
    assert t2["synthesis_uri"] == "urn:trustgraph:docrag:d2/synthesis"


def test_partial_trace_left_preserved(spark):
    """A question with no further chain still surfaces (the reference
    returns a partial trace dict on early exit, :795-796)."""
    gr = spark.createDataFrame(
        [("lone", "q?", "2026-01-01T00:00:00Z", [], [], 0, [],
          None, None, None, None)], _GR_SCHEMA)
    only_q = graphrag_session_triples(gr).where(
        F.col("s") == "urn:trustgraph:question:lone")
    t = rag_traces(only_q).collect()
    assert len(t) == 1 and t[0]["grounding_uri"] is None \
        and t[0]["synthesis_uri"] is None


def test_null_arrays_do_not_drop_session(spark):
    """NULL list columns (an upstream left join's no-match rows) must
    contribute zero entries — not null-poison the concat and silently
    drop the session's entire trace."""
    # NULL lists must emit exactly what [] lists emit
    nul = spark.createDataFrame(
        [("x", "q?", "2026-01-01T00:00:00Z", None, None, 0, None,
          None, None, None, None)], _GR_SCHEMA)
    emp = spark.createDataFrame(
        [("x", "q?", "2026-01-01T00:00:00Z", [], [], 0, [],
          None, None, None, None)], _GR_SCHEMA)
    got = sorted(map(tuple, graphrag_session_triples(nul).collect()))
    want = sorted(map(tuple, graphrag_session_triples(emp).collect()))
    assert got == want and len(got) > 0

    dnul = spark.createDataFrame(
        [("y", "q?", "2026-01-01T00:00:00Z", None, 0, None, None,
          None, None, None, None)], _DR_SCHEMA)
    demp = spark.createDataFrame(
        [("y", "q?", "2026-01-01T00:00:00Z", [], 0, [], [],
          None, None, None, None)], _DR_SCHEMA)
    dgot = sorted(map(tuple, docrag_session_triples(dnul).collect()))
    dwant = sorted(map(tuple, docrag_session_triples(demp).collect()))
    assert dgot == dwant and len(dgot) > 0


def test_list_sessions_excludes_subtraces(store):
    rows = list_sessions(store).collect()
    uris = [r["uri"] for r in rows]
    # s2 gained a wasDerivedFrom parent -> excluded as a sub-trace
    assert "urn:trustgraph:question:s2" not in uris
    assert set(uris) == {"urn:trustgraph:question:s1",
                         "urn:trustgraph:docrag:d1",
                         "urn:trustgraph:docrag:d2"}
    # newest-first ordering on the timestamp literal
    stamps = [r["timestamp"] for r in rows]
    assert stamps == sorted(stamps, reverse=True)


def test_token_triples_optional_arms(store):
    """in/out token + model literals appear only where provided
    (triples.py:86-94)."""
    syn1 = store.where(
        (F.col("s") == "urn:trustgraph:prov:synthesis:s1")
        & F.col("p").isin(TG + "inToken", TG + "outToken", TG + "llmModel"))
    got = {(r["p"], r["o"]) for r in syn1.collect()}
    assert got == {(TG + "inToken", "11"), (TG + "outToken", "22"),
                   (TG + "llmModel", "test-model")}
    syn2 = store.where(
        (F.col("s") == "urn:trustgraph:docrag:d2/synthesis")
        & F.col("p").isin(TG + "inToken", TG + "outToken", TG + "llmModel"))
    got2 = {(r["p"], r["o"]) for r in syn2.collect()}
    assert got2 == {(TG + "inToken", "1"), (TG + "outToken", "2")}


def test_quoted_edge_is_byte_exact_rdf_star_json(store):
    row = store.where(
        (F.col("s") == "urn:trustgraph:prov:edge:s1:0")
        & (F.col("p") == TG + "edge")).collect()[0]
    assert row["otype"] == "t"
    assert json.loads(row["o"]) == {
        "s": {"type": "i", "iri": "http://t/e/acme"},
        "p": {"type": "i", "iri": TG + "founder"},
        "o": {"type": "i", "iri": "http://t/e/jane"},
    }


def test_document_prov_optional_fields(spark):
    docs = spark.createDataFrame(
        [("urn:doc:a", "Title A", "http://src/a", "2026-01-01", "Ann",
          4, "application/pdf"),
         ("urn:doc:b", "", None, None, None, None, None)],
        "doc_uri string, title string, source string, date string, "
        "creator string, page_count int, mime_type string")
    out = document_prov_triples(docs)
    a = {(r["p"], r["o"], r["otype"]) for r in
         out.where(F.col("s") == "urn:doc:a").collect()}
    assert (DC_TITLE, "Title A", "l") in a
    assert ("http://www.w3.org/2000/01/rdf-schema#label",
            "Title A", "l") in a
    assert ("http://purl.org/dc/elements/1.1/source",
            "http://src/a", "u") in a
    assert (TG + "pageCount", "4", "l") in a
    assert len(a) == 9
    # empty/missing metadata -> just the two type rows
    b = out.where(F.col("s") == "urn:doc:b").collect()
    assert len(b) == 2 and all(r["p"] == RDF_TYPE for r in b)


def test_derived_entity_specific_type_priority(spark):
    ents = spark.createDataFrame(
        [("urn:image:1", "urn:page:1", None, 3, None, None, None,
          False, True, None),
         ("urn:chunk:1", "urn:doc:a", "c1", None, 5, 100, 2000,
          False, False, "text/plain"),
         ("urn:misc:1", "urn:doc:a", None, None, None, None, None,
          False, False, None)],
        "entity_uri string, parent_uri string, label string, "
        "page_number int, chunk_index int, char_offset int, "
        "char_length int, section boolean, image boolean, "
        "mime_type string")
    out = derived_entity_prov_triples(
        ents, "chunker", "0.1.0", "2026-01-01T00:00:00Z")
    types = {r["s"]: r["o"] for r in out.where(
        (F.col("p") == RDF_TYPE) & (F.col("o") != "http://www.w3.org/ns/prov#Entity")
        & (F.col("o").startswith(TG))).collect()}
    # image wins over page_number (reference :207-217)
    assert types["urn:image:1"] == TG + "Image"
    assert types["urn:chunk:1"] == TG + "Chunk"
    assert "urn:misc:1" not in types
    chunk = {(r["p"], r["o"]) for r in
             out.where(F.col("s") == "urn:chunk:1").collect()}
    assert (TG + "chunkIndex", "5") in chunk
    assert (TG + "charOffset", "100") in chunk
    assert (TG + "charLength", "2000") in chunk
    assert (TG + "mimeType", "text/plain") in chunk
    # activity envelope: deterministic URI, used/associated/started
    acts = out.where((F.col("p") == "http://www.w3.org/ns/prov#used")
                     & (F.col("o") == "urn:doc:a"))
    assert acts.count() == 2  # chunk + misc activities, distinct per entity


# ---------------------------------------------------------------------------
# Edge -> source provenance (show_explain_trace.py:53-164)
# ---------------------------------------------------------------------------

def _src_row(s, p, o, otype="u"):
    return ("default", "urn:graph:source", s, p, o, otype, "", "")


_SRC_SCHEMA = ("collection string, g string, s string, p string, "
               "o string, otype string, dtype string, lang string")


def _qt_json(s, p, o, o_iri=True):
    o_term = {"type": "i", "iri": o} if o_iri else {"type": "l", "value": o}
    return json.dumps({"s": {"type": "i", "iri": s},
                       "p": {"type": "i", "iri": p}, "o": o_term})


def test_edge_source_provenance_chain_and_labels(spark):
    from trustgraph_spark.operators.explain import edge_source_provenance

    src = spark.createDataFrame([
        _src_row("urn:sg:1", TG + "contains",
                 _qt_json("http://t/e/acme", TG + "founder",
                          "http://t/e/jane"), "t"),
        # a second subgraph contains the same edge -> two chains
        _src_row("urn:sg:2", TG + "contains",
                 _qt_json("http://t/e/acme", TG + "founder",
                          "http://t/e/jane"), "t"),
        # literal-object containment (build_term types must match)
        _src_row("urn:sg:3", TG + "contains",
                 _qt_json("http://t/e/jane", TG + "age", "41",
                          o_iri=False), "t"),
        _src_row("urn:sg:1", PROV_WAS_DERIVED_FROM, "urn:chunk:c1"),
        _src_row("urn:chunk:c1", PROV_WAS_DERIVED_FROM, "urn:page:p1"),
        _src_row("urn:page:p1", PROV_WAS_DERIVED_FROM, "urn:doc:1"),
        # sg2 chain stops at a self-parent node
        _src_row("urn:sg:2", PROV_WAS_DERIVED_FROM, "urn:loop:x"),
        _src_row("urn:loop:x", PROV_WAS_DERIVED_FROM, "urn:loop:x"),
        _src_row("urn:doc:1", RDF_TYPE + "-not-label", "noise", "l"),
        _src_row("urn:doc:1",
                 "http://www.w3.org/2000/01/rdf-schema#label",
                 "Doc One", "l"),
    ], _SRC_SCHEMA)

    sels = spark.createDataFrame(
        [("sel:a", ("http://t/e/acme", TG + "founder", "http://t/e/jane")),
         ("sel:b", ("http://t/e/jane", TG + "age", "41")),
         ("sel:c", ("http://t/e/none", TG + "x", "http://t/e/y"))],
        "uri string, edge struct<s:string,p:string,o:string>")

    out = {(r["selection_uri"], r["stmt_uri"]): r
           for r in edge_source_provenance(sels, src).collect()}
    # sel:a matches both subgraphs
    a1 = out[("sel:a", "urn:sg:1")]
    assert a1["source_chain"] == \
        "urn:sg:1 -> urn:chunk:c1 -> urn:page:p1 -> Doc One"
    assert a1["content_chunk"] == "urn:chunk:c1"
    a2 = out[("sel:a", "urn:sg:2")]
    # self-parent loop stops after one hop (reference :152-154)
    assert a2["source_chain"] == "urn:sg:2 -> urn:loop:x"
    assert a2["content_chunk"] is None
    # literal-typed object matches only the literal containment
    b = out[("sel:b", "urn:sg:3")]
    assert b["source_chain"] == "urn:sg:3"
    # no containment -> no row at all
    assert not any(k[0] == "sel:c" for k in out)


def test_edge_source_provenance_max_depth(spark):
    from trustgraph_spark.operators.explain import edge_source_provenance

    rows = [_src_row("urn:sg:d", TG + "contains",
                     _qt_json("http://a", "http://p", "http://b"), "t")]
    prev = "urn:sg:d"
    for i in range(20):
        rows.append(_src_row(prev, PROV_WAS_DERIVED_FROM, f"urn:n:{i}"))
        prev = f"urn:n:{i}"
    src = spark.createDataFrame(rows, _SRC_SCHEMA)
    sels = spark.createDataFrame(
        [("sel:d", ("http://a", "http://p", "http://b"))],
        "uri string, edge struct<s:string,p:string,o:string>")
    out = edge_source_provenance(sels, src, max_depth=10).collect()
    assert len(out) == 1 and len(out[0]["chain"]) == 10


# ---------------------------------------------------------------------------
# Rendering kernels (show_explain_trace.py:159-532)
# ---------------------------------------------------------------------------

def test_render_graphrag_trace_exact():
    from trustgraph_spark.explain_render import render_graphrag_trace

    trace = {
        "question": {"uri": "urn:q:1", "query": "who founded acme?",
                     "timestamp": "2026-01-01T00:00:01Z"},
        "exploration": {"uri": "urn:e:1", "edge_count": 7},
        "focus": {"uri": "urn:f:1", "edge_selections": [
            {"edge": {"s": "http://t/e/acme", "p": "http://t/p/founder",
                      "o": "http://t/e/jane"},
             "concept": "acme", "score": 0.97,
             "provenance": [[{"uri": "urn:sg:1", "label": "urn:sg:1"},
                             {"uri": "urn:chunk:c1",
                              "label": "urn:chunk:c1"},
                             {"uri": "urn:doc:1", "label": "Doc One"}]]},
            {"edge": {"s": "http://t/e/jane", "p": "http://t/p/role",
                      "o": "http://t/e/ceo"},
             "concept": "", "score": None, "provenance": []},
        ]},
        "synthesis": {"uri": "urn:s:1", "document": "urn:doc:ans"},
    }
    labels = {"http://t/e/acme": "Acme", "http://t/p/founder": "founder",
              "http://t/e/jane": "Jane"}
    got = render_graphrag_trace(trace, labels=labels,
                                show_provenance=True)
    assert got == "\n".join([
        "=== GraphRAG Session: urn:q:1 ===",
        "",
        "Question: who founded acme?",
        "Time: 2026-01-01T00:00:01Z",
        "",
        "--- Exploration ---",
        "Retrieved 7 edges from knowledge graph",
        "",
        "--- Focus (Edge Selection) ---",
        "Selected 2 edges:",
        "",
        "  1. (Acme, founder, Jane)",
        "     Concept: acme  Score: 0.9700",
        "     Source: urn:sg:1 -> urn:chunk:c1 -> Doc One",
        "     Content: urn:chunk:c1",
        "",
        "  2. (Jane, http://t/p/role, http://t/e/ceo)",
        "",
        "--- Synthesis ---",
        "Document: urn:doc:ans",
    ])
    # with answer content, lines are two-space indented
    got2 = render_graphrag_trace(trace, labels=labels,
                                 content="line a\nline b")
    assert got2.endswith(
        "--- Synthesis ---\nAnswer:\n  line a\n  line b")


def test_render_graphrag_missing_tails():
    from trustgraph_spark.explain_render import render_graphrag_trace

    got = render_graphrag_trace({"question": None})
    assert got == "\n".join([
        "=== GraphRAG Session: Unknown ===",
        "", "",
        "--- Exploration ---",
        "No exploration data found",
        "",
        "--- Focus (Edge Selection) ---",
        "No focus data found",
        "",
        "--- Synthesis ---",
        "No synthesis data found",
    ])
    # score missing but concept present -> '?' marker
    got2 = render_graphrag_trace({
        "question": {"uri": "u", "query": "q", "timestamp": ""},
        "focus": {"uri": "f", "edge_selections": [
            {"edge": {"s": "a", "p": "b", "o": "c"},
             "concept": "k", "score": None}]},
    })
    assert "     Concept: k  Score: ?" in got2


def test_render_docrag_trace_exact():
    from trustgraph_spark.explain_render import render_docrag_trace

    got = render_docrag_trace({
        "question": {"uri": "urn:d:1", "query": "what?",
                     "timestamp": "2026-01-02T00:00:03Z"},
        "grounding": {"uri": "urn:g:1", "concepts": ["a", "b"]},
        "exploration": {"uri": "urn:e:1", "chunk_count": 3},
        "synthesis": {"uri": "urn:s:1", "document": ""},
    })
    assert got == "\n".join([
        "=== DocRAG Session: urn:d:1 ===",
        "",
        "Question: what?",
        "Time: 2026-01-02T00:00:03Z",
        "",
        "--- Grounding ---",
        "Concepts: a, b",
        "",
        "--- Exploration ---",
        "Retrieved 3 chunks from document store",
        "",
        "--- Synthesis ---",
        "No answer content found",
    ])


def test_trace_to_dict_shapes(store):
    from trustgraph_spark.explain_render import (
        trace_row_to_dict,
        trace_to_dict,
    )
    from trustgraph_spark.operators.explain import (
        edge_selections,
        rag_traces,
    )

    rows = {r["question_uri"]: r for r in rag_traces(store).collect()}
    sels = [s for s in edge_selections(store).collect()
            if s["uri"].startswith("urn:trustgraph:prov:edge:s1:")]
    t1 = trace_row_to_dict(rows["urn:trustgraph:question:s1"],
                           sorted(sels, key=lambda s: s["uri"]))
    d = trace_to_dict(t1, "graphrag")
    assert d["type"] == "graphrag"
    assert d["question"] == "who founded acme?"
    assert d["exploration"] == {
        "id": "urn:trustgraph:prov:exploration:s1", "edge_count": 7}
    assert d["focus"]["id"] == "urn:trustgraph:prov:focus:s1"
    assert d["focus"]["selected_edges"][0] == {
        "edge": {"s": "http://t/e/acme", "p": TG + "founder",
                 "o": "http://t/e/jane"},
        "concept": "acme", "score": 0.97}
    assert d["synthesis"] == {"id": "urn:trustgraph:prov:synthesis:s1",
                              "document": "urn:doc:ans1"}

    td = trace_row_to_dict(rows["urn:trustgraph:docrag:d1"])
    dd = trace_to_dict(td, "docrag")
    assert dd["grounding"] == {"id": "urn:trustgraph:docrag:d1/grounding",
                               "concepts": ["chunk"]}
    assert dd["exploration"]["chunk_count"] == 3

    agent = {"question": {"uri": "urn:a", "query": "q", "timestamp": "t"},
             "steps": [
                 {"entity_type": "analysis", "uri": "urn:a/i1",
                  "action": "tool", "arguments": "{}", "thought": "th"},
                 {"entity_type": "observation", "uri": "urn:a/i1/o",
                  "document": "urn:doc:o"},
                 {"entity_type": "conclusion", "uri": "urn:a/final",
                  "document": "urn:doc:f"},
                 {"entity_type": "question", "uri": "urn:sub"}]}
    da = trace_to_dict(agent, "agent")
    assert [s["type"] for s in da["steps"]] == [
        "analysis", "observation", "conclusion", "question"]
    assert da["steps"][0] == {"type": "analysis", "id": "urn:a/i1",
                              "action": "tool", "arguments": "{}",
                              "thought": "th"}
    assert da["steps"][3] == {"type": "question", "id": "urn:sub"}


# ---------------------------------------------------------------------------
# Extraction hierarchy (show_extraction_provenance.py:175-305)
# ---------------------------------------------------------------------------

_H_TG = "https://trustgraph.ai/ns/"
_H_WDF = "http://www.w3.org/ns/prov#wasDerivedFrom"
_H_LBL = "http://www.w3.org/2000/01/rdf-schema#label"
_H_RDFT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _hier_store(spark, extra=(), noise=()):
    rows = [
        ("urn:doc:1", _H_RDFT, _H_TG + "Document", "u"),
        ("urn:doc:1", "http://purl.org/dc/terms/title", "My Doc", "l"),
        ("urn:doc:1", _H_TG + "mimeType", "text/plain", "l"),
        ("urn:page:1", _H_WDF, "urn:doc:1", "u"),
        ("urn:page:1", _H_RDFT, _H_TG + "Page", "u"),
        ("urn:page:1", _H_LBL, "Page 1", "l"),
        ("urn:chunk:1", _H_WDF, "urn:page:1", "u"),
        ("urn:chunk:1", _H_RDFT, _H_TG + "Chunk", "u"),
        # diamond: chunk:2 derived from BOTH page:1 and doc:1
        ("urn:chunk:2", _H_WDF, "urn:page:1", "u"),
        ("urn:chunk:2", _H_WDF, "urn:doc:1", "u"),
        ("urn:chunk:2", _H_RDFT, _H_TG + "Chunk", "u"),
        # cycle back-edge: page:1 "derived from" its own chunk
        ("urn:page:1", _H_WDF, "urn:chunk:1", "u"),
        # subgraph on chunk:1 with a literal-object RDF-star edge
        ("urn:sg:1", _H_WDF, "urn:chunk:1", "u"),
        ("urn:sg:1", _H_RDFT, _H_TG + "Subgraph", "u"),
        ("urn:sg:1", _H_TG + "contains",
         _qt_json("http://t/e/a", _H_TG + "rel", "lit val", o_iri=False),
         "t"),
        # untyped child -> 'unknown'
        ("urn:misc:1", _H_WDF, "urn:chunk:1", "u"),
    ] + list(extra)
    data = [("default", "urn:graph:source", s, p, o, ot, "", "")
            for s, p, o, ot in rows] + list(noise)
    return spark.createDataFrame(data, _SRC_SCHEMA)


def test_extraction_hierarchy_walk(spark):
    from trustgraph_spark.operators.explain import extraction_hierarchy

    store = _hier_store(
        spark,
        noise=[("default", "urn:graph:retrieval",
                "urn:page:1", _H_LBL, "WRONG", "l", "", "")])
    rows = {r["node_uri"]: r for r in
            extraction_hierarchy(store, "urn:doc:1").collect()}
    root = rows["urn:doc:1"]
    assert (root["depth"], root["parent_uri"], root["node_type"],
            root["title"], root["fmt"]) == (0, None, "document",
                                            "My Doc", "text/plain")
    # named-graph filter: the retrieval-graph label never leaks
    assert rows["urn:page:1"]["label"] == "Page 1"
    # diamond -> min parent at min depth (documented divergence)
    assert (rows["urn:chunk:2"]["depth"],
            rows["urn:chunk:2"]["parent_uri"]) == (1, "urn:doc:1")
    # cycle guard: page:1 appears exactly once, at depth 1
    assert rows["urn:page:1"]["depth"] == 1
    # subgraph never becomes a node; its edge inlines onto the parent
    assert "urn:sg:1" not in rows
    edge = rows["<<http://t/e/a https://trustgraph.ai/ns/rel lit val>>"]
    assert (edge["node_type"], edge["parent_uri"], edge["depth"]) == (
        "edge", "urn:chunk:1", 3)
    # untyped child classifies 'unknown' and still recurses as a node
    assert rows["urn:misc:1"]["node_type"] == "unknown"
    assert len(rows) == 6


def test_extraction_hierarchy_depth_and_dc11(spark):
    from trustgraph_spark.operators.explain import extraction_hierarchy

    # dc/elements/1.1 title (the EMITTER vocabulary) read when no
    # dcterms title exists; max_depth cuts the walk
    store = _hier_store(
        spark,
        extra=[("urn:doc:1",
                "http://purl.org/dc/elements/1.1/title", "DC11", "l")])
    out = extraction_hierarchy(store, "urn:doc:1", max_depth=1)
    rows = {r["node_uri"]: r for r in out.collect()}
    assert set(rows) == {"urn:doc:1", "urn:page:1", "urn:chunk:2"}
    assert rows["urn:doc:1"]["title"] == "My Doc"  # dcterms wins
    solo = spark.createDataFrame(
        [("default", "urn:graph:source", "urn:doc:9",
          "http://purl.org/dc/elements/1.1/title", "DC11", "l", "", "")],
        _SRC_SCHEMA)
    r9 = extraction_hierarchy(solo, "urn:doc:9").collect()
    assert len(r9) == 1 and r9[0]["title"] == "DC11"
    assert r9[0]["node_type"] == "unknown"


def test_extraction_hierarchy_render(spark):
    from trustgraph_spark.explain_render import (
        hierarchy_to_tree,
        render_extraction_tree,
    )
    from trustgraph_spark.operators.explain import extraction_hierarchy

    rows = [r.asDict() for r in
            extraction_hierarchy(_hier_store(spark), "urn:doc:1").collect()]
    tree = hierarchy_to_tree(rows)
    assert tree["uri"] == "urn:doc:1" and tree["type"] == "document"
    assert tree["metadata"] == {"uri": "urn:doc:1", "title": "My Doc",
                                "format": "text/plain"}
    # children sorted by uri (show_extraction_provenance.py:228)
    assert [c["uri"] for c in tree["children"]] == [
        "urn:chunk:2", "urn:page:1"]
    text = render_extraction_tree(tree)
    assert text == "\n".join([
        'Document: urn:doc:1',
        '  Title: "My Doc"',
        '  Type: text/plain',
        '  ├── Chunk: urn:chunk:2',
        '  └── Page: Page 1',
        '      └── Chunk: urn:chunk:1',
        '          ├── Edge: '
        '<<http://t/e/a https://trustgraph.ai/ns/rel lit val>>',
        '          └── Unknown: urn:misc:1',
    ])
    assert render_extraction_tree(None) == "No data found"


# ---------------------------------------------------------------------------
# Property: hierarchy BFS == pinned-semantics Python replay
# ---------------------------------------------------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st

_H_NODE = st.sampled_from(["n0", "n1", "n2", "n3", "n4"])
_H_TYPE = st.sampled_from(
    [_H_TG + t for t in ("Document", "Page", "Chunk", "Subgraph")])
_H_PRIORITY = [(_H_TG + "Document", "document"), (_H_TG + "Page", "page"),
               (_H_TG + "Chunk", "chunk"), (_H_TG + "Subgraph", "subgraph")]


def _h_classify(u, types):
    for uri, name in _H_PRIORITY:
        if uri in types.get(u, set()):
            return name
    return "unknown"


def py_hierarchy(derived, types, labels, contains, root, max_depth=8):
    """build_hierarchy replay with the repo's documented min-parent /
    min-depth determinism (show_extraction_provenance.py:175-230)."""
    rows = [(0, root, None, _h_classify(root, types),
             min(labels[root]) if labels.get(root) else None)]
    frontier = {root}
    seen = {root}
    for depth in range(1, max_depth + 1):
        step = {(c, p) for (c, p) in derived
                if p in frontier and c not in seen}
        if not step:
            break
        for sg, par in sorted({(c, p) for c, p in step
                               if _h_classify(c, types) == "subgraph"}):
            for edge in sorted(contains.get(sg, set())):
                rows.append((depth, edge, par, "edge", None))
        regs = {}
        for c, p in step:
            if _h_classify(c, types) != "subgraph":
                regs[c] = min(p, regs.get(c, p))
        for c, p in sorted(regs.items()):
            rows.append((depth, c, p, _h_classify(c, types),
                         min(labels[c]) if labels.get(c) else None))
        frontier = set(regs)
        seen |= frontier
    return sorted(rows, key=lambda r: (r[0], r[1], str(r[2])))


@given(
    edges=st.lists(st.tuples(_H_NODE, _H_NODE), min_size=0, max_size=8),
    typed=st.lists(st.tuples(_H_NODE, _H_TYPE), min_size=0, max_size=6),
    labeled=st.lists(st.tuples(_H_NODE, st.sampled_from(["L1", "L2"])),
                     min_size=0, max_size=4),
    contained=st.lists(st.tuples(_H_NODE, st.sampled_from(["e1", "e2"])),
                       min_size=0, max_size=4),
    max_depth=st.integers(min_value=1, max_value=8),
)
@settings(max_examples=10, deadline=None)
def test_extraction_hierarchy_property(
        spark, edges, typed, labeled, contained, max_depth):
    from trustgraph_spark.operators.explain import extraction_hierarchy

    derived = set(edges)
    types, labels, contains = {}, {}, {}
    for n, t in typed:
        types.setdefault(n, set()).add(t)
    for n, lb in labeled:
        labels.setdefault(n, set()).add(lb)
    store_rows = [(c, _H_WDF, p, "u") for c, p in derived]
    store_rows += [(n, _H_RDFT, t, "u") for n, t in sorted(set(typed))]
    store_rows += [(n, _H_LBL, lb, "l") for n, lb in sorted(set(labeled))]
    for n, e in sorted(set(contained)):
        contains.setdefault(n, set()).add(
            f"<<http://x/{e} {_H_TG}rel {e}>>")
        store_rows.append(
            (n, _H_TG + "contains",
             _qt_json(f"http://x/{e}", _H_TG + "rel", e, o_iri=False),
             "t"))
    df = spark.createDataFrame(
        [("default", "urn:graph:source", s, p, o, ot, "", "")
         for s, p, o, ot in store_rows] or [],
        _SRC_SCHEMA)
    got = sorted(
        ((r["depth"], r["node_uri"], r["parent_uri"], r["node_type"],
          r["label"])
         for r in extraction_hierarchy(df, "n0",
                                       max_depth=max_depth).collect()),
        key=lambda r: (r[0], r[1], str(r[2])))
    assert got == py_hierarchy(derived, types, labels, contains, "n0",
                               max_depth)
