"""MCP server kernel (trustgraph_spark/mcpserver.py) vs
trustgraph-mcp/trustgraph/mcp_server/mcp.py."""

import json

import pytest

from trustgraph_spark.mcpserver import (
    LLM_SEAM_TOOLS,
    TOOL_CATALOG,
    McpServerKernel,
    make_term,
)


def test_make_term_parity():
    # _make_term (:34-55)
    assert make_term("http://x", "iri") == {"t": "i", "i": "http://x"}
    assert make_term("hello", "literal") == {"t": "l", "v": "hello"}
    assert make_term("b1", "blank") == {"t": "b", "d": "b1"}
    with pytest.raises(ValueError, match="Unknown term type 'nope'"):
        make_term("x", "nope")


def test_tool_catalog_matches_reference_registration():
    # _register_tools (:365-398): 31 tools, order preserved
    assert len(TOOL_CATALOG) == 31
    assert TOOL_CATALOG[:8] == [
        "embeddings", "text_completion", "graph_rag", "agent",
        "triples_query", "sparql_query", "graphql_query",
        "graph_embeddings_query"]
    assert LLM_SEAM_TOOLS <= set(TOOL_CATALOG)


@pytest.fixture()
def kernel(spark):
    from trustgraph_spark.operators.config import (
        ConfigService,
        ConfigValue,
    )
    from trustgraph_spark.operators.flow import FlowService

    edges = spark.createDataFrame([
        ("default", "", "http://t/e/a", "http://t/p/x", "http://t/e/b",
         "u", "", ""),
        ("default", "", "http://t/e/a", "http://t/p/x", "lit one",
         "l", "", ""),
        ("default", "urn:g:1", "http://t/e/c", "http://t/p/y",
         "http://t/e/d", "u", "", ""),
    ], "collection string, g string, s string, p string, o string, "
       "otype string, dtype string, lang string")
    vectors = spark.createDataFrame(
        [("http://t/e/a", [1.0, 0.0]), ("http://t/e/b", [0.0, 1.0])],
        "entity string, vector array<double>")
    cfg = ConfigService(spark)
    cfg.handle_put([
        ConfigValue(type="prompt", key="template-index",
                    value=json.dumps(["qa"])),
        ConfigValue(type="prompt", key="template.qa",
                    value=json.dumps({"prompt": "Answer {{q}}"})),
        ConfigValue(type="prompt", key="system",
                    value=json.dumps("be brief")),
        ConfigValue(type="token-costs", key="gpt-x",
                    value=json.dumps({"i": 1, "o": 2})),
        ConfigValue(type="flow-blueprint", key="bp1", value=json.dumps(
            {"blueprint": {}, "flow": {}, "interfaces": {}})),
    ], "default")
    flow = FlowService(cfg)
    docs = spark.createDataFrame(
        [("default", "d1", 1, "k", "", "", [], "o1", None),
         ("other", "d2", 1, "k", "", "", [], "o2", None)],
        "workspace string, id string, time long, kind string, "
        "title string, comments string, tags array<string>, "
        "object_id string, parent_id string")
    return McpServerKernel(spark, edges=edges, vectors=vectors,
                           config=cfg, flow=flow, documents=docs)


def test_mcp_triples_query(kernel):
    # defaults: s/p iri, o literal (:717-724), limit 20
    out = kernel.triples_query(s="http://t/e/a", o="lit one")
    assert out == {"triples": [{
        "s": {"t": "i", "i": "http://t/e/a"},
        "p": {"t": "i", "i": "http://t/p/x"},
        "o": {"t": "l", "v": "lit one"}}]}
    # graph forwarded verbatim; absent = all graphs (code, not docstring)
    all_g = kernel.triples_query(p="http://t/p/y")
    assert all_g["triples"][0]["g"] == "urn:g:1"
    assert kernel.triples_query(p="http://t/p/y",
                                graph="")["triples"] == []


def test_mcp_sparql_and_embeddings(kernel):
    sel = kernel.sparql_query(
        "SELECT ?o WHERE { <http://t/e/a> <http://t/p/x> ?o }")
    assert sorted(b["o"] for b in sel["bindings"]) == [
        "http://t/e/b", "lit one"]
    ask = kernel.sparql_query(
        "ASK { <http://t/e/a> <http://t/p/x> ?o }")
    assert ask == {"ask_result": True}
    emb = kernel.graph_embeddings_query([[1.0, 0.0]], limit=1)
    assert emb == {"entities": [{
        "entity": {"t": "i", "i": "http://t/e/a"}, "score": 1.0}]}


def test_mcp_config_prompt_flow_tools(kernel):
    assert kernel.get_prompts() == {"prompts": ["qa"]}
    assert kernel.get_prompt("qa") == {
        "prompt": {"prompt": "Answer {{q}}"}}
    assert kernel.get_prompt("missing") == {"prompt": {}}
    assert kernel.get_system_prompt() == {"prompt": "be brief"}
    costs = kernel.get_token_costs()
    assert costs["costs"][0]["key"] == "gpt-x"
    got = kernel.get_config(
        [{"type": "prompt", "key": "system"}])
    assert got["values"][0]["value"] == json.dumps("be brief")
    kernel.put_config(
        [{"type": "prompt", "key": "k2", "value": "v2"}])
    assert kernel.get_config(
        [{"type": "prompt", "key": "k2"}])["values"][0]["value"] == "v2"

    assert kernel.get_flow_classes() == {"classes": ["bp1"]}
    kernel.start_flow("f1", "bp1", "my flow")
    assert kernel.get_flows() == {"flows": ["f1"]}
    assert kernel.get_flow("f1")["flow"]["description"] == "my flow"
    kernel.stop_flow("f1")
    assert kernel.get_flows() == {"flows": []}


def test_mcp_documents_and_dispatch(kernel):
    docs = kernel.get_documents()
    assert [d["id"] for d in docs["documents"]] == ["d1"]
    # dispatch routes by catalog name; seams raise loudly
    out = kernel.dispatch("triples_query", s="http://t/e/a",
                          o="lit one")
    assert len(out["triples"]) == 1
    with pytest.raises(NotImplementedError, match="seam"):
        kernel.dispatch("graph_rag", question="q")
    with pytest.raises(NotImplementedError, match="kgcore"):
        kernel.dispatch("get_kg_core", core_id="c")
    with pytest.raises(ValueError, match="unknown MCP tool"):
        kernel.dispatch("nope")
