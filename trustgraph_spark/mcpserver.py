"""MCP server kernel — the deterministic core of trustgraph-mcp
(trustgraph-mcp/trustgraph/mcp_server/mcp.py, 1,996 LoC): the tool
catalog, per-tool request shaping with the reference's exact defaults,
and response shaping, dispatched to THIS engine's operators instead of
a websocket gateway.

Reference anchors: _make_term :34-55 (term-type map + ValueError),
_register_tools :365-398 (the 31-tool catalog in registration order),
triples_query :655-737 (s/p default "iri", o default "literal", limit
20, graph passed through only when set — NB the docstring claims
None=default-graph/"*"=all but the code forwards g verbatim and the
storage layer treats None as ALL graphs and knows no "*" wildcard; we
implement the code, note the doc drift), sparql_query :739-790 (limit
10000), graphql_query (variables default {}), graph_embeddings_query
(limit 20; NB the tool sends key "vectors" where the gateway
translator reads data["vector"] — another reference seam drift; here
the batch form is first-class), config ops (operation get/put/delete/
config/getvalues), prompt extraction :get_prompts/get_prompt/
get_system_prompt (template-index / template.{id} / system keys under
config type "prompt", json.loads-if-str), get_token_costs (config type
"token-costs" — the metering counter reads "token-cost"; reference
drift, both noted).

The FastMCP HTTP transport, bearer passthrough TokenVerifier, and the
per-token websocket manager are the deployment's transport plane and
stay with the reference; this kernel is what a TrustGraph MCP client's
tool calls actually compute.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame

_TERM_TYPES = {"iri": "i", "literal": "l", "blank": "b"}

# _register_tools (:365-398), all 31 in registration order
TOOL_CATALOG = [
    "embeddings", "text_completion", "graph_rag", "agent",
    "triples_query", "sparql_query", "graphql_query",
    "graph_embeddings_query", "get_config_all", "get_config",
    "put_config", "delete_config", "get_prompts", "get_prompt",
    "get_system_prompt", "get_token_costs", "get_knowledge_cores",
    "delete_kg_core", "load_kg_core", "get_kg_core", "get_flows",
    "get_flow", "get_flow_classes", "get_flow_class", "start_flow",
    "stop_flow", "get_documents", "get_processing", "load_document",
    "remove_document", "add_processing",
]

# tools whose execution IS an LLM/embedding-model call — the pluggable
# seams (same boundary as E10/G1/G6)
LLM_SEAM_TOOLS = {"embeddings", "text_completion", "graph_rag", "agent"}


def make_term(value: str, term_type: str) -> dict:
    """_make_term (:34-55): compact-key wire term; unknown types raise
    the reference's ValueError."""
    t = _TERM_TYPES.get(term_type)
    if t is None:
        raise ValueError(
            f"Unknown term type '{term_type}' — "
            f"expected one of: {', '.join(_TERM_TYPES)}"
        )
    if t == "i":
        return {"t": t, "i": value}
    elif t == "l":
        return {"t": t, "v": value}
    elif t == "b":
        return {"t": t, "d": value}
    return {"t": t}


class McpServerKernel:
    """Dispatch the MCP tool surface to this engine.

    env: `edges` (quad frame) serves triples/sparql; `vectors`
    (id+vector frame, id column named by `vector_id_col`) serves
    graph_embeddings_query; `config` (operators.config.ConfigService)
    serves config/prompt/token-cost/flow-class tools; `flow`
    (operators.flow.FlowService) serves the flow lifecycle; `rows` +
    `schemas` serve graphql_query; `documents`/`processing` frames
    serve the library listings. Anything not wired raises — loudly,
    not a stub."""

    def __init__(self, spark, edges: DataFrame | None = None,
                 vectors: DataFrame | None = None,
                 vector_id_col: str = "entity",
                 config=None, flow=None,
                 rows: DataFrame | None = None,
                 schemas: dict | None = None,
                 documents: DataFrame | None = None,
                 processing: DataFrame | None = None):
        self.spark = spark
        self.edges = edges
        self.vectors = vectors
        self.vector_id_col = vector_id_col
        self.config = config
        self.flow = flow
        self.rows = rows
        self.schemas = schemas or {}
        self.documents = documents
        self.processing = processing

    def _need(self, attr: str):
        v = getattr(self, attr)
        if v is None:
            raise RuntimeError(f"McpServerKernel: {attr} not wired")
        return v

    # -- query tools ----------------------------------------------------

    def triples_query(self, s=None, s_type=None, p=None, p_type=None,
                      o=None, o_type=None, collection=None, graph=None,
                      limit=None) -> dict:
        """:655-737 — request shaping verbatim (defaults limit 20,
        collection "default", s/p "iri", o "literal"), executed through
        the batched wire dispatch; response = the SubgraphTranslator
        row dicts."""
        from .operators.wire import (
            decode_triples_requests,
            encode_triples_responses,
            execute_triples_requests,
        )

        if limit is None:
            limit = 20
        if collection is None:
            collection = "default"
        request_data: dict[str, Any] = {
            "limit": limit, "collection": collection}
        if s is not None:
            request_data["s"] = make_term(s, s_type or "iri")
        if p is not None:
            request_data["p"] = make_term(p, p_type or "iri")
        if o is not None:
            request_data["o"] = make_term(o, o_type or "literal")
        if graph is not None:
            request_data["g"] = graph
        reqs = self.spark.createDataFrame(
            [("r0", json.dumps(request_data))],
            "req_id string, request string")
        out = encode_triples_responses(execute_triples_requests(
            decode_triples_requests(reqs), self._need("edges")))
        return {"triples": [json.loads(r["triple_json"])
                            for r in out.collect()]}

    def sparql_query(self, query, collection=None, limit=None) -> dict:
        """:739-790 — SELECT/ASK/CONSTRUCT/DESCRIBE through the native
        SPARQL engine; limit (default 10000) is the safety cap on
        returned rows."""
        from .sparql import sparql_select

        if collection is None:
            collection = "default"
        if limit is None:
            limit = 10000
        df = sparql_select(self._need("edges"), query, collection)
        rows = df.limit(limit).collect()
        if df.columns == ["ask"]:
            return {"ask_result": bool(rows[0]["ask"])}
        return {"variables": df.columns,
                "bindings": [r.asDict() for r in rows]}

    def graphql_query(self, query, collection=None, variables=None,
                      operation_name=None) -> dict:
        if collection is None:
            collection = "default"
        from .graphql import graphql_rows_query

        out = graphql_rows_query(
            self._need("rows"), self.schemas, query,
            variables=variables or {}, collection=collection)
        return {"data": {k: [r.asDict() for r in v.collect()]
                         for k, v in out.items()}}

    def graph_embeddings_query(self, vectors, limit=None) -> dict:
        """Graph-embeddings search; the reference tool sends the whole
        vectors batch in one request — here that batch IS the execution
        unit. Returns the GraphEmbeddingsResponse entities list
        (wire-term entity + score), the union over the batch in
        (vector order, rank) order."""
        from .operators.wire import (
            decode_embeddings_requests,
            execute_embeddings_requests,
        )

        if limit is None:
            limit = 20
        reqs = self.spark.createDataFrame(
            [(f"v{i:06d}", json.dumps({"vector": v, "limit": limit}))
             for i, v in enumerate(vectors)],
            "req_id string, request string")
        out = execute_embeddings_requests(
            decode_embeddings_requests(reqs), self._need("vectors"),
            id_col=self.vector_id_col)
        rows = sorted(out.collect(),
                      key=lambda r: (r["req_id"], r["rank"]))
        return {"entities": [
            {"entity": {"t": "i", "i": r[self.vector_id_col]},
             "score": r["score"]} for r in rows]}

    # -- config / prompt / token-cost tools ------------------------------

    def get_config_all(self, workspace="default") -> dict:
        return {"config": self._need("config")
                .handle_config(workspace).config}

    def get_config(self, keys, workspace="default") -> dict:
        from .operators.config import ConfigValue

        resp = self._need("config").handle_get(
            [ConfigValue(type=k["type"], key=k["key"]) for k in keys],
            workspace)
        return {"values": [
            {"type": v.type, "key": v.key, "value": v.value}
            for v in resp.values]}

    def put_config(self, values, workspace="default") -> dict:
        from .operators.config import ConfigValue

        self._need("config").handle_put(
            [ConfigValue(type=v["type"], key=v["key"], value=v["value"])
             for v in values], workspace)
        return {}

    def delete_config(self, keys, workspace="default") -> dict:
        from .operators.config import ConfigValue

        self._need("config").handle_delete(
            [ConfigValue(type=k["type"], key=k["key"]) for k in keys],
            workspace)
        return {}

    def _prompt_config(self, workspace) -> dict:
        cfg = self._need("config").handle_config(workspace).config
        return cfg.get("prompt", {})

    def get_prompts(self, workspace="default") -> dict:
        idx = self._prompt_config(workspace).get("template-index", "[]")
        return {"prompts": json.loads(idx)
                if isinstance(idx, str) else idx}

    def get_prompt(self, prompt_id, workspace="default") -> dict:
        data = self._prompt_config(workspace).get(
            f"template.{prompt_id}", "{}")
        return {"prompt": json.loads(data)
                if isinstance(data, str) else data}

    def get_system_prompt(self, workspace="default") -> dict:
        data = self._prompt_config(workspace).get("system", "{}")
        return {"prompt": json.loads(data)
                if isinstance(data, str) else data}

    def get_token_costs(self, workspace="default") -> dict:
        resp = self._need("config").handle_getvalues(
            "token-costs", workspace)
        return {"costs": [
            {"type": v.type, "key": v.key, "value": v.value}
            for v in resp.values]}

    # -- flow tools -------------------------------------------------------

    def get_flows(self, workspace="default") -> dict:
        return {"flows": self._need("flow").list_flows(workspace)}

    def get_flow(self, flow_id, workspace="default") -> dict:
        return {"flow": self._need("flow").get_flow(workspace, flow_id)}

    def get_flow_classes(self, workspace="default") -> dict:
        return {"classes": self._need("flow")
                .list_blueprints(workspace)}

    def get_flow_class(self, class_name, workspace="default") -> dict:
        bp = self._need("flow").get_blueprint(workspace, class_name)
        return {"class": json.loads(bp)
                if isinstance(bp, str) else bp}

    def start_flow(self, flow_id, class_name, description,
                   workspace="default") -> dict:
        self._need("flow").start_flow(
            workspace, flow_id, class_name, description)
        return {}

    def stop_flow(self, flow_id, workspace="default") -> dict:
        self._need("flow").stop_flow(workspace, flow_id)
        return {}

    # -- library tools ----------------------------------------------------

    def get_documents(self, workspace="default") -> dict:
        docs = self._need("documents")
        rows = docs.where(docs["workspace"] == workspace).collect()
        return {"documents": [r.asDict() for r in rows]}

    def get_processing(self, workspace="default") -> dict:
        pr = self._need("processing")
        rows = pr.where(pr["workspace"] == workspace).collect()
        return {"processing": [r.asDict() for r in rows]}

    def dispatch(self, tool: str, **kwargs) -> dict:
        """Route one MCP tool call by catalog name. LLM-seam tools and
        the stateful library/core mutations raise with their operator
        pointer instead of pretending."""
        if tool not in TOOL_CATALOG:
            raise ValueError(f"unknown MCP tool {tool!r}")
        if tool in LLM_SEAM_TOOLS:
            raise NotImplementedError(
                f"{tool}: LLM/embedding-model seam — wire an extractor/"
                "embedder/agent responder (operators.extract / "
                "operators.embeddings / agent.run_react_traces)")
        if tool in ("get_knowledge_cores", "delete_kg_core",
                    "load_kg_core", "get_kg_core"):
            raise NotImplementedError(
                f"{tool}: use operators.kgcore (msgpack core exchange) "
                "over the warehouse")
        if tool in ("load_document", "remove_document",
                    "add_processing"):
            raise NotImplementedError(
                f"{tool}: use operators.librarian "
                "(plan_upload_sessions / assemble_uploads / "
                "remove_documents_cascade)")
        return getattr(self, tool)(**kwargs)
