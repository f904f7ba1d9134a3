"""Tool-catalog loader + dynamic tool-service protocol parity
(agent/orchestrator/service.py:150-320, base/dynamic_tool_service.py:97-155,
agent/react/tools.py:11-325, tool_service/joke/service.py:88-188)."""

import json
import random

import pytest

from trustgraph_spark.agent import AgentManager, Final, Tool, run_agent
from trustgraph_spark.toolservice import (
    JOKE_STYLES,
    JokeToolService,
    KnowledgeQueryImpl,
    McpToolImpl,
    PromptImpl,
    RowEmbeddingsQueryImpl,
    StructuredQueryImpl,
    ToolService,
    ToolServiceImpl,
    TooManyRequests,
    decode_tool_request,
    joke_category,
    load_tool_services,
    load_tools_config,
    resolve_tool_service,
    shape_tool_error,
    shape_tool_response,
)


JOKE_SERVICE = {
    "id": "joke-service",
    "request-queue": "non-persistent://tg/request/joke",
    "response-queue": "non-persistent://tg/response/joke",
    "config-params": [{"name": "style", "required": False}],
}

JOKE_TOOL = {
    "type": "tool-service",
    "name": "tell-joke",
    "description": "Tell a joke on a given topic",
    "service": "joke-service",
    "style": "pun",
    "arguments": [
        {"name": "topic", "type": "string",
         "description": "The topic for the joke"},
    ],
}


def catalog(tool=JOKE_TOOL, service=JOKE_SERVICE):
    return {
        "tool-service": {"joke-service": json.dumps(service)},
        "tool": {"t1": json.dumps(tool)},
    }


# ---------------------------------------------------------------------------
# catalog loading
# ---------------------------------------------------------------------------


class TestLoader:

    def test_tool_services_decode(self):
        svcs = load_tool_services(catalog())
        assert svcs == {"joke-service": JOKE_SERVICE}
        assert load_tool_services({}) == {}

    def test_tool_service_tool(self):
        tools, extra = load_tools_config(catalog())
        assert extra is None
        t = tools["tell-joke"]
        assert isinstance(t, Tool)
        assert t.description == "Tell a joke on a given topic"
        assert [a.name for a in t.arguments] == ["topic"]
        kw = t.implementation.keywords
        assert kw["request_queue"] == JOKE_SERVICE["request-queue"]
        assert kw["response_queue"] == JOKE_SERVICE["response-queue"]
        # declared config-param picked up from the tool config
        assert kw["config_values"] == {"style": "pun"}

    def test_optional_param_absent_is_omitted(self):
        tool = {k: v for k, v in JOKE_TOOL.items() if k != "style"}
        tools, _ = load_tools_config(catalog(tool=tool))
        assert tools["tell-joke"].implementation.keywords["config_values"] == {}

    def test_bare_string_config_param(self):
        svc = dict(JOKE_SERVICE, **{"config-params": ["style"]})
        tools, _ = load_tools_config(catalog(service=svc))
        kw = tools["tell-joke"].implementation.keywords
        assert kw["config_values"] == {"style": "pun"}

    def test_required_param_missing_raises(self):
        svc = dict(JOKE_SERVICE,
                   **{"config-params": [{"name": "style", "required": True}]})
        tool = {k: v for k, v in JOKE_TOOL.items() if k != "style"}
        with pytest.raises(RuntimeError,
                           match="missing required config param 'style'"):
            load_tools_config(catalog(tool=tool, service=svc))

    def test_no_service_ref(self):
        tool = {k: v for k, v in JOKE_TOOL.items() if k != "service"}
        with pytest.raises(RuntimeError, match="no 'service' reference"):
            load_tools_config(catalog(tool=tool))

    def test_unknown_service_ref(self):
        tool = dict(JOKE_TOOL, service="nope")
        with pytest.raises(RuntimeError,
                           match="unknown tool-service 'nope'"):
            load_tools_config(catalog(tool=tool))

    def test_missing_queues(self):
        svc = {k: v for k, v in JOKE_SERVICE.items()
               if k != "response-queue"}
        with pytest.raises(
                RuntimeError,
                match="must define 'request-queue' and 'response-queue'"):
            load_tools_config(catalog(service=svc))

    def test_unknown_tool_type(self):
        tool = dict(JOKE_TOOL, type="warp-drive")
        with pytest.raises(RuntimeError,
                           match="Tool type warp-drive not known"):
            load_tools_config(catalog(tool=tool))

    def test_invalid_group_field_raises_through_loader(self):
        tool = dict(JOKE_TOOL, group="not-a-list")
        with pytest.raises(ValueError,
                           match="'group' field must be a list"):
            load_tools_config(catalog(tool=tool))

    def test_every_builtin_type_constructs(self):
        defs = {
            "kq": {"type": "knowledge-query", "name": "kq",
                   "description": "d", "collection": "c1"},
            "tc": {"type": "text-completion", "name": "tc",
                   "description": "d"},
            "mcp": {"type": "mcp-tool", "name": "mcp", "description": "d",
                    "mcp-tool": "weather",
                    "arguments": [{"name": "city", "type": "string",
                                   "description": "x"}]},
            "pr": {"type": "prompt", "name": "pr", "description": "d",
                   "template": "tmpl-1",
                   "arguments": [{"name": "v", "type": "string",
                                  "description": "x"}]},
            "sq": {"type": "structured-query", "name": "sq",
                   "description": "d"},
            "re": {"type": "row-embeddings-query", "name": "re",
                   "description": "d", "schema-name": "orders",
                   "limit": "5"},
        }
        cfg = {"tool": {k: json.dumps(v) for k, v in defs.items()},
               "agent": {"additional-context": "be brief"}}
        tools, extra = load_tools_config(cfg)
        assert extra == "be brief"
        assert set(tools) == set(defs)
        assert tools["kq"].implementation.func is KnowledgeQueryImpl
        assert tools["kq"].implementation.keywords == {"collection": "c1"}
        assert [a.name for a in tools["kq"].arguments] == ["question"]
        assert tools["mcp"].implementation.keywords["mcp_tool_id"] == "weather"
        assert [a.name for a in tools["mcp"].arguments] == ["city"]
        assert tools["pr"].implementation.keywords["template_id"] == "tmpl-1"
        re_kw = tools["re"].implementation.keywords
        assert re_kw["schema_name"] == "orders" and re_kw["limit"] == 5

    def test_resolve_tool_service_direct(self):
        binding = resolve_tool_service(
            "tell-joke", JOKE_TOOL, {"joke-service": JOKE_SERVICE})
        assert binding["config_values"] == {"style": "pun"}


# ---------------------------------------------------------------------------
# observation-formatting kernels (tools.py)
# ---------------------------------------------------------------------------


class _Ctx:
    """context(service_name) resolver backed by a dict of fakes."""

    def __init__(self, **clients):
        self.clients = clients

    def __call__(self, name):
        if isinstance(name, tuple):
            name = name[0]
        return self.clients[name]


class TestImplFormatting:

    def test_structured_query_arms(self):
        class C:
            def __init__(self, result):
                self.result = result

            def structured_query(self, question, collection):
                self.seen = (question, collection)
                return self.result

        c = C({"error": {"message": "boom"}})
        impl = StructuredQueryImpl(_Ctx(**{"structured-query-request": c}))
        assert impl.invoke(question="q") == "Error: boom"
        assert c.seen == ("q", "default")

        c2 = C({"data": {"rows": [1, 2]}})
        impl2 = StructuredQueryImpl(
            _Ctx(**{"structured-query-request": c2}), collection="x")
        assert impl2.invoke(question="q") == json.dumps(
            {"rows": [1, 2]}, indent=2)
        assert c2.seen == ("q", "x")

        c3 = C({})
        impl3 = StructuredQueryImpl(_Ctx(**{"structured-query-request": c3}))
        assert impl3.invoke(question="q") == "No data returned"

    def test_row_embeddings_formatting(self):
        class Emb:
            def embed(self, texts):
                return [[0.1, 0.2]]

        class Q:
            def __init__(self, matches):
                self.matches = matches

            def row_embeddings_query(self, **kw):
                self.kw = kw
                return self.matches

        q = Q([{"index_name": "name", "index_value": ["Acme", "Inc"],
                "score": 0.98765}])
        impl = RowEmbeddingsQueryImpl(
            _Ctx(**{"embeddings-request": Emb(),
                    "row-embeddings-query-request": q}),
            schema_name="orgs", limit=3)
        out = impl.invoke(query="acme")
        assert out == "Matching records:\n- name: Acme, Inc (score: 0.988)"
        assert q.kw["schema_name"] == "orgs" and q.kw["limit"] == 3
        assert q.kw["vector"] == [0.1, 0.2]

        q2 = Q([])
        impl2 = RowEmbeddingsQueryImpl(
            _Ctx(**{"embeddings-request": Emb(),
                    "row-embeddings-query-request": q2}),
            schema_name="orgs")
        assert impl2.invoke(query="x") == "No matching records found"

    def test_mcp_tool_json_shaping(self):
        class C:
            def invoke(self, name, parameters):
                return {"temp": 21} if parameters.get("j") else "sunny"

        ctx = _Ctx(**{"mcp-tool-request": C()})
        impl = McpToolImpl(ctx, mcp_tool_id="weather")
        assert impl.invoke(j=False) == "sunny"
        assert impl.invoke(j=True) == json.dumps({"temp": 21})

    def test_knowledge_and_prompt_pass_through(self):
        class Rag:
            def rag(self, q, collection):
                return f"{q}@{collection}"

        class Prompt:
            def question(self, q):
                return type("R", (), {"text": f"ans:{q}"})()

            def prompt(self, id, variables):
                return type("R", (), {"text": f"{id}:{variables['v']}"})()

        ctx = _Ctx(**{"graph-rag-request": Rag(), "prompt-request": Prompt()})
        assert KnowledgeQueryImpl(ctx).invoke(question="q") == "q@default"
        assert KnowledgeQueryImpl(ctx, collection="c").invoke(
            question="q") == "q@c"
        from trustgraph_spark.toolservice import TextCompletionImpl
        assert TextCompletionImpl(ctx).invoke(question="q") == "ans:q"
        assert PromptImpl(ctx, template_id="t").invoke(v="x") == "t:x"


# ---------------------------------------------------------------------------
# protocol (dynamic_tool_service.py + tool_service_client.py)
# ---------------------------------------------------------------------------


class TestProtocol:

    def test_decode_defaults(self):
        assert decode_tool_request(None, None) == ({}, {})
        assert decode_tool_request("", "") == ({}, {})
        assert decode_tool_request('{"a": 1}', '{"b": 2}') == (
            {"a": 1}, {"b": 2})

    def test_shape_response(self):
        assert shape_tool_response("hi") == "hi"
        assert shape_tool_response({"k": 1}) == '{"k": 1}'

    def test_error_envelope(self):
        env = shape_tool_error(RuntimeError("boom"))
        assert env == {
            "error": {"type": "tool-service-error", "message": "boom"},
            "response": "",
        }

    def test_on_request_success_and_error(self):
        svc = ToolService("s", invoke=lambda c, a: {"echo": [c, a]})
        resp = svc.on_request('{"x": 1}', '{"y": 2}')
        assert resp["error"] is None
        assert json.loads(resp["response"]) == {
            "echo": [{"x": 1}, {"y": 2}]}

        def bad(c, a):
            raise ValueError("nope")

        resp = ToolService("s", invoke=bad).on_request(None, None)
        assert resp["error"]["message"] == "nope"
        assert resp["error"]["type"] == "tool-service-error"
        assert resp["response"] == ""

    def test_too_many_requests_reraised(self):
        def sat(c, a):
            raise TooManyRequests("busy")

        with pytest.raises(TooManyRequests):
            ToolService("s", invoke=sat).on_request(None, None)

    def test_base_invoke_not_implemented(self):
        resp = ToolService("s").on_request(None, None)
        assert "must implement invoke" in resp["error"]["message"]

    def test_client_roundtrip_and_error(self):
        svc = ToolService("s", invoke=lambda c, a: f"c={c} a={a}")
        client = svc.client()
        assert client.call(config={"k": 1}, arguments={"q": "z"}) == (
            "c={'k': 1} a={'q': 'z'}")
        # empty dicts travel as absent fields and decode back to {}
        assert client.call(config={}, arguments={}) == "c={} a={}"

        def bad(c, a):
            raise RuntimeError("down")

        with pytest.raises(RuntimeError, match="down"):
            ToolService("s", invoke=bad).client().call(
                config={}, arguments={})


# ---------------------------------------------------------------------------
# example service (tool_service/joke)
# ---------------------------------------------------------------------------


class TestJoke:

    @pytest.mark.parametrize("topic,cat", [
        ("programming", "programming"), ("my code", "programming"),
        ("Computer stuff", "programming"), ("software", "programming"),
        ("llama farming", "llama"),
        ("animals", "animals"), ("my dog", "animals"), ("a cat", "animals"),
        ("birds", "animals"),
        ("food", "food"), ("eating", "food"), ("cooking", "food"),
        ("drinks", "food"),
        ("", "default"), ("quantum physics", "default"),
    ])
    def test_category_mapping(self, topic, cat):
        assert joke_category(topic) == cat

    def test_styled_response_framing(self):
        svc = JokeToolService(rng=random.Random(7))
        out = svc.invoke({"style": "pun"}, {"topic": "my dog"})
        assert out.startswith("Here's a pun for you:\n\n")
        assert "animals pun" in out

    def test_invalid_style_renormalized(self):
        svc = JokeToolService(rng=random.Random(7))
        out = svc.invoke({"style": "limerick"}, {"topic": "food"})
        style = out.split("Here's a ")[1].split(" for you")[0]
        assert style in JOKE_STYLES

    def test_absent_style_uses_rng(self):
        svc = JokeToolService(rng=random.Random(0))
        out = svc.invoke({}, {})
        assert out.startswith("Here's a ")


# ---------------------------------------------------------------------------
# end-to-end: catalog → AgentManager → tool-service invocation
# ---------------------------------------------------------------------------


class TestEndToEnd:

    def test_agent_runs_loaded_tool_service(self):
        tools, extra = load_tools_config(catalog())
        joke = JokeToolService(rng=random.Random(3))
        clients = {}

        def context(name):
            # queue-pair resolver with the reference's per-pair caching
            # (tools.py:260-268)
            if name in clients:
                return clients[name]
            client = joke.client()
            clients[name] = client
            return client

        script = iter([
            'Thought: ask the joke service\n'
            'Action: tell-joke\n'
            'Args: {"topic": "my dog"}',
            "Thought: done\nFinal Answer: told a joke",
        ])
        mgr = AgentManager(tools=tools, responder=lambda v: next(script),
                           additional_context=extra)
        history, final = run_agent(mgr, "tell me a joke", context=context)

        assert isinstance(final, Final)
        assert len(history) == 1
        obs = history[0].observation
        assert obs.startswith("Here's a pun for you:")  # config style wins
        assert "animals pun" in obs                     # argument topic wins
        assert len(clients) == 1

    def test_agent_records_service_error(self):
        tools, _ = load_tools_config(catalog())

        def sat(c, a):
            raise RuntimeError("service down")

        failing = ToolService("joke-service", invoke=sat)

        script = iter([
            'Thought: t\nAction: tell-joke\nArgs: {"topic": "x"}',
            "Thought: done\nFinal Answer: ok",
        ])
        mgr = AgentManager(tools=tools, responder=lambda v: next(script))
        history, final = run_agent(
            mgr, "q", context=lambda name: failing.client())
        assert history[0].observation == "Error: service down"
        assert history[0].tool_error == "service down"
