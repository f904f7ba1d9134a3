"""Tool-catalog loading + dynamic tool-service protocol (clean-room parity).

The last uncovered slice of the reference's agent plane: the orchestrator's
``on_tools_config`` catalog loader (agent/orchestrator/service.py:150-320),
the per-type tool client implementations (agent/react/tools.py:11-325),
the ``DynamicToolService`` request/response protocol
(trustgraph-base/trustgraph/base/dynamic_tool_service.py:97-155 +
tool_service_client.py:14-37), and the shipped example service
(tool_service/joke/service.py:88-188).

Seam rationale (driver-side control plane, no Spark data plane): every
kernel here is per-config-reload or per-request decision logic the
reference runs on strings and dicts — catalog validation, config-param
merging, response shaping.  The Pulsar transport is the seam: ``context``
is a callable resolving a service name to a client object (the reference's
flow context), and a tool service's ``call`` is any callable with the
wire contract below.  The data-plane twin of tool execution is
``agent.run_react_traces`` (session-batched mapInPandas); the executing
manager for a loaded catalog is ``agent.AgentManager``, whose
``implementation(context).invoke(**args)`` contract every impl here
satisfies.

Wire contract (schema ToolServiceRequest/ToolServiceResponse): config and
arguments travel as JSON strings (absent → empty dict on decode,
dynamic_tool_service.py:104-108); a success response is a string (non-str
results are json.dumps'd both service-side :119-123 and client-side
tools.py:321-325); an error response carries
``{"type": "tool-service-error", "message": str(e)}`` with an empty
response body (:143-152), and the client raises RuntimeError(message)
(tool_service_client.py:34-35).  ``TooManyRequests`` is re-raised for the
transport to retry (:131-132), never converted to an error envelope.
"""

from __future__ import annotations

import functools
import json
import random
from typing import Any, Callable, Dict, List, Optional

from .agent import Argument, Tool, validate_tool_config


class TooManyRequests(Exception):
    """Backpressure signal (trustgraph/exceptions.py): the service is
    saturated; the transport retries instead of recording an error."""


# ---------------------------------------------------------------------------
# Tool-catalog loading (agent/orchestrator/service.py:158-320)
# ---------------------------------------------------------------------------

KNOWN_TOOL_TYPES = (
    "knowledge-query", "text-completion", "mcp-tool", "prompt",
    "structured-query", "row-embeddings-query", "tool-service",
)


def load_tool_services(config: dict) -> Dict[str, dict]:
    """Decode the ``tool-service`` config group (service.py:160-166):
    each value is a JSON document describing one dynamic service."""
    out: Dict[str, dict] = {}
    for service_id, service_value in (config.get("tool-service") or {}).items():
        out[service_id] = (
            json.loads(service_value) if isinstance(service_value, str)
            else service_value
        )
    return out


def _config_arguments(data: dict) -> List[Argument]:
    """Argument list declared in the tool config (service.py:189-198)."""
    return [
        Argument(
            name=arg.get("name"),
            type=arg.get("type"),
            description=arg.get("description"),
        )
        for arg in data.get("arguments", [])
    ]


def resolve_tool_service(name: str, data: dict,
                         tool_services: Dict[str, dict]) -> dict:
    """Resolve a type='tool-service' tool against the service catalog
    (service.py:233-271): validate the service reference and its queue
    pair, then merge declared config-params from the tool config —
    required params must be present, optional absent ones are omitted,
    bare-string param declarations are allowed.  Error strings are the
    reference's own (a user's config errors must read identically)."""
    service_ref = data.get("service")
    if not service_ref:
        raise RuntimeError(
            f"Tool {name} has type 'tool-service' "
            f"but no 'service' reference"
        )
    if service_ref not in tool_services:
        raise RuntimeError(
            f"Tool {name} references unknown "
            f"tool-service '{service_ref}'"
        )

    service_config = tool_services[service_ref]
    request_queue = service_config.get("request-queue")
    response_queue = service_config.get("response-queue")
    if not request_queue or not response_queue:
        raise RuntimeError(
            f"Tool-service '{service_ref}' must define "
            f"'request-queue' and 'response-queue'"
        )

    config_values: Dict[str, Any] = {}
    for param in service_config.get("config-params", []):
        param_name = param.get("name") if isinstance(param, dict) else param
        if param_name in data:
            config_values[param_name] = data[param_name]
        elif isinstance(param, dict) and param.get("required", False):
            raise RuntimeError(
                f"Tool {name} missing required config "
                f"param '{param_name}'"
            )

    return {
        "request_queue": request_queue,
        "response_queue": response_queue,
        "config_values": config_values,
    }


def load_tools_config(config: dict,
                      config_key: str = "agent") -> tuple:
    """The ``on_tools_config`` kernel (service.py:150-320): build the
    workspace tool catalog from a config snapshot.  Returns
    ``(tools, additional_context)`` ready for
    ``agent.AgentManager(tools=..., additional_context=...)``.

    Each Tool's ``implementation`` is a partial over the matching impl
    class below, needing only ``context`` at invoke time — the same
    functools.partial shape the reference builds.  Unknown tool types and
    invalid group/state fields raise with the reference's messages.

    Deliberate divergence: the reference wraps the whole reload in
    try/except and logs "Configuration reload failed", keeping the old
    catalog live (a service-survival behavior); this kernel RAISES so a
    caller (and the tests) see exactly which config entry is broken —
    callers wanting the reference's keep-old-catalog behavior catch at
    the reload site."""
    tool_services = load_tool_services(config)

    tools: Dict[str, Tool] = {}
    for tool_id, tool_value in (config.get("tool") or {}).items():
        data = (
            json.loads(tool_value) if isinstance(tool_value, str)
            else tool_value
        )
        impl_id = data.get("type")
        name = data.get("name")

        if impl_id == "knowledge-query":
            impl = functools.partial(
                KnowledgeQueryImpl, collection=data.get("collection"))
            arguments = KnowledgeQueryImpl.get_arguments()
        elif impl_id == "text-completion":
            impl = TextCompletionImpl
            arguments = TextCompletionImpl.get_arguments()
        elif impl_id == "mcp-tool":
            arguments = _config_arguments(data)
            impl = functools.partial(
                McpToolImpl, mcp_tool_id=data.get("mcp-tool"),
                arguments=arguments)
        elif impl_id == "prompt":
            arguments = _config_arguments(data)
            impl = functools.partial(
                PromptImpl, template_id=data.get("template"),
                arguments=arguments)
        elif impl_id == "structured-query":
            impl = functools.partial(
                StructuredQueryImpl, collection=data.get("collection"))
            arguments = StructuredQueryImpl.get_arguments()
        elif impl_id == "row-embeddings-query":
            impl = functools.partial(
                RowEmbeddingsQueryImpl,
                schema_name=data.get("schema-name"),
                collection=data.get("collection"),
                index_name=data.get("index-name"),
                limit=int(data.get("limit", 10)))
            arguments = RowEmbeddingsQueryImpl.get_arguments()
        elif impl_id == "tool-service":
            binding = resolve_tool_service(name, data, tool_services)
            arguments = _config_arguments(data)
            impl = functools.partial(
                ToolServiceImpl, arguments=arguments, **binding)
        else:
            raise RuntimeError(f"Tool type {impl_id} not known")

        validate_tool_config(data)

        tools[name] = Tool(
            name=name,
            description=data.get("description"),
            implementation=impl,
            config=data,
            arguments=arguments,
        )

    additional = None
    if config_key in config:
        additional = config[config_key].get("additional-context", None)

    return tools, additional


# ---------------------------------------------------------------------------
# Per-type tool client implementations (agent/react/tools.py:11-325).
# Sync twins: ``context(service_name)`` resolves the backend client; the
# formatting of each client's answer into the agent observation is the
# deterministic kernel pinned here.
# ---------------------------------------------------------------------------


class KnowledgeQueryImpl:
    """tools.py:11-60 — GraphRAG question (collection defaulted)."""

    def __init__(self, context, collection=None):
        self.context = context
        self.collection = collection

    @staticmethod
    def get_arguments():
        return [Argument(
            name="question", type="string",
            description="The question to ask the knowledge base")]

    def invoke(self, **arguments):
        client = self.context("graph-rag-request")
        return client.rag(
            arguments.get("question"),
            collection=self.collection if self.collection else "default",
        )


class TextCompletionImpl:
    """tools.py:64-85 — completion through the prompt service."""

    def __init__(self, context):
        self.context = context

    @staticmethod
    def get_arguments():
        return [Argument(
            name="question", type="string",
            description="The text prompt or question for completion")]

    def invoke(self, **arguments):
        client = self.context("prompt-request")
        return client.question(arguments.get("question")).text


class McpToolImpl:
    """tools.py:88-115 — MCP tool invocation; non-str output JSON'd."""

    def __init__(self, context, mcp_tool_id, arguments=None):
        self.context = context
        self.mcp_tool_id = mcp_tool_id
        self.arguments = arguments or []

    def get_arguments(self):
        return self.arguments

    def invoke(self, **arguments):
        client = self.context("mcp-tool-request")
        output = client.invoke(name=self.mcp_tool_id, parameters=arguments)
        return output if isinstance(output, str) else json.dumps(output)


class StructuredQueryImpl:
    """tools.py:118-152 — NL structured query; the three result arms
    (error message / indent-2 data / "No data returned") are the
    observation contract."""

    def __init__(self, context, collection=None):
        self.context = context
        self.collection = collection

    @staticmethod
    def get_arguments():
        return [Argument(
            name="question", type="string",
            description="Natural language question about structured data "
                        "(tables, databases, etc.)")]

    def invoke(self, **arguments):
        client = self.context("structured-query-request")
        result = client.structured_query(
            question=arguments.get("question"),
            collection=self.collection or "default",
        )
        if isinstance(result, dict):
            if result.get("error"):
                return f"Error: {result['error']['message']}"
            elif result.get("data"):
                return json.dumps(result["data"], indent=2)
            else:
                return "No data returned"
        return str(result)


class RowEmbeddingsQueryImpl:
    """tools.py:156-204 — embed the query text, search row embeddings,
    render matches as the reference's bullet list."""

    def __init__(self, context, schema_name, collection=None,
                 index_name=None, limit=10):
        self.context = context
        self.schema_name = schema_name
        self.collection = collection
        self.index_name = index_name
        self.limit = limit

    @staticmethod
    def get_arguments():
        return [Argument(
            name="query", type="string",
            description="Text to search for semantically similar values "
                        "in the structured data index")]

    def invoke(self, **arguments):
        embeddings_client = self.context("embeddings-request")
        all_vectors = embeddings_client.embed([arguments.get("query")])
        vector = all_vectors[0] if all_vectors else []

        client = self.context("row-embeddings-query-request")
        matches = client.row_embeddings_query(
            vector=vector, schema_name=self.schema_name,
            collection=self.collection or "default",
            index_name=self.index_name, limit=self.limit,
        )
        if not matches:
            return "No matching records found"
        results = [
            f"- {m['index_name']}: {', '.join(m['index_value'])} "
            f"(score: {m['score']:.3f})"
            for m in matches
        ]
        return "Matching records:\n" + "\n".join(results)


class PromptImpl:
    """tools.py:208-226 — render a configured prompt template."""

    def __init__(self, context, template_id, arguments=None):
        self.context = context
        self.template_id = template_id
        self.arguments = arguments or []

    def get_arguments(self):
        return self.arguments

    def invoke(self, **arguments):
        client = self.context("prompt-request")
        return client.prompt(id=self.template_id, variables=arguments).text


class ToolServiceImpl:
    """tools.py:229-325 — invoke a dynamically configured tool service.
    ``context(("tool-service", request_queue, response_queue))`` resolves
    the transport client (the reference caches ToolServiceClient per queue
    pair on the processor; caching is the resolver's concern here); its
    ``call(config=..., arguments=...)`` returns the response string or
    raises RuntimeError(error message) — tool_service_client.py:34-37."""

    def __init__(self, context, request_queue, response_queue,
                 config_values=None, arguments=None):
        self.context = context
        self.request_queue = request_queue
        self.response_queue = response_queue
        self.config_values = config_values or {}
        self.arguments = arguments or []

    def get_arguments(self):
        return self.arguments

    def invoke(self, **arguments):
        client = self.context(
            ("tool-service", self.request_queue, self.response_queue))
        response = client.call(config=self.config_values,
                               arguments=arguments)
        return response if isinstance(response, str) else json.dumps(response)


# ---------------------------------------------------------------------------
# Dynamic tool-service protocol (base/dynamic_tool_service.py:97-155)
# ---------------------------------------------------------------------------


def decode_tool_request(config_json: Optional[str],
                        arguments_json: Optional[str]) -> tuple:
    """Request decode (:104-108): absent/empty fields → empty dicts."""
    config = json.loads(config_json) if config_json else {}
    arguments = json.loads(arguments_json) if arguments_json else {}
    return config, arguments


def shape_tool_response(response: Any) -> str:
    """Success body (:119-123): strings pass through, all else JSON."""
    return response if isinstance(response, str) else json.dumps(response)


def shape_tool_error(exc: Exception) -> dict:
    """Error envelope (:143-152)."""
    return {
        "error": {"type": "tool-service-error", "message": str(exc)},
        "response": "",
    }


class ToolService:
    """Sync twin of DynamicToolService.on_request (:97-155): decode the
    wire request, run ``invoke(config, arguments)``, shape the response —
    exceptions become the error envelope except TooManyRequests, which is
    re-raised for the transport's backpressure path (:131-132)."""

    def __init__(self, ident: str,
                 invoke: Optional[Callable[[dict, dict], Any]] = None):
        self.id = ident
        if invoke is not None:
            self.invoke = invoke  # type: ignore[assignment]

    def invoke(self, config: dict, arguments: dict) -> Any:
        raise NotImplementedError("Subclasses must implement invoke()")

    def on_request(self, config_json: Optional[str],
                   arguments_json: Optional[str]) -> dict:
        try:
            config, arguments = decode_tool_request(
                config_json, arguments_json)
            response = self.invoke(config, arguments)
            return {"error": None,
                    "response": shape_tool_response(response)}
        except TooManyRequests:
            raise
        except Exception as e:  # noqa: BLE001 — the reference catches all
            return shape_tool_error(e)

    def client(self):
        """An in-process client with the ToolServiceClient contract
        (tool_service_client.py:14-37): encode the request as the wire's
        JSON strings, raise RuntimeError on an error envelope."""
        service = self

        class _Client:
            def call(self, config, arguments):
                resp = service.on_request(
                    json.dumps(config) if config else None,
                    json.dumps(arguments) if arguments else None,
                )
                if resp["error"]:
                    raise RuntimeError(resp["error"]["message"])
                return resp["response"]

        return _Client()


# ---------------------------------------------------------------------------
# Example service (tool_service/joke/service.py:88-188): the deterministic
# kernel is the topic→category mapping, style normalization, and response
# framing; the joke table is demo payload, so it is injectable (and tiny
# here), and the reference's random.choice gets an injectable rng.
# ---------------------------------------------------------------------------

JOKE_STYLES = ["pun", "dad-joke", "one-liner"]

_DEMO_JOKES = {
    "programming": {s: [f"programming {s} #1", f"programming {s} #2"]
                    for s in JOKE_STYLES},
    "animals": {s: [f"animals {s} #1"] for s in JOKE_STYLES},
    "food": {s: [f"food {s} #1"] for s in JOKE_STYLES},
    "llama": {s: [f"llama {s} #1"] for s in JOKE_STYLES},
    "default": {s: [f"default {s} #1", f"default {s} #2"]
                for s in JOKE_STYLES},
}


def joke_category(topic: str) -> str:
    """service.py:100-113 — substring topic mapping, checked in order."""
    topic = (topic or "").lower()
    if ("program" in topic or "code" in topic or "computer" in topic
            or "software" in topic):
        return "programming"
    elif "llama" in topic:
        return "llama"
    elif ("animal" in topic or "dog" in topic or "cat" in topic
            or "bird" in topic):
        return "animals"
    elif ("food" in topic or "eat" in topic or "cook" in topic
            or "drink" in topic):
        return "food"
    return "default"


class JokeToolService(ToolService):
    """service.py:88-146 — style from config (invalid/absent → rng pick),
    topic from arguments, double-fallback table lookup, framed response."""

    def __init__(self, ident: str = "joke-service", jokes=None, rng=None):
        super().__init__(ident)
        self.jokes = jokes if jokes is not None else _DEMO_JOKES
        self.rng = rng if rng is not None else random.Random()

    def invoke(self, config: dict, arguments: dict) -> str:
        style = config.get("style", self.rng.choice(JOKE_STYLES))
        category = joke_category(arguments.get("topic", ""))
        if style not in JOKE_STYLES:
            style = self.rng.choice(JOKE_STYLES)
        jokes = self.jokes.get(category, self.jokes["default"]).get(
            style, self.jokes["default"]["pun"])
        joke = self.rng.choice(jokes)
        return f"Here's a {style} for you:\n\n{joke}"
