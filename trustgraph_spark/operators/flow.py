"""Flow service — the reference's flow lifecycle manager
(flow/service/flow.py:14-672: blueprint CRUD, parameter resolution
with type defaults and controlled-by inheritance, template
interpolation of processor variants / topics / interfaces, start-flow
config fan-out, and the three-phase stop with closure-based topic
cleanup).  Flows are how a TrustGraph user composes the processors
this repo implements into a running pipeline, so the blueprint
interpolation semantics are a user-facing contract.

Control plane: :class:`FlowService` mirrors the reference
handler-for-handler on top of this repo's ConfigService (the reference
FlowConfig sits on the config store the same way); the queue backend
(create/ensure/delete topic) is an injectable seam — there is no
Pulsar here, and the repo's processors communicate through DataFrames,
but the topic *bookkeeping* (what gets created, what a closure sweep
may delete) is deterministic logic worth parity.

Data plane: :func:`resolve_flow_topics` evaluates the same template
interpolation for a whole CORPUS of flow records as native columns —
``{workspace}`` / ``{blueprint}`` / ``{id}`` via chained ``replace``
and arbitrary ``{param}`` substitution as an ``aggregate`` fold over
``map_entries`` — and :func:`topic_refcounts` gives the closure the
stop sweep needs (a topic is deletable only when no other live flow
still templates to it).  At fleet scale (thousands of workspaces ×
flows) that is one join + one fold + one aggregation, no Python.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DELETE_RETRIES = 5


def is_flow_owned(template: str) -> bool:
    """flow.py:397-409: a topic template with at least one ``{...}``
    substitution is owned by the flow system; pure literals belong to
    global services and are never touched."""
    return "{" in template


def repl_template(template: str, workspace: str, blueprint: str,
                  flow_id: str, parameters: dict) -> str:
    """flow.py:225-240 substitution order: the three standard
    variables first, then every resolved parameter."""
    out = (template.replace("{workspace}", workspace)
           .replace("{blueprint}", blueprint)
           .replace("{id}", flow_id))
    for name, value in parameters.items():
        out = out.replace(f"{{{name}}}", str(value))
    return out


def resolve_parameters(blueprint: dict, user_params: dict | None,
                       type_defs: dict) -> dict:
    """flow.py:23-119 two-pass parameter resolution: user values win
    (stringified), else the parameter type's default (booleans render
    true/false), required-without-default raises; second pass inherits
    ``controlled-by`` values (controller first, else the controlled
    parameter's own type default); extra user parameters pass through
    for forward compatibility.  ``type_defs`` maps type name ->
    parameter-type definition dict (the config store's
    ``parameter-type`` entries)."""
    if "parameters" not in blueprint:
        if not user_params:
            return {}
        return {k: str(v) for k, v in user_params.items()}

    resolved = {}
    flow_params = blueprint["parameters"]
    user_params = user_params or {}

    def default_str(type_def: dict) -> str | None:
        if "default" not in type_def:
            return None
        value = type_def["default"]
        if isinstance(value, bool):
            return "true" if value else "false"
        return str(value)

    for name, meta in flow_params.items():
        if name in user_params:
            resolved[name] = str(user_params[name])
            continue
        type_def = type_defs.get(meta.get("type"), {}) if meta.get("type") \
            else None
        if type_def is None:
            continue
        default = default_str(type_def)
        if default is not None:
            resolved[name] = default
        elif type_def.get("required", False):
            raise RuntimeError(
                f"Required parameter '{name}' not provided and has "
                f"no default")

    for name, meta in flow_params.items():
        if name not in resolved and "controlled-by" in meta:
            controller = meta["controlled-by"]
            if controller in resolved:
                resolved[name] = resolved[controller]
            else:
                type_def = type_defs.get(meta.get("type"), {})
                default = default_str(type_def)
                if default is not None:
                    resolved[name] = default

    for key, value in user_params.items():
        if key not in resolved:
            resolved[key] = str(value)

    return resolved


class FlowError(RuntimeError):
    pass


class _NullBackend:
    def create_topic(self, topic):
        pass

    def ensure_topic(self, topic):
        pass

    def delete_topic(self, topic):
        pass


class FlowService:
    """flow.py FlowConfig parity on the repo's ConfigService.  The
    queue backend seam records/performs topic lifecycle; ``sleep`` is
    injectable so delete-retry tests run instantly."""

    def __init__(self, config, backend=None, sleep=None):
        self.config = config
        self.backend = backend or _NullBackend()
        self.sleep = sleep or (lambda s: None)

    # -- blueprint CRUD (flow.py:121-162) --

    def list_blueprints(self, workspace: str) -> list[str]:
        return list(self.config.keys(workspace, "flow-blueprint"))

    def get_blueprint(self, workspace: str, name: str) -> str | None:
        return self.config.get(workspace, "flow-blueprint", name)

    def put_blueprint(self, workspace: str, name: str,
                      definition: str) -> None:
        self.config.put(workspace, "flow-blueprint", name, definition)

    def delete_blueprint(self, workspace: str, name: str) -> None:
        self.config.delete(workspace, "flow-blueprint", name)

    # -- flow read (flow.py:164-186) --

    def list_flows(self, workspace: str) -> list[str]:
        return list(self.config.keys(workspace, "flow"))

    def get_flow(self, workspace: str, flow_id: str) -> dict:
        flow = json.loads(self.config.get(workspace, "flow", flow_id))
        return {"flow": flow,
                "description": flow.get("description", ""),
                "parameters": flow.get("parameters", {})}

    # -- parameter types --

    def _type_defs(self, workspace: str, blueprint: dict) -> dict:
        defs = {}
        for meta in (blueprint.get("parameters") or {}).values():
            t = meta.get("type")
            if t and t not in defs:
                raw = self.config.get(workspace, "parameter-type", t)
                defs[t] = json.loads(raw) if raw else {}
        return defs

    # -- start (flow.py:188-301) --

    def start_flow(self, workspace: str, flow_id: str | None,
                   blueprint_name: str | None, description: str | None,
                   parameters: dict | None = None) -> None:
        if blueprint_name is None:
            raise FlowError("No blueprint name")
        if flow_id is None:
            raise FlowError("No flow ID")
        if flow_id in self.config.keys(workspace, "flow"):
            raise FlowError("Flow already exists")
        if description is None:
            raise FlowError("No description")
        if blueprint_name not in self.config.keys(workspace,
                                                  "flow-blueprint"):
            raise FlowError("Blueprint does not exist")

        cls = json.loads(
            self.config.get(workspace, "flow-blueprint", blueprint_name))
        resolved = resolve_parameters(
            cls, parameters or {}, self._type_defs(workspace, cls))

        def repl(tmp):
            return repl_template(tmp, workspace, blueprint_name, flow_id,
                                 resolved)

        for topic in self._collect_flow_topics(cls, repl):
            self.backend.create_topic(topic)

        updates = []
        for kind in ("blueprint", "flow"):
            for k, v in cls[kind].items():
                processor, variant = k.split(":", 1)
                entry = {
                    "topics": {repl(k2): repl(v2)
                               for k2, v2 in v.get("topics", {}).items()},
                    "parameters": {repl(k2): repl(v2)
                                   for k2, v2 in
                                   v.get("parameters", {}).items()},
                }
                updates.append((f"processor:{processor}", repl(variant),
                                json.dumps(entry)))
        self.config.put_many(workspace, updates)

        interfaces = {
            k: {k2: repl(v2) for k2, v2 in v.items()}
            for k, v in cls.get("interfaces", {}).items()
        }
        self.config.put(workspace, "flow", flow_id, json.dumps({
            "description": description,
            "blueprint-name": blueprint_name,
            "interfaces": interfaces,
            "parameters": resolved,
        }))

    # -- topic collection (flow.py:381-424) --

    @staticmethod
    def _collect_flow_topics(cls: dict, repl) -> set:
        return {repl(template)
                for v in cls["flow"].values()
                for template in v.get("topics", {}).values()}

    @staticmethod
    def _collect_owned_topics(cls: dict, repl) -> set:
        return {repl(template)
                for v in cls["flow"].values()
                for template in v.get("topics", {}).values()
                if is_flow_owned(template)}

    def _live_owned_topic_closure(self, exclude_workspace=None,
                                  exclude_flow_id=None) -> set:
        live = set()
        for ws in self.config.workspaces_for_type("flow"):
            for fid in self.config.keys(ws, "flow"):
                if ws == exclude_workspace and fid == exclude_flow_id:
                    continue
                raw = self.config.get(ws, "flow", fid)
                if raw is None:
                    continue
                frec = json.loads(raw)
                if frec.get("status") == "stopping":
                    continue
                bp_name = frec.get("blueprint-name")
                if bp_name is None:
                    continue
                bp_raw = self.config.get(ws, "flow-blueprint", bp_name)
                if bp_raw is None:
                    continue
                bp = json.loads(bp_raw)
                params = frec.get("parameters", {})
                live.update(self._collect_owned_topics(
                    bp, lambda t: repl_template(t, ws, bp_name, fid,
                                                params)))
        return live

    def _delete_topics(self, topics) -> list:
        """Best-effort delete with retries (flow.py:519-547); returns
        the topics that never deleted (logged by the reference)."""
        topics = list(topics)
        for attempt in range(DELETE_RETRIES):
            remaining = []
            for topic in topics:
                try:
                    self.backend.delete_topic(topic)
                except Exception:
                    remaining.append(topic)
            if not remaining:
                return []
            topics = remaining
            if attempt < DELETE_RETRIES - 1:
                self.sleep(2)
        return topics

    # -- stop (flow.py:549-637) --

    def stop_flow(self, workspace: str, flow_id: str | None) -> None:
        if flow_id is None:
            raise FlowError("No flow ID")
        if flow_id not in self.config.keys(workspace, "flow"):
            raise FlowError("Flow ID invalid")

        flow = json.loads(self.config.get(workspace, "flow", flow_id))
        if "blueprint-name" not in flow:
            raise FlowError("Internal error: flow has no flow blueprint")
        blueprint_name = flow["blueprint-name"]
        parameters = flow.get("parameters", {})
        cls = json.loads(
            self.config.get(workspace, "flow-blueprint", blueprint_name))

        def repl(tmp):
            return repl_template(tmp, workspace, blueprint_name, flow_id,
                                 parameters)

        this_flow_owned = self._collect_owned_topics(cls, repl)

        # Phase 1: mark stopping, remove processor config
        flow["status"] = "stopping"
        self.config.put(workspace, "flow", flow_id, json.dumps(flow))
        deletes = []
        for k in cls["flow"]:
            processor, variant = k.split(":", 1)
            deletes.append((f"processor:{processor}", repl(variant)))
        self.config.delete_many(workspace, deletes)

        # Phase 2: closure sweep — keep topics other live flows template
        live_owned = self._live_owned_topic_closure(
            exclude_workspace=workspace, exclude_flow_id=flow_id)
        self._delete_topics(this_flow_owned - live_owned)

        # Phase 3: remove the flow record
        if flow_id in self.config.keys(workspace, "flow"):
            self.config.delete(workspace, "flow", flow_id)

    # -- startup recovery (flow.py:303-379) --

    def ensure_existing_flow_topics(self, workspaces) -> None:
        for workspace in workspaces:
            for flow_id in self.config.keys(workspace, "flow"):
                raw = self.config.get(workspace, "flow", flow_id)
                if raw is None:
                    continue
                flow = json.loads(raw)
                bp_name = flow.get("blueprint-name")
                if bp_name is None or flow.get("status") == "stopping":
                    continue
                bp_raw = self.config.get(workspace, "flow-blueprint",
                                         bp_name)
                if bp_raw is None:
                    continue
                cls = json.loads(bp_raw)
                params = flow.get("parameters", {})
                for topic in self._collect_flow_topics(
                        cls, lambda t: repl_template(
                            t, workspace, bp_name, flow_id, params)):
                    self.backend.ensure_topic(topic)

    # -- dispatch (flow.py:639-672) --

    def handle(self, msg: dict, workspace: str) -> dict:
        op = msg.get("operation")
        try:
            if op == "list-blueprints":
                return {"blueprint_names": self.list_blueprints(workspace)}
            if op == "get-blueprint":
                return {"blueprint_definition": self.get_blueprint(
                    workspace, msg["blueprint_name"])}
            if op == "put-blueprint":
                self.put_blueprint(workspace, msg["blueprint_name"],
                                   msg["blueprint_definition"])
                return {}
            if op == "delete-blueprint":
                self.delete_blueprint(workspace, msg["blueprint_name"])
                return {}
            if op == "list-flows":
                return {"flow_ids": self.list_flows(workspace)}
            if op == "get-flow":
                return self.get_flow(workspace, msg["flow_id"])
            if op == "start-flow":
                self.start_flow(workspace, msg.get("flow_id"),
                                msg.get("blueprint_name"),
                                msg.get("description"),
                                msg.get("parameters"))
                return {}
            if op == "stop-flow":
                self.stop_flow(workspace, msg.get("flow_id"))
                return {}
        except FlowError as e:
            return {"error": {"type": "flow-error", "message": str(e)}}
        return {"error": {"type": "bad-operation",
                          "message": "Bad operation"}}


# ---------------------------------------------------------------------------
# Data plane: corpus-scale template interpolation + closure refcounts
# ---------------------------------------------------------------------------


def resolve_flow_topics(flows: DataFrame, templates: DataFrame) -> DataFrame:
    """Every (flow, owned topic) pair for a corpus of flow records.

    ``flows``: (workspace, flow_id, blueprint_name, status,
    parameters map<string,string>).  ``templates``: (blueprint_name,
    template).  Stopping flows keep no topics alive (flow.py:330-335);
    literal templates are not flow-owned (flow.py:397-409).  The
    interpolation is fully native: the three standard variables are
    chained ``replace`` calls and the parameter map is an ``aggregate``
    fold over ``map_entries`` — no UDF, broadcast-joinable against a
    small blueprint dimension."""
    live = flows.where(F.col("status") != "stopping")
    joined = live.join(F.broadcast(
        templates.where(F.col("template").contains("{"))),
        "blueprint_name")
    base = F.replace(
        F.replace(
            F.replace(F.col("template"),
                      F.lit("{workspace}"), F.col("workspace")),
            F.lit("{blueprint}"), F.col("blueprint_name")),
        F.lit("{id}"), F.col("flow_id"))
    resolved = F.aggregate(
        F.map_entries(F.coalesce(
            F.col("parameters"),
            F.map_from_arrays(F.array().cast("array<string>"),
                              F.array().cast("array<string>")))),
        base,
        lambda acc, e: F.replace(
            acc,
            F.concat(F.lit("{"), e.getField("key"), F.lit("}")),
            e.getField("value")),
    )
    return (joined
            .select("workspace", "flow_id", resolved.alias("topic"))
            .distinct())


def topic_refcounts(flow_topics: DataFrame) -> DataFrame:
    """How many live flows template to each topic — the closure the
    stop sweep consults (flow.py:424-517): a topic with refs == 1 is
    deletable when its sole flow stops; refs > 1 means another live
    flow still owns it.  One map-side-combinable aggregation."""
    return (flow_topics.groupBy("topic")
            .agg(F.count(F.lit(1)).alias("refs")))
