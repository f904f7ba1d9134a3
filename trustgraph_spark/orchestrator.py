"""Agent orchestrator deterministic kernels (reference parity, clean-room).

The decision logic of the reference's multi-pattern agent orchestrator
(trustgraph-flow/trustgraph/agent/orchestrator/, ~2,500 LoC), with the
LLM classifier/planner calls and the Pulsar transport as pluggable seams:

- :class:`MetaRouter` — config-driven task-type / execution-pattern
  routing with LLM-answer normalization and layered fallbacks
  (meta_router.py:19-173);
- :class:`Aggregator` — fan-out correlation tracking, completion
  detection, synthesis-request construction, stale-correlation cleanup
  (aggregator.py:26-165; clock injectable);
- plan-then-execute step machine kernels — plan extraction from history,
  next-pending-step selection, plan validation fallback, dependency
  result gathering, step status updates (plan_pattern.py:85-120,143-166,
  225-260);
- supervisor kernels — goal-list validation and capping, synthesis
  phase detection, result collection from history
  (supervisor_pattern.py:29,63-79,133-146,196-210);
- :class:`UsageTracker` and the history conversion helper
  (pattern_base.py:69-97,163-175).

The executing agent each routed request lands on is
:class:`trustgraph_spark.agent.AgentManager`; the fan-out unit of
parallelism in a Spark deployment is the session BATCH
(``agent.run_react_traces``), so this module deliberately contains no
data-plane code — it is the driver-side control logic the reference
runs per request.
"""

from __future__ import annotations

import dataclasses
import json
import time
import uuid
from typing import Any, Callable, Dict, List, Optional

from .agent import Action

DEFAULT_PATTERN = "react"
DEFAULT_TASK_TYPE = "general"
DEFAULT_FRAMING = ""
MAX_SUBAGENTS = 5
DEFAULT_AGGREGATOR_TIMEOUT = 300


# ---------------------------------------------------------------------------
# request / step shapes (schema AgentRequest / AgentStep / PlanStep)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class PlanStep:
    goal: str
    tool_hint: str = ""
    depends_on: List[int] = dataclasses.field(default_factory=list)
    status: str = "pending"
    result: str = ""


@dataclasses.dataclass
class AgentStep:
    thought: str
    action: str
    arguments: dict
    observation: str
    step_type: str = ""
    plan: Optional[List[PlanStep]] = None
    subagent_results: Optional[Dict[str, str]] = None


@dataclasses.dataclass
class AgentRequest:
    question: str
    state: str = ""
    group: List[str] = dataclasses.field(default_factory=list)
    history: List[AgentStep] = dataclasses.field(default_factory=list)
    collection: str = "default"
    streaming: bool = False
    session_id: str = ""
    conversation_id: str = ""
    pattern: str = ""
    task_type: str = ""
    framing: str = ""
    correlation_id: str = ""
    parent_session_id: str = ""
    subagent_goal: str = ""
    expected_siblings: int = 0


class UsageTracker:
    """Token-usage accumulation across prompt calls
    (pattern_base.py:69-97)."""

    def __init__(self):
        self.total_in = 0
        self.total_out = 0
        self.last_model = None

    def track(self, result):
        if result is not None:
            if getattr(result, "in_token", None) is not None:
                self.total_in += result.in_token
            if getattr(result, "out_token", None) is not None:
                self.total_out += result.out_token
            if getattr(result, "model", None) is not None:
                self.last_model = result.model

    @property
    def in_token(self):
        return self.total_in if self.total_in > 0 else None

    @property
    def out_token(self):
        return self.total_out if self.total_out > 0 else None

    @property
    def model(self):
        return self.last_model


def build_history(request: AgentRequest) -> List[Action]:
    """AgentStep history -> Action objects for the executing manager
    (pattern_base.py:163-175)."""
    if not request.history:
        return []
    return [
        Action(thought=h.thought, name=h.action, arguments=h.arguments,
               observation=h.observation)
        for h in request.history
    ]


# ---------------------------------------------------------------------------
# MetaRouter (meta_router.py:19-173)
# ---------------------------------------------------------------------------


def _normalize_llm_choice(text: str) -> str:
    # the reference strips whitespace, lowers, and removes both quote
    # kinds from the LLM's one-token answer (:86,140)
    return text.strip().lower().replace('"', "").replace("'", "")


class MetaRouter:
    """Task-type and execution-pattern routing.

    ``classifier(question, task_types) -> str`` and
    ``selector(question, task_type, task_config, patterns) -> str`` are
    the LLM seams (the reference's task-type-classify / pattern-select
    prompt templates); every failure mode — unknown answer, seam
    exception, missing config — falls back exactly as the reference
    does: task type to 'general', pattern to the first valid pattern.
    """

    def __init__(self, config: Optional[dict] = None,
                 classifier: Optional[Callable] = None,
                 selector: Optional[Callable] = None):
        self.classifier = classifier
        self.selector = selector
        self.patterns: Dict[str, dict] = {}
        self.task_types: Dict[str, dict] = {}

        if config:
            for pid, pval in (config.get("agent-pattern") or {}).items():
                try:
                    self.patterns[pid] = json.loads(pval)
                except (json.JSONDecodeError, TypeError):
                    self.patterns[pid] = {"name": pid}
            for tid, tval in (config.get("agent-task-type") or {}).items():
                try:
                    self.task_types[tid] = json.loads(tval)
                except (json.JSONDecodeError, TypeError):
                    self.task_types[tid] = {"name": tid}

        if not self.patterns:
            self.patterns = {
                "react": {"name": "react",
                          "description": "Interleaved reasoning and action"},
            }
        if not self.task_types:
            self.task_types = {
                "general": {"name": "general",
                            "description": "General queries",
                            "valid_patterns": ["react"], "framing": ""},
            }

    def identify_task_type(self, question: str):
        """(task_type, framing); the classifier seam is consulted only
        when more than one task type is configured (:67-70)."""
        if len(self.task_types) <= 1:
            tid = next(iter(self.task_types), DEFAULT_TASK_TYPE)
            return tid, self.task_types.get(tid, {}).get(
                "framing", DEFAULT_FRAMING)
        try:
            if self.classifier is not None:
                selected = _normalize_llm_choice(
                    self.classifier(question, self.task_types))
                if selected in self.task_types:
                    return selected, self.task_types[selected].get(
                        "framing", DEFAULT_FRAMING)
        except Exception:
            pass
        return DEFAULT_TASK_TYPE, self.task_types.get(
            DEFAULT_TASK_TYPE, {}).get("framing", DEFAULT_FRAMING)

    def select_pattern(self, question: str, task_type: str) -> str:
        """Pattern for the task type; the selector seam is consulted only
        when the task type admits more than one valid pattern, and an
        invalid or failing answer falls back to the first valid pattern
        (:117-153)."""
        task_config = self.task_types.get(task_type, {})
        valid = task_config.get("valid_patterns", list(self.patterns.keys()))
        if len(valid) <= 1:
            return valid[0] if valid else DEFAULT_PATTERN
        try:
            if self.selector is not None:
                selected = _normalize_llm_choice(self.selector(
                    question, task_type, task_config,
                    {p: self.patterns[p] for p in valid
                     if p in self.patterns}))
                if selected in valid:
                    return selected
        except Exception:
            pass
        return valid[0] if valid else DEFAULT_PATTERN

    def route(self, question: str):
        """(pattern, task_type, framing) — the full pipeline (:155-173)."""
        task_type, framing = self.identify_task_type(question)
        pattern = self.select_pattern(question, task_type)
        return pattern, task_type, framing


# ---------------------------------------------------------------------------
# Aggregator (aggregator.py:26-165)
# ---------------------------------------------------------------------------


class Aggregator:
    """Fan-out correlation tracking: registered with the expected sibling
    count, fed per-subagent completions, drained into a synthesis request
    once all siblings have reported. Clock injectable so stale-cleanup is
    testable deterministically."""

    def __init__(self, timeout: int = DEFAULT_AGGREGATOR_TIMEOUT,
                 clock=time.time):
        self.timeout = timeout
        self._clock = clock
        self.correlations: Dict[str, dict] = {}

    def register_fanout(self, correlation_id: str, parent_session_id: str,
                        expected_siblings: int, request_template=None):
        self.correlations[correlation_id] = {
            "parent_session_id": parent_session_id,
            "expected": expected_siblings,
            "results": {},
            "request_template": request_template,
            "created_at": self._clock(),
        }

    def record_completion(self, correlation_id: str, subagent_goal: str,
                          result: str):
        """True once all siblings reported, False while pending, None for
        an unknown correlation."""
        if correlation_id not in self.correlations:
            return None
        entry = self.correlations[correlation_id]
        entry["results"][subagent_goal] = result
        return len(entry["results"]) >= entry["expected"]

    def get_original_request(self, correlation_id: str):
        entry = self.correlations.get(correlation_id)
        return None if entry is None else entry["request_template"]

    def get_results(self, correlation_id: str):
        entry = self.correlations.pop(correlation_id, None)
        if entry is None:
            return None, None, None
        return (entry["results"], entry["parent_session_id"],
                entry["request_template"])

    def build_synthesis_request(self, correlation_id: str,
                                original_question: str,
                                collection: str) -> AgentRequest:
        """Consume the correlation into the supervisor synthesis request:
        template history + an appended 'synthesise' step whose observation
        is the results JSON (aggregator.py:110-153)."""
        results, parent_session_id, template = self.get_results(
            correlation_id)
        if results is None:
            raise RuntimeError(
                f"No results for correlation_id {correlation_id}")
        synthesis_step = AgentStep(
            thought="All subagents completed",
            action="aggregate",
            arguments={},
            observation=json.dumps(results),
            step_type="synthesise",
            subagent_results=results,
        )
        history = list(template.history) if template and template.history \
            else []
        history.append(synthesis_step)
        return AgentRequest(
            question=original_question,
            state="",
            group=template.group if template else [],
            history=history,
            collection=collection,
            streaming=template.streaming if template else False,
            session_id=parent_session_id,
            conversation_id=template.conversation_id if template else "",
            pattern="supervisor",
            task_type=template.task_type if template else "",
            framing=template.framing if template else "",
        )

    def cleanup_stale(self) -> List[str]:
        now = self._clock()
        stale = [cid for cid, e in self.correlations.items()
                 if now - e["created_at"] > self.timeout]
        for cid in stale:
            self.correlations.pop(cid, None)
        return stale


# ---------------------------------------------------------------------------
# Plan-then-execute kernels (plan_pattern.py)
# ---------------------------------------------------------------------------


def extract_plan(history: List[AgentStep]) -> Optional[List[PlanStep]]:
    """Most recent plan in history — execute steps carry the updated plan
    with completion statuses, so the LAST plan-bearing step wins
    (plan_pattern.py:85-96)."""
    if not history:
        return None
    for step in reversed(history):
        if step.plan:
            return list(step.plan)
    return None


def find_next_pending_step(plan: List[PlanStep]) -> Optional[int]:
    """Index of the first 'pending' step, None when the plan is done
    (plan_pattern.py:98-103)."""
    for i, step in enumerate(plan):
        if getattr(step, "status", "pending") == "pending":
            return i
    return None


def validate_plan_steps(objects) -> List[dict]:
    """Planner-seam output validation: a non-list or empty result falls
    back to the single direct-answer step (plan_pattern.py:142-146)."""
    if not isinstance(objects, list) or not objects:
        return [{"goal": "Answer the question directly", "tool_hint": "",
                 "depends_on": []}]
    return objects


def build_plan_steps(objects) -> List[PlanStep]:
    """Planner dicts -> PlanStep objects, all pending
    (plan_pattern.py:159-169)."""
    return [
        PlanStep(
            goal=o.get("goal", ""),
            tool_hint=o.get("tool_hint", ""),
            depends_on=o.get("depends_on", []),
            status="pending",
            result="",
        )
        for o in validate_plan_steps(objects)
    ]


def gather_dependency_results(plan: List[PlanStep],
                              step: PlanStep) -> List[dict]:
    """Completed results of the step's declared dependencies, index-tagged
    (plan_pattern.py:231-243); out-of-range indices and empty results are
    skipped."""
    out = []
    for dep_idx in getattr(step, "depends_on", []) or []:
        if 0 <= dep_idx < len(plan):
            dep_result = getattr(plan[dep_idx], "result", "")
            if dep_result:
                out.append({"index": dep_idx, "result": dep_result})
    return out


def complete_plan_step(plan: List[PlanStep], idx: int,
                       result: str) -> List[PlanStep]:
    """New plan list with step idx marked completed and its result
    recorded (the execute-iteration status update)."""
    out = [dataclasses.replace(s) for s in plan]
    out[idx].status = "completed"
    out[idx].result = result
    return out


# ---------------------------------------------------------------------------
# Supervisor kernels (supervisor_pattern.py)
# ---------------------------------------------------------------------------


def validate_subagent_goals(objects, question: str,
                            max_subagents: int = MAX_SUBAGENTS) -> List[str]:
    """Decomposer-seam output validation: keep string goals only, cap at
    MAX_SUBAGENTS, fall back to the original question when nothing valid
    remains (supervisor_pattern.py:133-140)."""
    goals = objects if isinstance(objects, list) else []
    goals = [g for g in goals if isinstance(g, str)]
    # dedupe (order-preserving) — the reference does not, and duplicate
    # goals deadlock its aggregator: results are keyed by goal string
    # while expected_siblings counts duplicates, so the correlation
    # never completes (aggregator.py:65-90). Deliberate fix.
    goals = list(dict.fromkeys(goals))
    goals = goals[:max_subagents]
    return goals if goals else [question]


def has_synthesis_results(request: AgentRequest) -> bool:
    """Synthesis phase detection: any history step typed 'synthesise'
    with subagent results (supervisor_pattern.py:63-72)."""
    return bool(
        request.history
        and any(
            getattr(h, "step_type", "") == "synthesise"
            and getattr(h, "subagent_results", None)
            for h in request.history
        )
    )


def collect_subagent_results(request: AgentRequest) -> Dict[str, str]:
    """Merge subagent results across history steps; empty -> the
    reference's '(no results)' placeholder (supervisor_pattern.py:199-210)."""
    results: Dict[str, str] = {}
    for step in request.history:
        r = getattr(step, "subagent_results", None)
        if r:
            results.update(r)
    if not results:
        results = {"(no results)": "No subagent results available"}
    return results


def build_fanout_requests(request: AgentRequest, goals: List[str],
                          correlation_id: Optional[str] = None,
                          session_factory=None) -> List[AgentRequest]:
    """One subagent AgentRequest per goal: fresh session, empty history,
    react pattern, non-streaming, correlation + parent + sibling count
    attached (supervisor_pattern.py:156-176). ``session_factory`` is
    injectable for deterministic tests (defaults to uuid4)."""
    correlation_id = correlation_id or str(uuid.uuid4())
    session_factory = session_factory or (lambda i: str(uuid.uuid4()))
    return [
        AgentRequest(
            question=goal,
            group=list(request.group),
            history=[],
            collection=request.collection,
            streaming=False,
            session_id=session_factory(i),
            conversation_id=request.conversation_id,
            pattern="react",
            task_type=request.task_type,
            framing=request.framing,
            correlation_id=correlation_id,
            parent_session_id=request.session_id,
            subagent_goal=goal,
            expected_siblings=len(goals),
        )
        for i, goal in enumerate(goals)
    ]


# ---------------------------------------------------------------------------
# MCP tool registry (agent/mcp_tool/service.py:13-105)
# ---------------------------------------------------------------------------


class McpToolRegistry:
    """Per-workspace MCP service registry: config parsing, endpoint and
    auth-header resolution with the reference's error contract, and
    result shaping. The HTTP/MCP session itself is a pluggable
    ``transport(url, headers, remote_name, parameters)`` seam — the only
    non-deterministic part of the reference service."""

    def __init__(self, transport: Optional[Callable] = None):
        self.transport = transport
        self.mcp_services: Dict[str, Dict[str, dict]] = {}

    def update_config(self, workspace: str, config: dict):
        """Config-handler parity (:23-33): absent 'mcp' section clears the
        workspace registry; values are JSON service descriptors."""
        if "mcp" not in config:
            self.mcp_services[workspace] = {}
            return
        self.mcp_services[workspace] = {
            k: json.loads(v) for k, v in config["mcp"].items()
        }

    def resolve(self, workspace: str, name: str):
        """(url, remote_name, headers) for a tool, with the reference's
        unknown-service / missing-url errors (:34-52)."""
        ws_services = self.mcp_services.get(workspace, {})
        if name not in ws_services:
            raise RuntimeError(
                f"MCP service {name} not known in workspace {workspace}")
        svc = ws_services[name]
        if "url" not in svc:
            raise RuntimeError(f"MCP service {name} URL not defined")
        remote_name = svc.get("remote-name", name)
        headers = {}
        if "auth-token" in svc:
            headers["Authorization"] = f"Bearer {svc['auth-token']}"
        return svc["url"], remote_name, headers

    @staticmethod
    def shape_result(result) -> Any:
        """Result shaping (:96-104): structured content wins, else the
        concatenated text parts, else 'No content'."""
        structured = getattr(result, "structuredContent", None)
        if structured:
            return structured
        if hasattr(result, "content"):
            return "".join(x.text for x in result.content)
        return "No content"

    def invoke(self, workspace: str, name: str, parameters: dict):
        url, remote_name, headers = self.resolve(workspace, name)
        if self.transport is None:
            raise RuntimeError("No MCP transport bound")
        return self.shape_result(
            self.transport(url, headers, remote_name, parameters))
