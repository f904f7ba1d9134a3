"""ReAct agent deterministic kernel (reference parity, clean-room).

Replicates the reference agent framework's deterministic core — the part a
TrustGraph user hits on every agentic-QA request — with the LLM call as the
established pluggable seam (the same pattern as the E2/E3 extractors):

- ``parse_react_response`` — the Thought / Action / Args / Final-Answer
  grammar with markdown-fence stripping, multi-line fields, quoted action
  names and brace-counted JSON args
  (trustgraph-flow/trustgraph/agent/react/agent_manager.py:18-172).
- ``StreamingReActParser`` — the incremental state-machine parser that
  survives delimiters and JSON split across stream-chunk boundaries
  (agent/react/streaming_parser.py:24-353).
- ``filter_tools_by_group_and_state`` / ``get_next_state`` /
  ``validate_tool_config`` — the tool-group availability spec
  (agent/tool_filter.py:14-165).
- ``AgentManager.reason`` / ``.react`` + ``run_agent`` — the
  reason→act→observe loop with tool dispatch, parse-error recovery
  ("__parse_error__" pseudo-action), tool-error capture ("Error: {e}"
  observations) and the max-iterations guard
  (agent_manager.py:174-395; react/service.py:357-419).
- agent provenance URI dialect (trustgraph-base/trustgraph/provenance/
  uris.py:167-236).

Spark side: ``react_trace_sessions`` + ``run_react_traces`` execute a
batch of deterministic scripted agent sessions as ONE distributed plan.
Tool execution is BATCHED: where the reference invokes its GraphRAG /
structured-query backends once per request, here a single broadcast join
per tool resolves every session's observation in one pass (the same
batched-seam pattern as the round-4 ontology matcher), and the per-session
reason/parse/dispatch loop runs inside a narrow ``mapInPandas`` over the
joined rows.

Seam rationale (CLAUDE.md invariant): ReAct response parsing is
string-state-machine logic over LLM output — the same class as the
sanctioned extraction seam. All tool DATA work stays in Catalyst (two
map-side-combinable groupBy counts + two broadcast joins); the Python seam
only parses scripted text and formats per-row observations, so it stays
O(sessions) narrow work with no shuffle.
"""

from __future__ import annotations

import dataclasses
import json
import re
import uuid
from enum import Enum
from typing import Any, Callable, Dict, Iterator, List, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Types (agent/react/types.py:5-40)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Argument:
    name: str
    type: str
    description: str


@dataclasses.dataclass
class Tool:
    name: str
    description: str
    arguments: List[Argument]
    implementation: Any
    config: Dict[str, Any]


@dataclasses.dataclass
class Action:
    thought: str
    name: str
    arguments: dict
    observation: str
    tool_error: Optional[str] = None


@dataclasses.dataclass
class Final:
    thought: str
    final: str


# ---------------------------------------------------------------------------
# Batch response parser (agent_manager.py:18-172)
# ---------------------------------------------------------------------------

_THOUGHT = "Thought:"
_ACTION = "Action:"
_ARGS = "Args:"
_FINAL = "Final Answer:"


def parse_react_response(text: str):
    """Parse a complete ReAct response into an :class:`Action` or
    :class:`Final`.

    Grammar parity with agent_manager.py:18-172: markdown fences stripped,
    multi-line thoughts joined with single spaces, quoted action names
    unwrapped, Args JSON collected by brace counting (same-line or
    following lines), Final Answer returned immediately — JSON answers are
    kept as raw text joined with newlines, plain answers joined with
    spaces. Raises ``ValueError`` on malformed Args JSON, a thought with no
    action/answer, or an unparseable response.
    """
    if not isinstance(text, str):
        raise ValueError(f"Expected string response, got {type(text)}")

    text = re.sub(r"^```[^\n]*\n", "", text.strip())
    text = re.sub(r"\n```$", "", text.strip())

    lines = text.strip().split("\n")
    thought = None
    action = None
    args = None

    i = 0
    while i < len(lines):
        line = lines[i].strip()

        if line.startswith(_THOUGHT):
            thought = line[len(_THOUGHT):].strip()
            i += 1
            while i < len(lines):
                nxt = lines[i].strip()
                if nxt.startswith((_ACTION, _FINAL, _ARGS)):
                    break
                thought += " " + nxt
                i += 1
            continue

        if line.startswith(_FINAL):
            final_answer = line[len(_FINAL):].strip()
            i += 1
            if final_answer.startswith("{") or (
                i < len(lines) and lines[i].strip().startswith("{")
            ):
                # JSON answer: collect stripped lines joined by newlines
                # until braces balance; kept as raw text (reference leaves
                # the json.loads attempt commented out, :85-90).
                json_text = final_answer if final_answer.startswith("{") else ""
                brace = json_text.count("{") - json_text.count("}")
                while i < len(lines) and (brace > 0 or not json_text):
                    cur = lines[i].strip()
                    if cur.startswith((_THOUGHT, _ACTION)) and brace == 0:
                        break
                    json_text += ("\n" if json_text else "") + cur
                    brace += cur.count("{") - cur.count("}")
                    i += 1
                final_answer = json_text
            else:
                while i < len(lines):
                    nxt = lines[i].strip()
                    if nxt.startswith((_THOUGHT, _ACTION)):
                        break
                    final_answer += " " + nxt
                    i += 1
            return Final(thought=thought or "", final=final_answer)

        if line.startswith(_ACTION):
            action = line[len(_ACTION):].strip()
            # LLMs sometimes quote the tool name; strip any depth of quotes
            while action and action[0] == '"':
                action = action[1:]
            while action and action[-1] == '"':
                action = action[:-1]

        if line.startswith(_ARGS):
            same_line = line[len(_ARGS):].strip()
            if same_line:
                args_text = same_line
                brace = same_line.count("{") - same_line.count("}")
            else:
                args_text = ""
                brace = 0
            started = bool(same_line and "{" in same_line)
            i += 1
            while i < len(lines) and (not started or brace > 0):
                cur = lines[i]
                args_text += ("\n" if args_text else "") + cur
                for ch in cur:
                    if ch == "{":
                        brace += 1
                        started = True
                    elif ch == "}":
                        brace -= 1
                if started and brace == 0:
                    break
                i += 1
            try:
                args = json.loads(args_text.strip())
            except json.JSONDecodeError as e:
                raise ValueError(f"Invalid JSON in Args: {e}")

        i += 1

    if action:
        return Action(thought=thought or "", name=action,
                      arguments=args or {}, observation="")

    if thought and not action:
        raise ValueError(
            f"Response has thought but no action or final answer: {text}"
        )

    raise ValueError(f"Could not parse response: {text}")


# ---------------------------------------------------------------------------
# Streaming parser (streaming_parser.py:24-353)
# ---------------------------------------------------------------------------


class ParserState(Enum):
    INITIAL = "initial"
    THOUGHT = "thought"
    ACTION = "action"
    ARGS = "args"
    FINAL_ANSWER = "final_answer"
    COMPLETE = "complete"


class StreamingReActParser:
    """Incremental ReAct parser that tolerates delimiters and JSON split
    across chunk boundaries (streaming_parser.py:34-353): a bounded
    tail buffer (``MAX_DELIMITER_BUFFER``) holds potential partial
    delimiters, thought/answer text is emitted through callbacks as it
    arrives, Args JSON completion is detected by per-character brace
    counting, and ``finalize()`` closes a Final Answer at end of stream or
    raises if the stream ends mid-parse.
    """

    MAX_DELIMITER_BUFFER = 20

    def __init__(self, on_thought_chunk=None, on_answer_chunk=None):
        self.on_thought_chunk = on_thought_chunk
        self.on_answer_chunk = on_answer_chunk
        self.state = ParserState.INITIAL
        self.line_buffer = ""
        self.thought_buffer = ""
        self.action_buffer = ""
        self.args_buffer = ""
        self.answer_buffer = ""
        self.brace_count = 0
        self.args_started = False
        self.result = None

    def feed(self, chunk: str) -> None:
        if self.state == ParserState.COMPLETE:
            return
        self.line_buffer += chunk
        self.line_buffer = re.sub(r"^```[^\n]*\n", "", self.line_buffer)
        self.line_buffer = re.sub(r"\n```$", "", self.line_buffer)

        while self.line_buffer and self.state != ParserState.COMPLETE:
            prev_len = len(self.line_buffer)
            prev_state = self.state
            if self.state == ParserState.INITIAL:
                self._initial()
            elif self.state == ParserState.THOUGHT:
                self._thought()
            elif self.state == ParserState.ACTION:
                self._action()
            elif self.state == ParserState.ARGS:
                self._args()
            elif self.state == ParserState.FINAL_ANSWER:
                self._final_answer()
            # no progress -> wait for the next chunk
            if len(self.line_buffer) == prev_len and self.state == prev_state:
                break

    def _initial(self) -> None:
        idx = self.line_buffer.find(_THOUGHT)
        if idx >= 0:
            self.line_buffer = self.line_buffer[idx + len(_THOUGHT):].lstrip()
            self.state = ParserState.THOUGHT
        elif len(self.line_buffer) >= self.MAX_DELIMITER_BUFFER:
            # junk before Thought: keep only a tail that could still hold a
            # partial delimiter
            self.line_buffer = self.line_buffer[-self.MAX_DELIMITER_BUFFER:]

    def _thought(self) -> None:
        action_idx = self.line_buffer.find(_ACTION)
        final_idx = self.line_buffer.find(_FINAL)

        next_idx = -1
        next_state = None
        delim_len = 0
        if action_idx >= 0 and (final_idx < 0 or action_idx < final_idx):
            next_idx, next_state, delim_len = (
                action_idx, ParserState.ACTION, len(_ACTION))
        elif final_idx >= 0:
            next_idx, next_state, delim_len = (
                final_idx, ParserState.FINAL_ANSWER, len(_FINAL))

        if next_idx >= 0:
            chunk = self.line_buffer[:next_idx].strip()
            if chunk:
                self.thought_buffer += chunk
                if self.on_thought_chunk:
                    self.on_thought_chunk(chunk)
            self.line_buffer = self.line_buffer[next_idx + delim_len:].lstrip()
            self.state = next_state
        elif len(self.line_buffer) > self.MAX_DELIMITER_BUFFER:
            emit = self.line_buffer[:-self.MAX_DELIMITER_BUFFER]
            self.thought_buffer += emit
            if self.on_thought_chunk:
                self.on_thought_chunk(emit)
            self.line_buffer = self.line_buffer[-self.MAX_DELIMITER_BUFFER:]

    def _action(self) -> None:
        newline_idx = self.line_buffer.find("\n")
        args_idx = self.line_buffer.find(_ARGS)

        if args_idx >= 0 and (newline_idx < 0 or args_idx < newline_idx):
            if not self.action_buffer:
                self.action_buffer = (
                    self.line_buffer[:args_idx].strip().strip('"'))
            self.line_buffer = self.line_buffer[args_idx + len(_ARGS):].lstrip()
            self.state = ParserState.ARGS
        elif newline_idx >= 0:
            if not self.action_buffer:
                self.action_buffer = (
                    self.line_buffer[:newline_idx].strip().strip('"'))
            self.line_buffer = self.line_buffer[newline_idx + 1:]
            if self.line_buffer.lstrip().startswith(_ARGS):
                start = self.line_buffer.find(_ARGS)
                self.line_buffer = self.line_buffer[start + len(_ARGS):].lstrip()
                self.state = ParserState.ARGS
        elif len(self.line_buffer) > 100:
            # very long single-line buffer: assume the name is complete
            self.action_buffer = self.line_buffer.strip().strip('"')
            self.line_buffer = ""
            self.state = ParserState.ARGS

    def _args(self) -> None:
        i = 0
        while i < len(self.line_buffer):
            ch = self.line_buffer[i]
            self.args_buffer += ch
            if ch == "{":
                self.brace_count += 1
                self.args_started = True
            elif ch == "}":
                self.brace_count -= 1
            if self.args_started and self.brace_count == 0:
                try:
                    args_dict = json.loads(self.args_buffer.strip())
                except json.JSONDecodeError as e:
                    raise ValueError(f"Invalid JSON in Args: {e}")
                self.result = Action(
                    thought=self.thought_buffer.strip(),
                    name=self.action_buffer,
                    arguments=args_dict,
                    observation="",
                )
                self.state = ParserState.COMPLETE
                self.line_buffer = ""
                return
            i += 1
        self.line_buffer = ""

    def _final_answer(self) -> None:
        # the reference splits a JSON-vs-text branch here, but both arms
        # execute the identical append/emit/clear (its brace counting is
        # inert, streaming_parser.py:276-303) — collapsed to one block
        if self.line_buffer:
            self.answer_buffer += self.line_buffer
            if self.on_answer_chunk:
                self.on_answer_chunk(self.line_buffer)
            self.line_buffer = ""

    def finalize(self) -> None:
        if self.state == ParserState.COMPLETE:
            return
        if self.state == ParserState.THOUGHT and self.line_buffer:
            self.thought_buffer += self.line_buffer
            if self.on_thought_chunk:
                self.on_thought_chunk(self.line_buffer)
            self.line_buffer = ""
        if self.state == ParserState.FINAL_ANSWER:
            if self.line_buffer:
                self.answer_buffer += self.line_buffer
                if self.on_answer_chunk:
                    self.on_answer_chunk(self.line_buffer)
                self.line_buffer = ""
            self.result = Final(
                thought=self.thought_buffer.strip(),
                final=self.answer_buffer.strip(),
            )
            self.state = ParserState.COMPLETE
        if self.state not in (ParserState.COMPLETE, ParserState.FINAL_ANSWER):
            if self.thought_buffer:
                raise ValueError(
                    f"Stream ended in {self.state.value} state with "
                    f"incomplete parsing. Thought: {self.thought_buffer[:100]}..."
                )
            raise ValueError(
                f"Stream ended in {self.state.value} state with no content"
            )

    def is_complete(self) -> bool:
        return self.state == ParserState.COMPLETE

    def get_result(self):
        return self.result


# ---------------------------------------------------------------------------
# Tool filtering (agent/tool_filter.py:14-165)
# ---------------------------------------------------------------------------


def filter_tools_by_group_and_state(
    tools: Dict[str, Any],
    requested_groups: Optional[List[str]] = None,
    current_state: Optional[str] = None,
) -> Dict[str, Any]:
    """Tool is visible iff (tool groups ∩ requested groups ≠ ∅ or "*"
    requested) AND (current state ∈ applicable-states or "*" applicable).
    Defaults: requested=["default"], state="undefined"."""
    if requested_groups is None:
        requested_groups = ["default"]
    if current_state is None or current_state == "":
        current_state = "undefined"
    return {
        name: tool
        for name, tool in tools.items()
        if _tool_available(tool, requested_groups, current_state)
    }


def _tool_available(tool, requested_groups, current_state) -> bool:
    config = getattr(tool, "config", {}) or {}
    groups = config.get("group", ["default"])
    if not isinstance(groups, list):
        groups = [groups]
    states = config.get("applicable-states", ["*"])
    if not isinstance(states, list):
        states = [states]
    group_match = ("*" in requested_groups
                   or bool(set(groups) & set(requested_groups)))
    state_match = "*" in states or current_state in states
    return group_match and state_match


def get_next_state(tool, current_state: str) -> str:
    config = getattr(tool, "config", {}) or {}
    nxt = config.get("state")
    return nxt if nxt else current_state


def validate_tool_config(config: Dict[str, Any]) -> None:
    if "group" in config:
        groups = config["group"]
        if not isinstance(groups, list):
            raise ValueError("Tool 'group' field must be a list of strings")
        if not all(isinstance(g, str) for g in groups):
            raise ValueError("All group names must be strings")
    if "state" in config:
        if not isinstance(config["state"], str):
            raise ValueError("Tool 'state' field must be a string")
    if "applicable-states" in config:
        states = config["applicable-states"]
        if not isinstance(states, list):
            raise ValueError(
                "Tool 'applicable-states' field must be a list of strings")
        if not all(isinstance(s, str) for s in states):
            raise ValueError("All state names must be strings")


# ---------------------------------------------------------------------------
# Agent provenance URI dialect (provenance/uris.py:167-236)
# ---------------------------------------------------------------------------


def agent_session_uri(session_id: Optional[str] = None) -> str:
    if session_id is None:
        session_id = str(uuid.uuid4())
    return f"urn:trustgraph:agent:{session_id}"


def agent_iteration_uri(session_id: str, iteration_num: int) -> str:
    return f"urn:trustgraph:agent:{session_id}/i{iteration_num}"


def agent_thought_uri(session_id: str, iteration_num: int) -> str:
    return f"urn:trustgraph:agent:{session_id}/i{iteration_num}/thought"


def agent_observation_uri(session_id: str, iteration_num: int) -> str:
    return f"urn:trustgraph:agent:{session_id}/i{iteration_num}/observation"


def agent_final_uri(session_id: str) -> str:
    return f"urn:trustgraph:agent:{session_id}/final"


# ---------------------------------------------------------------------------
# Agent loop (agent_manager.py:174-395, react/service.py:357-419)
# ---------------------------------------------------------------------------

PARSE_ERROR_ACTION = "__parse_error__"
DEFAULT_MAX_ITERATIONS = 10  # react/service.py:50


class AgentManager:
    """Reason→act→observe kernel. ``responder(variables) -> str`` is the
    LLM seam (the reference's prompt-service ``agent_react`` call,
    agent_manager.py:256-295): it receives the same variables dict the
    reference templates — question, tool descriptors, tool_names, context,
    history — and returns raw ReAct text. ``use_streaming_parser`` routes
    the text through :class:`StreamingReActParser` in fixed-size chunks
    (the reference's streaming path); parse failures yield the
    ``__parse_error__`` pseudo-action instead of raising, exactly as
    :174-312 does.
    """

    def __init__(self, tools: Dict[str, Tool],
                 responder: Callable[[dict], str],
                 additional_context=None,
                 use_streaming_parser: bool = False,
                 stream_chunk_size: int = 7):
        self.tools = tools
        self.responder = responder
        self.additional_context = additional_context
        self.use_streaming_parser = use_streaming_parser
        self.stream_chunk_size = stream_chunk_size

    def _variables(self, question: str, history: List[Action]) -> dict:
        return {
            "question": question,
            "tools": [
                {
                    "name": t.name,
                    "description": t.description,
                    "arguments": [
                        {"name": a.name, "type": a.type,
                         "description": a.description}
                        for a in t.arguments
                    ],
                }
                for t in self.tools.values()
            ],
            "context": self.additional_context,
            "tool_names": ",".join(self.tools.keys()),
            "history": [
                {
                    "thought": h.thought,
                    "action": h.name,
                    "arguments": h.arguments,
                    "observation": h.observation,
                }
                for h in history
            ],
        }

    def reason(self, question: str, history: List[Action]):
        text = self.responder(self._variables(question, history))
        if self.use_streaming_parser:
            parser = StreamingReActParser()
            try:
                for ofs in range(0, len(text), self.stream_chunk_size):
                    parser.feed(text[ofs:ofs + self.stream_chunk_size])
                parser.finalize()
                result = parser.get_result()
            except ValueError:
                result = None
            if result is None:
                return Action(
                    thought="", name=PARSE_ERROR_ACTION, arguments={},
                    observation="",
                    tool_error="LLM response could not be parsed (streaming)",
                )
            return result
        try:
            return parse_react_response(text)
        except ValueError as e:
            return Action(
                thought="", name=PARSE_ERROR_ACTION, arguments={},
                observation="", tool_error=f"LLM parse error: {e}",
            )

    def react(self, question: str, history: List[Action], context=None):
        """One iteration: reason, then (for actions) dispatch the tool and
        record its response — or ``Error: {e}`` — as the observation."""
        act = self.reason(question, history)
        if isinstance(act, Final):
            return act

        if act.name == PARSE_ERROR_ACTION:
            act.observation = f"Error: {act.tool_error}"
            return act

        if act.name in self.tools:
            tool = self.tools[act.name]
        else:
            raise RuntimeError(f"No action for {act.name}!")

        try:
            resp = tool.implementation(context).invoke(**act.arguments)
            resp = (resp if isinstance(resp, str) else str(resp)).strip()
            act.tool_error = None
        except Exception as e:
            resp = f"Error: {e}"
            act.tool_error = str(e)
        act.observation = resp
        return act


def run_agent(manager: AgentManager, question: str, context=None,
              max_iterations: int = DEFAULT_MAX_ITERATIONS):
    """Service-loop semantics (react/service.py:357-419): iterate until a
    Final, appending each Action (with observation) to history; raise
    ``RuntimeError("Too many agent iterations")`` once history reaches
    ``max_iterations``."""
    history: List[Action] = []
    while True:
        if len(history) >= max_iterations:
            raise RuntimeError("Too many agent iterations")
        act = manager.react(question, history, context=context)
        if isinstance(act, Final):
            return history, act
        history.append(act)


# ---------------------------------------------------------------------------
# Batched tool implementations (tools.py analog, Spark-first)
# ---------------------------------------------------------------------------


class BatchLookupImpl:
    """Tool implementation whose answer was precomputed by a single Spark
    join for the whole session batch (vs the reference's per-request
    backend call, tools.py:11-60 KnowledgeQueryImpl / :118-152
    StructuredQueryImpl). ``context`` is the session row; ``invoke``
    formats the row's joined value, or raises when the row is flagged as a
    backend failure (driving the react() error-capture path)."""

    obs_field = "obs_knowledge"

    def __init__(self, context):
        self.context = context

    def invoke(self, **arguments):
        if self.context.get("fail"):
            raise RuntimeError("backend unavailable")
        return self.context[self.obs_field]


class KnowledgeLookupImpl(BatchLookupImpl):
    obs_field = "obs_knowledge"


class StructuredLookupImpl(BatchLookupImpl):
    obs_field = "obs_structured"


def scripted_tools() -> Dict[str, Tool]:
    """The deterministic tool registry for scripted traces: two default-
    group tools backed by batched Spark joins, plus an 'audit'-group tool
    gated to the 'review' state so the group/state filter is exercised in
    the driver-gated path."""
    return {
        "knowledge_query": Tool(
            name="knowledge_query",
            description="Ask the knowledge graph about an entity",
            arguments=[Argument("entity", "string", "entity label")],
            implementation=KnowledgeLookupImpl,
            config={"group": ["default"]},
        ),
        "structured_query": Tool(
            name="structured_query",
            description="Ask a natural-language question over structured rows",
            arguments=[Argument("status", "string", "order status code")],
            implementation=StructuredLookupImpl,
            config={"group": ["default"]},
        ),
        "audit_log": Tool(
            name="audit_log",
            description="Record an audit event (review state only)",
            arguments=[Argument("note", "string", "audit note")],
            implementation=BatchLookupImpl,
            config={"group": ["audit"], "applicable-states": ["review"]},
        ),
    }


class ScriptedResponder:
    """Deterministic LLM stand-in for the reason seam: step 1 emits a
    ReAct action request for the session's tool in one of three surface
    formats (plain / fenced+quoted+multi-line-args / junk-prefixed with
    same-line args — all parsing to identical fields); step 2 reads the
    step-1 observation out of the history (the genuine ReAct data flow)
    and emits the Final Answer. Sessions flagged ``bad_args`` emit
    malformed Args JSON to drive the __parse_error__ recovery path.
    Lives in the package because it is pickled into mapInPandas."""

    def __init__(self, row: dict):
        self.row = row

    def __call__(self, variables: dict) -> str:
        r = self.row
        n_actions = 2 if r.get("two_step") else 1
        h = variables["history"]
        if len(h) >= n_actions:
            # all tool calls done: conclude over every observation seen
            obs = " | ".join(step["observation"] for step in h)
            return ("Thought: Observation received.\n"
                    f"Final Answer: Concluded: {obs}")
        if len(h) == 1:
            # second action of a two-step session: plain format, the
            # structured follow-up (the genuine multi-iteration flow —
            # the loop re-enters reason() with the observation in history)
            return (f"Thought: Need structured_query for {r['status']}.\n"
                    "Action: structured_query\n"
                    f'Args: {{"status": "{r["status"]}"}}')
        thought = f"Need {r['tool_name']} for {r['arg_val']}."
        args = json.dumps({r["arg_key"]: r["arg_val"]})
        if r.get("bad_args"):
            return f"Thought: {thought}\nAction: {r['tool_name']}\nArgs: {{not json}}"
        fmt = r["fmt"]
        if fmt == 1:
            return (
                "```json\n"
                f"Thought: {thought}\n"
                f'Action: "{r["tool_name"]}"\n'
                "Args: {\n"
                f'  "{r["arg_key"]}": {json.dumps(r["arg_val"])}\n'
                "}\n"
                "```"
            )
        if fmt == 2:
            return (f"noise line\nThought: {thought}\n"
                    f"Action: {r['tool_name']}\nArgs: {args}")
        return (f"Thought: {thought}\nAction: {r['tool_name']}\n"
                f"Args: {args}")


# The exact json.loads failure text for "{not json}" — pinned so the DuckDB
# oracle can reproduce the __parse_error__ observation byte-for-byte.
BAD_ARGS_ERROR = (
    "Error: LLM parse error: Invalid JSON in Args: Expecting property name "
    "enclosed in double quotes: line 1 column 2 (char 1)"
)

_TRACE_SCHEMA = (
    "session_id string, step int, question string, thought string, "
    "action string, args_json string, observation string, "
    "tool_error string, kind string, tool_candidates string"
)


def react_trace_sessions(docs: DataFrame, orders: DataFrame) -> DataFrame:
    """Build the deterministic scripted-session batch: one session per
    ``doc_id % 10 == 3`` document, tool / response format / parser /
    group-state rotation keyed on the decade index ``d = doc_id // 10``,
    and each session's tool observation resolved by ONE broadcast join —
    entity mention degrees (bounded label vocabulary) for knowledge_query,
    per-status order counts (3 rows) for structured_query. Both join
    sides are map-side-combinable groupBy counts, so the whole batch costs
    two small shuffles regardless of session count."""
    from .planted import planted_mention_triples

    did = F.col("doc_id")
    d = F.expr("doc_id div 10")

    base = F.concat(F.lit("entity "), (did % 40).cast("string"))
    label = F.when(did % 3 == 0, F.concat(base, F.lit("s"))).otherwise(base)
    status = (
        F.when(did % 3 == 0, F.lit("F"))
        .when(did % 3 == 1, F.lit("O"))
        .otherwise(F.lit("P"))
    )
    tool = F.when(d % 2 == 1, F.lit("knowledge_query")).otherwise(
        F.lit("structured_query"))

    sessions = docs.where(did % 10 == 3).select(
        F.concat(F.lit("urn:trustgraph:agent:s"), did.cast("string"))
        .alias("session_id"),
        did.alias("doc_id"),
        # d % 10 == 1 sessions run TWO tool iterations (knowledge then
        # structured) so the multi-iteration loop and the
        # observation(N-1) -> iteration(N) lineage are driver-gated
        (d % 10 == 1).alias("two_step"),
        (d % 3).cast("int").alias("fmt"),
        # parse-error sessions are forced through the batch parser so the
        # error text is the deterministic json.loads message (the streaming
        # path's "could not be parsed" variant is pytest-covered)
        F.when((d % 10 != 7) & (d % 4 < 2), F.lit("stream"))
        .otherwise(F.lit("batch")).alias("parser_kind"),
        tool.alias("tool_name"),
        F.when(tool == "knowledge_query", F.lit("entity"))
        .otherwise(F.lit("status")).alias("arg_key"),
        F.when(tool == "knowledge_query", label).otherwise(status)
        .alias("arg_val"),
        status.alias("status"),
        (d % 10 == 7).alias("bad_args"),
        (d % 10 == 9).alias("fail"),
        F.when(d % 5 == 0, F.array(F.lit("default"), F.lit("audit")))
        .otherwise(F.array(F.lit("default"))).alias("groups"),
        F.when(d % 10 == 0, F.lit("review")).otherwise(F.lit(None))
        .alias("current_state"),
    )

    deg = (
        planted_mention_triples(docs)
        .groupBy(F.col("o").alias("lbl"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_mentions"))
    )
    ostat = (
        orders.groupBy(F.col("o_orderstatus").alias("st"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
    )

    # both tool dimensions join unconditionally: knowledge sessions use
    # the degree side, structured sessions the status side, two-step
    # sessions both — one plan either way
    joined = (
        sessions
        .join(F.broadcast(deg), sessions.arg_val == deg.lbl, "left")
        .join(F.broadcast(ostat), sessions.status == ostat.st, "left")
    )
    obs_knowledge = F.concat(
        F.col("arg_val"), F.lit(" has "),
        F.coalesce(F.col("n_mentions"), F.lit(0)).cast("string"),
        F.lit(" mentions"))
    obs_structured = F.concat(
        F.lit('{"status": "'), F.col("status"),
        F.lit('", "n_orders": '),
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("string"),
        F.lit("}"))
    return joined.select(
        "session_id", "doc_id", "two_step", "fmt", "parser_kind",
        "tool_name", "arg_key", "arg_val", "status", "bad_args", "fail",
        "groups", "current_state",
        obs_knowledge.alias("obs_knowledge"),
        obs_structured.alias("obs_structured"),
    )


def run_react_traces(sessions: DataFrame) -> DataFrame:
    """Execute the real agent kernel per session inside a narrow
    ``mapInPandas`` — parse (batch or chunk-fed streaming parser), filter
    tools by group/state, dispatch, capture observations and errors — and
    emit two trace rows per session (the action iteration and the final
    answer). No shuffle: the seam is O(rows) over the already-joined
    session frame."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        all_tools = scripted_tools()
        cols = ["session_id", "step", "question", "thought", "action",
                "args_json", "observation", "tool_error", "kind",
                "tool_candidates"]
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                cs = row["current_state"]
                tools = filter_tools_by_group_and_state(
                    all_tools,
                    requested_groups=list(row["groups"]),
                    current_state=cs if isinstance(cs, str) else None,
                )
                # Streaming sessions feed the whole response as one chunk:
                # the state machine (fence strip, delimiter routing, brace
                # counting) is fully exercised, while the reference's
                # chunk-boundary whitespace warts (streaming_parser.py:177
                # strips emitted-piece edges) stay deterministic for the
                # oracle; the split-boundary behavior itself is
                # pytest-covered (test_agent).
                manager = AgentManager(
                    tools,
                    ScriptedResponder(row),
                    use_streaming_parser=(row["parser_kind"] == "stream"),
                    stream_chunk_size=1_000_000,
                )
                history, final = run_agent(manager, question=row["arg_val"],
                                           context=row)
                candidates = ",".join(tools.keys())
                for step, act in enumerate(history, start=1):
                    out.append({
                        "session_id": row["session_id"], "step": step,
                        "question": row["arg_val"],
                        "thought": act.thought, "action": act.name,
                        "args_json": json.dumps(act.arguments),
                        "observation": act.observation,
                        "tool_error": act.tool_error, "kind": "action",
                        "tool_candidates": candidates,
                    })
                out.append({
                    "session_id": row["session_id"],
                    "step": len(history) + 1,
                    "question": row["arg_val"],
                    "thought": final.thought, "action": "",
                    "args_json": "", "observation": final.final,
                    "tool_error": None, "kind": "final",
                    "tool_candidates": candidates,
                })
            yield pd.DataFrame(out, columns=cols)

    return sessions.mapInPandas(gen, schema=_TRACE_SCHEMA)


def react_tool_trace(docs: DataFrame, orders: DataFrame) -> DataFrame:
    """End-to-end scripted ReAct trace over the documents/orders tables:
    session derivation + batched tool joins (Catalyst) feeding the
    parse→filter→dispatch→observe kernel (seam)."""
    return run_react_traces(react_trace_sessions(docs, orders))


# ---------------------------------------------------------------------------
# Agent provenance triples (trustgraph-base/trustgraph/provenance/agent.py)
# ---------------------------------------------------------------------------

from .constants import (  # noqa: E402  (section-local import)
    PROV_ENTITY,
    PROV_STARTED_AT_TIME,
    PROV_WAS_DERIVED_FROM,
    RDF_LABEL as RDFS_LABEL_URI,
    RDF_TYPE as RDF_TYPE_URI,
)

_TGNS = "https://trustgraph.ai/ns/"

TG_QUERY = _TGNS + "query"
TG_QUESTION = _TGNS + "Question"
TG_AGENT_QUESTION = _TGNS + "AgentQuestion"
TG_ANALYSIS = _TGNS + "Analysis"
TG_TOOL_USE = _TGNS + "ToolUse"
TG_CONCLUSION = _TGNS + "Conclusion"
TG_ANSWER = _TGNS + "Answer"
TG_REFLECTION = _TGNS + "Reflection"
TG_THOUGHT_TYPE = _TGNS + "Thought"
TG_OBSERVATION_TYPE = _TGNS + "Observation"
TG_ERROR_TYPE = _TGNS + "Error"
TG_THOUGHT = _TGNS + "thought"
TG_ACTION = _TGNS + "action"
TG_ARGUMENTS = _TGNS + "arguments"
TG_TOOL_CANDIDATE = _TGNS + "toolCandidate"
TG_TOOL_ERROR = _TGNS + "toolError"
TG_STEP_NUMBER = _TGNS + "stepNumber"
TG_TERMINATION_REASON = _TGNS + "terminationReason"


def agent_prov_triples(trace: DataFrame, timestamp: str) -> DataFrame:
    """PROV-O provenance triples for agent sessions, derived from a ReAct
    trace frame as pure column expressions (no UDF) — the Spark twin of
    the reference's per-event emitters (provenance/agent.py:66-107
    agent_session_triples, :146-239 agent_iteration_triples with the
    thought sub-entity, :241-296 agent_observation_triples incl. the
    tg:Error mixin on tool failures, :298-355 agent_final_triples with
    termination reason). ``timestamp`` is caller-provided event time (the
    reference defaults to now(), which a deterministic data plane cannot).

    Lineage parity: iteration 1 derives from the question; iteration N>1
    derives from observation N-1 (react/service.py:535-545); the
    conclusion derives from the last iteration and carries
    'final-answer'. Per trace row the triple set is built as an inline
    array + one explode — narrow, codegen-friendly, no shuffle."""
    sid = F.col("session_id")
    step = F.col("step")
    s_uri = sid
    i_uri = F.concat(sid, F.lit("/i"), step.cast("string"))
    t_uri = F.concat(i_uri, F.lit("/thought"))
    o_uri = F.concat(i_uri, F.lit("/observation"))
    prev_o = F.concat(sid, F.lit("/i"), (step - 1).cast("string"),
                      F.lit("/observation"))
    prev_i = F.concat(sid, F.lit("/i"), (step - 1).cast("string"))

    def t(s, p, o, otype="u"):
        return F.struct(
            s.alias("s") if not isinstance(s, str) else F.lit(s).alias("s"),
            F.lit(p).alias("p"),
            o.alias("o") if not isinstance(o, str) else F.lit(o).alias("o"),
            F.lit(otype).alias("otype"),
        )

    session_rows = (
        trace.where(F.col("kind") == "final")
        .select(F.explode(F.array(
            t(s_uri, RDF_TYPE_URI, PROV_ENTITY),
            t(s_uri, RDF_TYPE_URI, TG_QUESTION),
            t(s_uri, RDF_TYPE_URI, TG_AGENT_QUESTION),
            t(s_uri, RDFS_LABEL_URI, "Agent Question", "l"),
            t(s_uri, PROV_STARTED_AT_TIME, F.lit(timestamp), "l"),
            t(s_uri, TG_QUERY, F.col("question"), "l"),
        )).alias("tr"))
    )

    act = trace.where(F.col("kind") == "action")
    base_iter = F.array(
        t(i_uri, RDF_TYPE_URI, PROV_ENTITY),
        t(i_uri, RDF_TYPE_URI, TG_ANALYSIS),
        t(i_uri, RDF_TYPE_URI, TG_TOOL_USE),
        t(i_uri, RDFS_LABEL_URI,
          F.concat(F.lit("Analysis: "), F.col("action")), "l"),
        t(i_uri, TG_ACTION, F.col("action"), "l"),
        t(i_uri, TG_ARGUMENTS, F.col("args_json"), "l"),
        t(i_uri, TG_STEP_NUMBER, step.cast("string"), "l"),
        t(i_uri, PROV_WAS_DERIVED_FROM,
          F.when(step == 1, s_uri).otherwise(prev_o)),
        t(i_uri, TG_THOUGHT, t_uri),
        t(t_uri, RDF_TYPE_URI, TG_REFLECTION),
        t(t_uri, RDF_TYPE_URI, TG_THOUGHT_TYPE),
        t(t_uri, RDFS_LABEL_URI, "Thought", "l"),
        t(t_uri, PROV_WAS_DERIVED_FROM, i_uri),
        t(o_uri, RDF_TYPE_URI, PROV_ENTITY),
        t(o_uri, RDF_TYPE_URI, TG_OBSERVATION_TYPE),
        t(o_uri, RDFS_LABEL_URI, "Observation", "l"),
        t(o_uri, PROV_WAS_DERIVED_FROM, i_uri),
    )
    candidates = F.transform(
        F.split(F.col("tool_candidates"), ","),
        lambda c: t(i_uri, TG_TOOL_CANDIDATE, c, "l"),
    )
    err = F.when(
        F.col("tool_error").isNotNull(),
        F.array(
            t(o_uri, TG_TOOL_ERROR, F.col("tool_error"), "l"),
            t(o_uri, RDF_TYPE_URI, TG_ERROR_TYPE),
        ),
    ).otherwise(F.array().cast(
        "array<struct<s:string,p:string,o:string,otype:string>>"))
    iter_rows = act.select(
        F.explode(F.concat(base_iter, candidates, err)).alias("tr")
    )

    f_uri = F.concat(sid, F.lit("/final"))
    final_rows = (
        trace.where(F.col("kind") == "final")
        .select(F.explode(F.array(
            t(f_uri, RDF_TYPE_URI, PROV_ENTITY),
            t(f_uri, RDF_TYPE_URI, TG_CONCLUSION),
            t(f_uri, RDF_TYPE_URI, TG_ANSWER),
            t(f_uri, RDFS_LABEL_URI, "Conclusion", "l"),
            t(f_uri, PROV_WAS_DERIVED_FROM, prev_i),
            t(f_uri, TG_TERMINATION_REASON, "final-answer", "l"),
        )).alias("tr"))
    )

    return (
        session_rows.unionByName(iter_rows).unionByName(final_rows)
        .select("tr.s", "tr.p", "tr.o", "tr.otype")
    )
