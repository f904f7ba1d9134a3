"""Agent orchestrator kernel parity tests (reference:
agent/orchestrator/meta_router.py, aggregator.py, plan_pattern.py,
supervisor_pattern.py, pattern_base.py; matrices mirror
tests/unit/test_agent/test_meta_router.py and test_aggregator.py)."""

import json

import pytest

from trustgraph_spark.orchestrator import (
    MAX_SUBAGENTS,
    AgentRequest,
    AgentStep,
    Aggregator,
    MetaRouter,
    PlanStep,
    UsageTracker,
    build_fanout_requests,
    build_history,
    build_plan_steps,
    collect_subagent_results,
    complete_plan_step,
    extract_plan,
    find_next_pending_step,
    gather_dependency_results,
    has_synthesis_results,
    validate_plan_steps,
    validate_subagent_goals,
)


# ---------------------------------------------------------------------------
# MetaRouter (test_meta_router.py mirror)
# ---------------------------------------------------------------------------


def _router_config():
    return {
        "agent-pattern": {
            "react": json.dumps({"name": "react", "description": "ReAct"}),
            "plan": json.dumps({"name": "plan", "description": "Plan"}),
            "supervisor": json.dumps({"name": "supervisor",
                                      "description": "Fan-out"}),
        },
        "agent-task-type": {
            "general": json.dumps({"name": "general",
                                   "valid_patterns": ["react"],
                                   "framing": ""}),
            "research": json.dumps({"name": "research",
                                    "valid_patterns": ["plan", "supervisor"],
                                    "framing": "Be thorough"}),
        },
    }


class TestMetaRouter:
    def test_defaults_when_no_config(self):
        r = MetaRouter()
        assert "react" in r.patterns
        assert "general" in r.task_types
        assert r.route("anything") == ("react", "general", "")

    def test_loads_patterns_and_task_types_from_config(self):
        r = MetaRouter(_router_config())
        assert set(r.patterns) == {"react", "plan", "supervisor"}
        assert set(r.task_types) == {"general", "research"}

    def test_handles_invalid_json_in_config(self):
        r = MetaRouter({"agent-pattern": {"broken": "{not json"},
                        "agent-task-type": {"weird": "also not"}})
        assert r.patterns["broken"] == {"name": "broken"}
        assert r.task_types["weird"] == {"name": "weird"}

    def test_skips_classifier_when_single_task_type(self):
        called = []
        r = MetaRouter(classifier=lambda q, t: called.append(q) or "x")
        tid, framing = r.identify_task_type("q")
        assert tid == "general" and called == []

    def test_uses_classifier_when_multiple_task_types(self):
        r = MetaRouter(_router_config(),
                       classifier=lambda q, t: "research")
        tid, framing = r.identify_task_type("deep dive please")
        assert (tid, framing) == ("research", "Be thorough")

    def test_normalizes_quoted_classifier_answer(self):
        r = MetaRouter(_router_config(),
                       classifier=lambda q, t: ' "Research" ')
        assert r.identify_task_type("q")[0] == "research"

    def test_falls_back_on_unknown_task_type(self):
        r = MetaRouter(_router_config(), classifier=lambda q, t: "bogus")
        assert r.identify_task_type("q")[0] == "general"

    def test_falls_back_on_classifier_error(self):
        def boom(q, t):
            raise RuntimeError("llm down")

        r = MetaRouter(_router_config(), classifier=boom)
        assert r.identify_task_type("q")[0] == "general"

    def test_skips_selector_when_single_valid_pattern(self):
        called = []
        r = MetaRouter(_router_config(),
                       selector=lambda *a: called.append(a) or "x")
        assert r.select_pattern("q", "general") == "react"
        assert called == []

    def test_uses_selector_when_multiple_valid_patterns(self):
        r = MetaRouter(_router_config(),
                       selector=lambda q, tt, tc, pats: "supervisor")
        assert r.select_pattern("q", "research") == "supervisor"

    def test_respects_valid_patterns_constraint(self):
        # selector answers a pattern OUTSIDE valid_patterns -> first valid
        r = MetaRouter(_router_config(),
                       selector=lambda q, tt, tc, pats: "react")
        assert r.select_pattern("q", "research") == "plan"

    def test_falls_back_on_selector_error(self):
        def boom(*a):
            raise RuntimeError("llm down")

        r = MetaRouter(_router_config(), selector=boom)
        assert r.select_pattern("q", "research") == "plan"

    def test_unknown_task_type_uses_all_patterns(self):
        r = MetaRouter(_router_config(),
                       selector=lambda q, tt, tc, pats: "plan")
        assert r.select_pattern("q", "nope") == "plan"

    def test_full_routing_pipeline(self):
        r = MetaRouter(
            _router_config(),
            classifier=lambda q, t: "research",
            selector=lambda q, tt, tc, pats: "plan",
        )
        assert r.route("analyze the system") == (
            "plan", "research", "Be thorough")


# ---------------------------------------------------------------------------
# Aggregator (test_aggregator.py mirror, deterministic clock)
# ---------------------------------------------------------------------------


class FakeClock:
    def __init__(self, t=1000.0):
        self.t = t

    def __call__(self):
        return self.t


class TestAggregator:
    def test_stores_correlation_entry(self):
        agg = Aggregator(clock=FakeClock(5.0))
        agg.register_fanout("corr-1", "parent-1", 3)
        entry = agg.correlations["corr-1"]
        assert entry["parent_session_id"] == "parent-1"
        assert entry["expected"] == 3
        assert entry["results"] == {}
        assert entry["created_at"] == 5.0

    def test_returns_false_until_all_done(self):
        agg = Aggregator()
        agg.register_fanout("corr-1", "p", 3)
        assert agg.record_completion("corr-1", "goal-a", "a") is False
        assert agg.record_completion("corr-1", "goal-b", "b") is False
        assert agg.record_completion("corr-1", "goal-c", "c") is True

    def test_returns_none_for_unknown_correlation(self):
        assert Aggregator().record_completion("unknown", "g", "a") is None

    def test_single_subagent(self):
        agg = Aggregator()
        agg.register_fanout("corr-1", "p", 1)
        assert agg.record_completion("corr-1", "goal-a", "answer") is True

    def test_peek_does_not_consume(self):
        agg = Aggregator()
        template = AgentRequest(question="q")
        agg.register_fanout("corr-1", "p", 2, request_template=template)
        assert agg.get_original_request("corr-1") is template
        assert "corr-1" in agg.correlations
        assert agg.get_original_request("unknown") is None

    def test_builds_correct_synthesis_request(self):
        agg = Aggregator()
        template = AgentRequest(question="Original question", streaming=True,
                                task_type="risk-assessment",
                                framing="Assess risks")
        agg.register_fanout("corr-1", "parent-1", 2,
                            request_template=template)
        agg.record_completion("corr-1", "goal-a", "answer-a")
        agg.record_completion("corr-1", "goal-b", "answer-b")

        req = agg.build_synthesis_request("corr-1", "Original question",
                                          "default")
        assert req.question == "Original question"
        assert req.pattern == "supervisor"
        assert req.session_id == "parent-1"
        assert req.correlation_id == ""
        assert req.streaming is True
        assert req.task_type == "risk-assessment"
        assert req.framing == "Assess risks"
        synth = req.history[-1]
        assert synth.step_type == "synthesise"
        assert synth.subagent_results == {"goal-a": "answer-a",
                                          "goal-b": "answer-b"}
        assert json.loads(synth.observation) == synth.subagent_results
        # consumed
        assert "corr-1" not in agg.correlations

    def test_raises_for_unknown_correlation(self):
        with pytest.raises(RuntimeError, match="No results"):
            Aggregator().build_synthesis_request("unknown", "q", "default")

    def test_cleanup_stale_mixed(self):
        clock = FakeClock(100.0)
        agg = Aggregator(timeout=10, clock=clock)
        agg.register_fanout("stale", "p1", 2)
        clock.t = 105.0
        agg.register_fanout("fresh", "p2", 2)
        clock.t = 112.0  # stale is 12s old, fresh 7s
        assert agg.cleanup_stale() == ["stale"]
        assert "stale" not in agg.correlations
        assert "fresh" in agg.correlations


# ---------------------------------------------------------------------------
# Plan-then-execute kernels
# ---------------------------------------------------------------------------


class TestPlanKernels:
    def test_extract_plan_latest_wins(self):
        p1 = [PlanStep(goal="a")]
        p2 = [PlanStep(goal="a", status="completed", result="r"),
              PlanStep(goal="b")]
        history = [
            AgentStep("t", "plan", {}, "", step_type="plan", plan=p1),
            AgentStep("t", "tool", {}, "obs", step_type="execute", plan=p2),
        ]
        assert extract_plan(history) == p2
        assert extract_plan([]) is None
        assert extract_plan(
            [AgentStep("t", "a", {}, "o")]) is None

    def test_find_next_pending(self):
        plan = [PlanStep(goal="a", status="completed"),
                PlanStep(goal="b"),
                PlanStep(goal="c")]
        assert find_next_pending_step(plan) == 1
        assert find_next_pending_step(
            [PlanStep(goal="a", status="completed")]) is None

    def test_validate_plan_fallback(self):
        fallback = validate_plan_steps("not a list")
        assert fallback == [{"goal": "Answer the question directly",
                             "tool_hint": "", "depends_on": []}]
        assert validate_plan_steps([]) == fallback
        good = [{"goal": "g", "tool_hint": "kb", "depends_on": [0]}]
        assert validate_plan_steps(good) == good

    def test_build_plan_steps(self):
        steps = build_plan_steps([{"goal": "g1"},
                                  {"goal": "g2", "depends_on": [0]}])
        assert [s.goal for s in steps] == ["g1", "g2"]
        assert all(s.status == "pending" for s in steps)
        assert steps[1].depends_on == [0]

    def test_gather_dependency_results(self):
        plan = [PlanStep(goal="a", status="completed", result="ra"),
                PlanStep(goal="b", status="completed", result=""),
                PlanStep(goal="c", depends_on=[0, 1, 99])]
        # empty results and out-of-range indices skipped
        assert gather_dependency_results(plan, plan[2]) == [
            {"index": 0, "result": "ra"}]

    def test_complete_plan_step_is_nonmutating(self):
        plan = [PlanStep(goal="a"), PlanStep(goal="b")]
        done = complete_plan_step(plan, 0, "result-a")
        assert done[0].status == "completed" and done[0].result == "result-a"
        assert plan[0].status == "pending"  # original untouched

    def test_plan_execution_walkthrough(self):
        # plan -> execute step 0 -> execute step 1 -> done
        plan = build_plan_steps([{"goal": "find"},
                                 {"goal": "summarize", "depends_on": [0]}])
        history = [AgentStep("t", "plan", {}, "", step_type="plan",
                             plan=plan)]
        p = extract_plan(history)
        idx = find_next_pending_step(p)
        assert idx == 0 and gather_dependency_results(p, p[idx]) == []
        p = complete_plan_step(p, 0, "found it")
        history.append(AgentStep("t", "kb", {}, "found it",
                                 step_type="execute", plan=p))
        p = extract_plan(history)
        idx = find_next_pending_step(p)
        assert idx == 1
        assert gather_dependency_results(p, p[idx]) == [
            {"index": 0, "result": "found it"}]
        p = complete_plan_step(p, 1, "summary")
        assert find_next_pending_step(p) is None


# ---------------------------------------------------------------------------
# Supervisor kernels
# ---------------------------------------------------------------------------


class TestSupervisorKernels:
    def test_goal_validation_caps_and_filters(self):
        goals = validate_subagent_goals(
            ["a", 2, "b", None, "c", "d", "e", "f", "g"], "q")
        assert goals == ["a", "b", "c", "d", "e"]
        assert len(goals) == MAX_SUBAGENTS

    def test_goal_validation_fallback_to_question(self):
        assert validate_subagent_goals("not a list", "the q") == ["the q"]
        assert validate_subagent_goals([1, 2], "the q") == ["the q"]

    def test_synthesis_detection(self):
        req = AgentRequest(question="q")
        assert has_synthesis_results(req) is False
        req.history = [AgentStep("t", "a", {}, "o", step_type="synthesise",
                                 subagent_results={"g": "r"})]
        assert has_synthesis_results(req) is True
        req.history = [AgentStep("t", "a", {}, "o", step_type="synthesise")]
        assert has_synthesis_results(req) is False

    def test_collect_results_merges_and_placeholders(self):
        req = AgentRequest(question="q", history=[
            AgentStep("t", "a", {}, "o", step_type="synthesise",
                      subagent_results={"g1": "r1"}),
            AgentStep("t", "a", {}, "o", step_type="synthesise",
                      subagent_results={"g2": "r2"}),
        ])
        assert collect_subagent_results(req) == {"g1": "r1", "g2": "r2"}
        assert collect_subagent_results(AgentRequest(question="q")) == {
            "(no results)": "No subagent results available"}

    def test_build_fanout_requests(self):
        parent = AgentRequest(question="big q", session_id="parent-s",
                              group=["default"], collection="c1",
                              task_type="research", framing="F",
                              conversation_id="conv-1", streaming=True)
        subs = build_fanout_requests(
            parent, ["g1", "g2"], correlation_id="corr-X",
            session_factory=lambda i: f"sub-{i}")
        assert [s.question for s in subs] == ["g1", "g2"]
        for i, s in enumerate(subs):
            assert s.session_id == f"sub-{i}"
            assert s.pattern == "react"
            assert s.streaming is False  # subagents never stream
            assert s.history == []
            assert s.correlation_id == "corr-X"
            assert s.parent_session_id == "parent-s"
            assert s.subagent_goal == s.question
            assert s.expected_siblings == 2
            assert s.collection == "c1"
            assert s.task_type == "research" and s.framing == "F"

    def test_fanout_roundtrip_through_aggregator(self):
        # decompose -> fan out -> completions -> synthesis request
        parent = AgentRequest(question="big q", session_id="parent-s",
                              task_type="research")
        goals = validate_subagent_goals(["g1", "g2", "g3"], "big q")
        subs = build_fanout_requests(parent, goals, correlation_id="c")
        agg = Aggregator()
        agg.register_fanout("c", parent.session_id, len(subs),
                            request_template=parent)
        assert agg.record_completion("c", "g1", "r1") is False
        assert agg.record_completion("c", "g2", "r2") is False
        assert agg.record_completion("c", "g3", "r3") is True
        req = agg.build_synthesis_request("c", parent.question, "default")
        assert has_synthesis_results(req) is True
        assert collect_subagent_results(req) == {
            "g1": "r1", "g2": "r2", "g3": "r3"}


# ---------------------------------------------------------------------------
# UsageTracker + history conversion (pattern_base.py)
# ---------------------------------------------------------------------------


class FakePromptResult:
    def __init__(self, in_token=None, out_token=None, model=None):
        self.in_token = in_token
        self.out_token = out_token
        self.model = model


def test_usage_tracker_accumulates():
    u = UsageTracker()
    assert u.in_token is None and u.out_token is None and u.model is None
    u.track(FakePromptResult(10, 5, "m1"))
    u.track(FakePromptResult(7, 3, "m2"))
    u.track(None)
    u.track(FakePromptResult())  # missing fields ignored
    assert u.in_token == 17 and u.out_token == 8 and u.model == "m2"


def test_build_history_converts_steps():
    req = AgentRequest(question="q", history=[
        AgentStep("think", "tool", {"k": "v"}, "obs"),
    ])
    acts = build_history(req)
    assert len(acts) == 1
    assert (acts[0].thought, acts[0].name, acts[0].arguments,
            acts[0].observation) == ("think", "tool", {"k": "v"}, "obs")
    assert build_history(AgentRequest(question="q")) == []


# ---------------------------------------------------------------------------
# MCP tool registry (agent/mcp_tool/service.py)
# ---------------------------------------------------------------------------


class FakeMcpResult:
    def __init__(self, structured=None, content=None):
        self.structuredContent = structured
        if content is not None:
            self.content = content


class FakePart:
    def __init__(self, text):
        self.text = text


class TestMcpToolRegistry:
    def _registry(self, transport=None):
        from trustgraph_spark.orchestrator import McpToolRegistry

        reg = McpToolRegistry(transport=transport)
        reg.update_config("ws1", {"mcp": {
            "weather": json.dumps({"url": "http://mcp.example/weather",
                                   "remote-name": "get_weather",
                                   "auth-token": "tok123"}),
            "nourl": json.dumps({"remote-name": "x"}),
            "plain": json.dumps({"url": "http://mcp.example/plain"}),
        }})
        return reg

    def test_resolve_with_remote_name_and_auth(self):
        url, remote, headers = self._registry().resolve("ws1", "weather")
        assert url == "http://mcp.example/weather"
        assert remote == "get_weather"
        assert headers == {"Authorization": "Bearer tok123"}

    def test_resolve_defaults(self):
        url, remote, headers = self._registry().resolve("ws1", "plain")
        assert remote == "plain" and headers == {}

    def test_unknown_service_and_missing_url(self):
        reg = self._registry()
        with pytest.raises(RuntimeError, match="not known in workspace"):
            reg.resolve("ws1", "nope")
        with pytest.raises(RuntimeError, match="URL not defined"):
            reg.resolve("ws1", "nourl")

    def test_config_clear_on_missing_mcp_section(self):
        reg = self._registry()
        reg.update_config("ws1", {})
        with pytest.raises(RuntimeError, match="not known"):
            reg.resolve("ws1", "weather")

    def test_result_shaping(self):
        from trustgraph_spark.orchestrator import McpToolRegistry

        shape = McpToolRegistry.shape_result
        assert shape(FakeMcpResult(structured={"a": 1})) == {"a": 1}
        assert shape(FakeMcpResult(content=[FakePart("he"),
                                            FakePart("llo")])) == "hello"
        assert shape(FakeMcpResult()) == "No content"

    def test_invoke_through_transport_seam(self):
        calls = []

        def transport(url, headers, remote_name, parameters):
            calls.append((url, headers, remote_name, parameters))
            return FakeMcpResult(content=[FakePart("ok")])

        reg = self._registry(transport)
        out = reg.invoke("ws1", "weather", {"city": "Oslo"})
        assert out == "ok"
        assert calls == [("http://mcp.example/weather",
                          {"Authorization": "Bearer tok123"},
                          "get_weather", {"city": "Oslo"})]


def test_duplicate_goals_deduped_so_aggregation_completes():
    # review fix: duplicate goal strings would deadlock the aggregator
    # (results keyed by goal, expected counts duplicates) — dedupe at
    # validation, deviating from the reference's flawed behavior
    goals = validate_subagent_goals(["a", "b", "a", "b", "c"], "q")
    assert goals == ["a", "b", "c"]
    parent = AgentRequest(question="q", session_id="p")
    subs = build_fanout_requests(parent, goals, correlation_id="c")
    agg = Aggregator()
    agg.register_fanout("c", "p", len(subs))
    assert agg.record_completion("c", "a", "ra") is False
    assert agg.record_completion("c", "b", "rb") is False
    assert agg.record_completion("c", "c", "rc") is True
