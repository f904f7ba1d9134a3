"""ReAct agent kernel parity tests (reference: agent/react/agent_manager.py,
streaming_parser.py, tool_filter.py, react/service.py loop semantics)."""

import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.agent import (
    Action,
    AgentManager,
    Argument,
    BAD_ARGS_ERROR,
    Final,
    PARSE_ERROR_ACTION,
    ParserState,
    StreamingReActParser,
    Tool,
    agent_final_uri,
    agent_iteration_uri,
    agent_observation_uri,
    agent_session_uri,
    agent_thought_uri,
    filter_tools_by_group_and_state,
    get_next_state,
    parse_react_response,
    run_agent,
    validate_tool_config,
)


# ---------------------------------------------------------------------------
# parse_react_response (agent_manager.py:18-172)
# ---------------------------------------------------------------------------


class TestParseReactResponse:
    def test_basic_action(self):
        r = parse_react_response(
            'Thought: check balance\nAction: get_balance\nArgs: {"acct": "12345"}'
        )
        assert isinstance(r, Action)
        assert r.thought == "check balance"
        assert r.name == "get_balance"
        assert r.arguments == {"acct": "12345"}
        assert r.observation == ""

    @pytest.mark.parametrize(
        "raw,expected",
        [
            ("get_balance", "get_balance"),
            ('"get_balance"', "get_balance"),
            ('""get_balance""', "get_balance"),
            ('"""complex_tool"""', "complex_tool"),
            ('"search-kb"', "search-kb"),
            ('""', ""),
        ],
    )
    def test_action_quote_stripping(self, raw, expected):
        # reference fix: LLMs wrap action names in quotes (:110-115); an
        # all-quotes name strips to empty, which then fails the
        # action-present check and raises
        text = f"Thought: t\nAction: {raw}\nArgs: {{}}"
        if expected:
            assert parse_react_response(text).name == expected
        else:
            with pytest.raises(ValueError):
                parse_react_response(text)

    def test_markdown_fences_stripped(self):
        r = parse_react_response(
            '```json\nThought: t\nAction: tool\nArgs: {"a": 1}\n```'
        )
        assert r.name == "tool"
        assert r.arguments == {"a": 1}

    def test_multiline_thought_joined_with_spaces(self):
        r = parse_react_response(
            "Thought: first line\nsecond line\n  third\nAction: t\nArgs: {}"
        )
        assert r.thought == "first line second line third"

    def test_multiline_args(self):
        r = parse_react_response(
            'Thought: t\nAction: t\nArgs: {\n  "k": "v",\n  "n": 2\n}'
        )
        assert r.arguments == {"k": "v", "n": 2}

    def test_args_same_line(self):
        r = parse_react_response('Thought: t\nAction: t\nArgs: {"k": "v"}')
        assert r.arguments == {"k": "v"}

    def test_nested_args_brace_counting(self):
        r = parse_react_response(
            'Thought: t\nAction: t\nArgs: {"outer": {"inner": [1, 2]}, "x": "}"}'
        )
        assert r.arguments == {"outer": {"inner": [1, 2]}, "x": "}"}

    def test_missing_args_defaults_empty(self):
        r = parse_react_response("Thought: t\nAction: tool_name")
        assert r.name == "tool_name"
        assert r.arguments == {}

    def test_final_answer_text(self):
        r = parse_react_response("Thought: done\nFinal Answer: Paris.")
        assert isinstance(r, Final)
        assert r.thought == "done"
        assert r.final == "Paris."

    def test_final_answer_multiline_text_joined_with_spaces(self):
        r = parse_react_response(
            "Thought: done\nFinal Answer: line one\nline two"
        )
        assert r.final == "line one line two"

    def test_final_answer_json_kept_as_raw_text(self):
        # the reference deliberately does NOT json.loads the answer (:85-90)
        r = parse_react_response(
            'Thought: done\nFinal Answer: {\n  "answer": 4\n}'
        )
        assert r.final == '{\n"answer": 4\n}'

    def test_final_answer_json_same_line(self):
        r = parse_react_response('Thought: done\nFinal Answer: {"answer": 4}')
        assert r.final == '{"answer": 4}'

    def test_final_answer_returns_before_trailing_action(self):
        # Final Answer short-circuits: anything after is ignored (:100-104)
        r = parse_react_response(
            "Thought: d\nFinal Answer: yes\nThought: more\nAction: t"
        )
        assert isinstance(r, Final)
        assert r.final == "yes"

    def test_invalid_args_json_raises(self):
        with pytest.raises(ValueError, match="Invalid JSON in Args"):
            parse_react_response("Thought: t\nAction: t\nArgs: {not json}")

    def test_bad_args_error_literal_pinned(self):
        # the oracle embeds this exact message for the scripted '{not json}'
        try:
            parse_react_response("Thought: t\nAction: t\nArgs: {not json}")
        except ValueError as e:
            assert "Error: LLM parse error: " + str(e) == BAD_ARGS_ERROR

    def test_thought_only_raises(self):
        with pytest.raises(ValueError, match="no action or final answer"):
            parse_react_response("Thought: just thinking")

    def test_garbage_raises(self):
        with pytest.raises(ValueError, match="Could not parse"):
            parse_react_response("complete nonsense")

    def test_non_string_raises(self):
        with pytest.raises(ValueError, match="Expected string"):
            parse_react_response({"not": "text"})


# ---------------------------------------------------------------------------
# StreamingReActParser (streaming_parser.py:24-353)
# ---------------------------------------------------------------------------


def _stream(text, chunk_size, **kw):
    p = StreamingReActParser(**kw)
    for i in range(0, len(text), chunk_size):
        p.feed(text[i : i + chunk_size])
    p.finalize()
    return p


class TestStreamingParser:
    ACTION_TEXT = (
        'Thought: plan\nAction: knowledge_query\nArgs: {"entity": "e1"}'
    )
    FINAL_TEXT = "Thought: done\nFinal Answer: Paris."

    @pytest.mark.parametrize("cs", [1, 3, 7, 1000])
    def test_action_across_chunk_sizes(self, cs):
        # delimiters and JSON split at every boundary, incl. "Tho"+"ught:"
        # and '{"ent' + 'ity": ...' — the parser's core challenge
        r = _stream(self.ACTION_TEXT, cs).get_result()
        assert isinstance(r, Action)
        assert r.name == "knowledge_query"
        assert r.arguments == {"entity": "e1"}
        assert r.thought == "plan"

    @pytest.mark.parametrize("cs", [1, 3, 7, 1000])
    def test_final_across_chunk_sizes(self, cs):
        r = _stream(self.FINAL_TEXT, cs).get_result()
        assert isinstance(r, Final)
        assert r.final == "Paris."
        assert r.thought == "done"

    def test_completion_stops_consuming(self):
        p = _stream(self.ACTION_TEXT, 7)
        assert p.is_complete()
        p.feed("garbage after completion")
        assert p.get_result().name == "knowledge_query"

    def test_junk_before_thought_discarded(self):
        r = _stream(
            "some leading junk that is quite long\n" + self.FINAL_TEXT, 9
        ).get_result()
        assert isinstance(r, Final)
        assert r.final == "Paris."

    def test_fenced_single_feed(self):
        r = _stream(
            '```json\nThought: t\nAction: "q"\nArgs: {"a": 1}\n```', 1000
        ).get_result()
        assert r.name == "q"
        assert r.arguments == {"a": 1}

    def test_thought_chunks_emitted(self):
        chunks = []
        _stream(self.FINAL_TEXT, 5, on_thought_chunk=chunks.append)
        assert "".join(chunks).strip() == "done"

    def test_answer_chunks_emitted(self):
        chunks = []
        _stream(self.FINAL_TEXT, 5, on_answer_chunk=chunks.append)
        assert "".join(chunks).strip() == "Paris."

    def test_json_final_answer(self):
        r = _stream(
            'Thought: d\nFinal Answer: {"answer": 42}', 1000
        ).get_result()
        assert r.final == '{"answer": 42}'

    def test_chunk_boundary_thought_whitespace_wart(self):
        # Documented reference wart (streaming_parser.py:177/190): emitted
        # thought pieces are stripped at delimiter boundaries but raw at
        # tail-emissions, so some chunkings lose interior spacing vs the
        # batch parser. The driver-gated trace avoids it by single-feed;
        # here we pin that both parsers agree on the FIELDS that matter.
        text = "Thought: Need knowledge_query for entity 7.\nAction: t\nArgs: {}"
        batch = parse_react_response(text)
        for cs in (1, 7, 13):
            s = _stream(text, cs).get_result()
            assert s.name == batch.name and s.arguments == batch.arguments
            # thought content survives; only interior spacing may differ
            # (e.g. "knowledge_queryfor" at a tail-emission boundary)
            assert (s.thought.replace(" ", "")
                    == batch.thought.replace(" ", ""))

    def test_invalid_args_raises_during_feed(self):
        p = StreamingReActParser()
        with pytest.raises(ValueError, match="Invalid JSON in Args"):
            p.feed("Thought: t\nAction: t\nArgs: {not json}")
            p.finalize()

    def test_stream_ends_mid_args_raises(self):
        p = StreamingReActParser()
        p.feed('Thought: t\nAction: t\nArgs: {"unclosed": ')
        with pytest.raises(ValueError, match="incomplete parsing"):
            p.finalize()

    def test_stream_ends_empty_raises(self):
        p = StreamingReActParser()
        with pytest.raises(ValueError, match="no content"):
            p.finalize()

    def test_state_progression(self):
        p = StreamingReActParser()
        assert p.state == ParserState.INITIAL
        p.feed("Thought: thinking...")
        assert p.state == ParserState.THOUGHT
        p.feed("\nAction: tool\n")
        p.feed("Args: {}")
        assert p.state == ParserState.COMPLETE


# ---------------------------------------------------------------------------
# Tool filtering (tool_filter.py:14-165)
# ---------------------------------------------------------------------------


def _tool(name, config):
    return Tool(name=name, description=name, arguments=[],
                implementation=None, config=config)


class TestToolFilter:
    TOOLS = {
        "kb": _tool("kb", {"group": ["default"]}),
        "rows": _tool("rows", {"group": ["default", "data"]}),
        "audit": _tool("audit", {"group": ["audit"],
                                 "applicable-states": ["review"]}),
        "anything": _tool("anything", {}),
    }

    def test_defaults(self):
        # requested defaults to ["default"], state to "undefined";
        # unconfigured tools default to group ["default"] / states ["*"]
        out = filter_tools_by_group_and_state(self.TOOLS)
        assert sorted(out) == ["anything", "kb", "rows"]

    def test_group_intersection(self):
        out = filter_tools_by_group_and_state(self.TOOLS, ["data"])
        assert sorted(out) == ["rows"]

    def test_wildcard_group(self):
        out = filter_tools_by_group_and_state(self.TOOLS, ["*"], "review")
        assert sorted(out) == ["anything", "audit", "kb", "rows"]

    def test_state_gating(self):
        assert "audit" not in filter_tools_by_group_and_state(
            self.TOOLS, ["audit"], None)
        assert "audit" in filter_tools_by_group_and_state(
            self.TOOLS, ["audit"], "review")

    def test_empty_state_means_undefined(self):
        out = filter_tools_by_group_and_state(self.TOOLS, ["audit"], "")
        assert "audit" not in out

    def test_get_next_state(self):
        assert get_next_state(_tool("t", {"state": "review"}), "s0") == "review"
        assert get_next_state(_tool("t", {}), "s0") == "s0"
        assert get_next_state(_tool("t", None), "s0") == "s0"

    def test_validate_tool_config(self):
        validate_tool_config({"group": ["a"], "state": "s",
                              "applicable-states": ["x"]})
        with pytest.raises(ValueError, match="'group' field must be a list"):
            validate_tool_config({"group": "a"})
        with pytest.raises(ValueError, match="group names must be strings"):
            validate_tool_config({"group": [1]})
        with pytest.raises(ValueError, match="'state' field must be a string"):
            validate_tool_config({"state": ["s"]})
        with pytest.raises(ValueError, match="must be a list of strings"):
            validate_tool_config({"applicable-states": "x"})
        with pytest.raises(ValueError, match="state names must be strings"):
            validate_tool_config({"applicable-states": [1]})


# ---------------------------------------------------------------------------
# Agent loop (agent_manager.py:174-395, service.py:357-419)
# ---------------------------------------------------------------------------


class EchoImpl:
    def __init__(self, context):
        self.context = context

    def invoke(self, **kw):
        return f"echo:{json.dumps(kw, sort_keys=True)}"


class FailImpl:
    def __init__(self, context):
        self.context = context

    def invoke(self, **kw):
        raise RuntimeError("backend down")


def _registry():
    return {
        "echo": Tool("echo", "echo", [Argument("q", "string", "q")],
                     EchoImpl, {"group": ["default"]}),
        "boom": Tool("boom", "boom", [], FailImpl, {"group": ["default"]}),
    }


class TestAgentLoop:
    def test_two_step_session(self):
        script = [
            'Thought: ask\nAction: echo\nArgs: {"q": "hi"}',
            "Thought: got it\nFinal Answer: done",
        ]
        calls = []

        def responder(variables):
            calls.append(variables)
            return script[len(variables["history"])]

        history, final = run_agent(
            AgentManager(_registry(), responder), "the question")
        assert len(history) == 1
        assert history[0].name == "echo"
        assert history[0].observation == 'echo:{"q": "hi"}'
        assert final.final == "done"
        # the seam receives the reference's variables contract
        v = calls[0]
        assert v["question"] == "the question"
        assert v["tool_names"] == "echo,boom"
        assert v["tools"][0]["arguments"][0]["name"] == "q"
        # second call sees the first observation in history
        assert calls[1]["history"][0]["observation"] == 'echo:{"q": "hi"}'

    def test_tool_error_captured_as_observation(self):
        script = ["Thought: t\nAction: boom\nArgs: {}",
                  "Thought: t\nFinal Answer: gave up"]
        history, final = run_agent(
            AgentManager(_registry(), lambda v: script[len(v["history"])]),
            "q")
        assert history[0].observation == "Error: backend down"
        assert history[0].tool_error == "backend down"

    def test_unknown_tool_raises(self):
        mgr = AgentManager(_registry(), lambda v: "Thought: t\nAction: nope\nArgs: {}")
        with pytest.raises(RuntimeError, match="No action for nope!"):
            run_agent(mgr, "q")

    def test_parse_error_recovery(self):
        script = ["Thought: t\nAction: echo\nArgs: {bad",
                  "Thought: t\nFinal Answer: recovered"]
        history, final = run_agent(
            AgentManager(_registry(), lambda v: script[len(v["history"])]),
            "q")
        assert history[0].name == PARSE_ERROR_ACTION
        assert history[0].observation.startswith(
            "Error: LLM parse error: Invalid JSON in Args")
        assert final.final == "recovered"

    def test_streaming_parse_error_message(self):
        mgr = AgentManager(
            _registry(), lambda v: "Thought: t\nAction: echo\nArgs: {bad",
            use_streaming_parser=True)
        act = mgr.reason("q", [])
        assert act.name == PARSE_ERROR_ACTION
        assert act.tool_error == "LLM response could not be parsed (streaming)"

    def test_max_iterations_guard(self):
        mgr = AgentManager(
            _registry(), lambda v: 'Thought: loop\nAction: echo\nArgs: {}')
        with pytest.raises(RuntimeError, match="Too many agent iterations"):
            run_agent(mgr, "q", max_iterations=3)

    def test_streaming_manager_matches_batch(self):
        script = ['Thought: ask\nAction: echo\nArgs: {"q": "hi"}',
                  "Thought: got it\nFinal Answer: done"]
        resp = lambda v: script[len(v["history"])]
        hb, fb = run_agent(AgentManager(_registry(), resp), "q")
        hs, fs = run_agent(
            AgentManager(_registry(), resp, use_streaming_parser=True,
                         stream_chunk_size=5), "q")
        assert hb[0].name == hs[0].name
        assert hb[0].arguments == hs[0].arguments
        assert hb[0].observation == hs[0].observation
        assert fb.final == fs.final


# ---------------------------------------------------------------------------
# Agent provenance URI dialect (provenance/uris.py:167-236)
# ---------------------------------------------------------------------------


def test_agent_uris():
    assert agent_session_uri("abc") == "urn:trustgraph:agent:abc"
    assert agent_session_uri().startswith("urn:trustgraph:agent:")
    assert agent_iteration_uri("abc", 2) == "urn:trustgraph:agent:abc/i2"
    assert agent_thought_uri("abc", 2) == "urn:trustgraph:agent:abc/i2/thought"
    assert (agent_observation_uri("abc", 2)
            == "urn:trustgraph:agent:abc/i2/observation")
    assert agent_final_uri("abc") == "urn:trustgraph:agent:abc/final"


# ---------------------------------------------------------------------------
# Spark trace (batched tools + mapInPandas seam)
# ---------------------------------------------------------------------------


class TestReactTrace:
    @pytest.fixture(scope="class")
    def trace(self, spark):
        from trustgraph_spark.agent import react_tool_trace

        docs = spark.range(0, 200).select(
            F.col("id").alias("doc_id"),
            F.lit("x").alias("text"),
            F.lit("en").alias("lang"),
            F.lit("s").alias("source"),
            F.lit(10).alias("n_chars"),
        )
        orders = spark.createDataFrame(
            [(i, "F" if i % 2 == 0 else "O") for i in range(10)],
            "o_orderkey long, o_orderstatus string",
        )
        return react_tool_trace(docs, orders).toPandas()

    def test_rows_per_session(self, trace):
        # 20 sessions x 2 steps + 2 two-step sessions (d%10==1 -> docs
        # 13, 113) x 1 extra action row
        assert len(trace) == 42
        per = trace.groupby("session_id").size()
        two_step = {"urn:trustgraph:agent:s13", "urn:trustgraph:agent:s113"}
        assert set(per[per == 3].index) == two_step
        assert (per.drop(list(two_step)) == 2).all()

    def test_final_concludes_all_observations(self, trace):
        t = trace.sort_values("step").groupby("session_id")
        for sid, g in t:
            acts = g[g.kind == "action"]
            final = g[g.kind == "final"].iloc[0]
            expected = "Concluded: " + " | ".join(acts.observation)
            assert final.observation == expected
            assert final.step == len(acts) + 1

    def test_two_step_session_second_action(self, trace):
        g = trace[trace.session_id == "urn:trustgraph:agent:s13"]
        s2 = g[g.step == 2].iloc[0]
        assert s2.kind == "action"
        assert s2.action == "structured_query"
        assert json.loads(s2.args_json).keys() == {"status"}
        assert json.loads(s2.observation).keys() == {"status", "n_orders"}

    def test_error_paths_present(self, trace):
        step1 = trace[trace.step == 1]
        bad = step1[step1.action == "__parse_error__"]
        assert len(bad) == 2  # d % 10 == 7 -> doc_ids 73, 173
        assert set(bad.observation) == {BAD_ARGS_ERROR}
        failed = step1[step1.observation == "Error: backend unavailable"]
        assert len(failed) == 2  # d % 10 == 9 -> doc_ids 93, 193

    def test_tool_candidates_rotation(self, trace):
        with_audit = trace[trace.tool_candidates.str.contains("audit_log")]
        # d % 10 == 0 -> d in {0, 10} -> doc_ids 3, 103 within 0..199
        assert set(with_audit.session_id) == {
            "urn:trustgraph:agent:s3", "urn:trustgraph:agent:s103"}

    def test_structured_observation_shape(self, trace):
        step1 = trace[(trace.step == 1) & (trace.action == "structured_query")]
        assert len(step1) > 0
        for o in step1.observation:
            d = json.loads(o)
            assert set(d) == {"status", "n_orders"}


class TestAgentProvTriples:
    @pytest.fixture(scope="class")
    def prov(self, spark):
        from trustgraph_spark.agent import agent_prov_triples, react_tool_trace

        docs = spark.range(0, 100).select(
            F.col("id").alias("doc_id"), F.lit("x").alias("text"),
            F.lit("en").alias("lang"), F.lit("s").alias("source"),
            F.lit(10).alias("n_chars"),
        )
        orders = spark.createDataFrame(
            [(0, "F")], "o_orderkey long, o_orderstatus string")
        trace = react_tool_trace(docs, orders)
        return trace.toPandas(), agent_prov_triples(
            trace, timestamp="2026-01-01T00:00:00Z").toPandas()

    def test_trace_tool_error_column(self, prov):
        trace, _ = prov
        s1 = trace[trace.step == 1].set_index("session_id")
        # d%10==7 -> doc 73 parse error; d%10==9 -> doc 93 tool failure
        assert s1.loc["urn:trustgraph:agent:s73", "tool_error"].startswith(
            "LLM parse error")
        assert (s1.loc["urn:trustgraph:agent:s93", "tool_error"]
                == "backend unavailable")
        assert s1.loc["urn:trustgraph:agent:s3", "tool_error"] is None

    def test_session_question_and_lineage(self, prov):
        trace, tp = prov
        s = "urn:trustgraph:agent:s13"
        mine = tp[tp.s.str.startswith(s)]
        tg = "https://trustgraph.ai/ns/"
        prov_ns = "http://www.w3.org/ns/prov#"
        # question activity carries the query literal
        q = mine[(mine.s == s) & (mine.p == tg + "query")]
        assert list(q.o) == [trace[trace.session_id == s].question.iloc[0]]
        # s13 is a TWO-step session (d=1): iteration 1 derives from the
        # question, iteration 2 from iteration 1's OBSERVATION, the
        # conclusion from the LAST iteration (service.py:535-545)
        der = mine[mine.p == prov_ns + "wasDerivedFrom"].set_index("s")
        assert der.loc[f"{s}/i1", "o"] == s
        assert der.loc[f"{s}/i2", "o"] == f"{s}/i1/observation"
        assert der.loc[f"{s}/final", "o"] == f"{s}/i2"
        assert der.loc[f"{s}/i1/thought", "o"] == f"{s}/i1"
        assert der.loc[f"{s}/i1/observation", "o"] == f"{s}/i1"
        assert der.loc[f"{s}/i2/observation", "o"] == f"{s}/i2"
        # single-step session lineage: final from i1
        s0 = "urn:trustgraph:agent:s3"
        der0 = tp[(tp.p == prov_ns + "wasDerivedFrom")
                  & tp.s.str.startswith(s0)].set_index("s")
        assert der0.loc[f"{s0}/final", "o"] == f"{s0}/i1"

    def test_error_mixin_only_on_failures(self, prov):
        _, tp = prov
        tg = "https://trustgraph.ai/ns/"
        err_rows = tp[(tp.p == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type")
                      & (tp.o == tg + "Error")]
        # doc 73 (parse error) + doc 93 (tool failure) observations only
        assert set(err_rows.s) == {
            "urn:trustgraph:agent:s73/i1/observation",
            "urn:trustgraph:agent:s93/i1/observation",
        }
        tool_err = tp[tp.p == tg + "toolError"].set_index("s")
        assert (tool_err.loc["urn:trustgraph:agent:s93/i1/observation", "o"]
                == "backend unavailable")

    def test_termination_and_candidates(self, prov):
        _, tp = prov
        tg = "https://trustgraph.ai/ns/"
        term = tp[tp.p == tg + "terminationReason"]
        assert set(term.o) == {"final-answer"}
        assert len(term) == 10  # one per session
        cand = tp[tp.p == tg + "toolCandidate"]
        # doc 3 (d=0, review state) sees all three tools
        assert (cand[cand.s == "urn:trustgraph:agent:s3/i1"].o.tolist()
                == ["knowledge_query", "structured_query", "audit_log"])
