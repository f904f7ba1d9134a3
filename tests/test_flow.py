"""Flow service tests — mirror flow/service/flow.py semantics:
parameter resolution (defaults, required, controlled-by, forward
compat), start-flow interpolation + config fan-out, three-phase stop
with closure-based topic cleanup, delete retries, startup recovery,
dispatch errors; plus the corpus-scale native interpolation ops."""

import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.config import ConfigService
from trustgraph_spark.operators.flow import (
    FlowError, FlowService, is_flow_owned, repl_template,
    resolve_flow_topics, resolve_parameters, topic_refcounts,
)


class RecordingBackend:
    def __init__(self, fail_deletes=0):
        self.created, self.ensured, self.deleted = [], [], []
        self.fail_deletes = fail_deletes

    def create_topic(self, topic):
        self.created.append(topic)

    def ensure_topic(self, topic):
        self.ensured.append(topic)

    def delete_topic(self, topic):
        if self.fail_deletes > 0:
            self.fail_deletes -= 1
            raise RuntimeError("backend down")
        self.deleted.append(topic)


BLUEPRINT = {
    "parameters": {
        "model": {"type": "llm-model"},
        "rag-model": {"type": "llm-model", "controlled-by": "model"},
        "chunk-size": {"type": "chunk-size-t"},
    },
    "blueprint": {
        "embeddings:{blueprint}": {
            "topics": {"input": "persistent://tg/flow/emb-{blueprint}"},
        },
    },
    "flow": {
        "chunker:{id}": {
            "topics": {"input": "persistent://tg/flow/chunk-{id}",
                       "output": "persistent://tg/flow/chunked-{id}"},
            "parameters": {"model": "{model}"},
        },
        "rag:{workspace}-{id}": {
            "topics": {"request": "request:{workspace}:rag-{model}",
                       "librarian": "request:tg:librarian"},
        },
    },
    "interfaces": {
        "document-load": {"request": "persistent://tg/flow/chunk-{id}"},
    },
}


class TestResolveParameters:

    def test_no_parameters_section(self):
        assert resolve_parameters({}, None, {}) == {}
        assert resolve_parameters({}, {"x": 3}, {}) == {"x": "3"}

    def test_user_value_wins_and_stringifies(self):
        bp = {"parameters": {"model": {"type": "t"}}}
        out = resolve_parameters(bp, {"model": 42},
                                 {"t": {"default": "gpt"}})
        assert out == {"model": "42"}

    def test_type_default_and_bool_rendering(self):
        bp = {"parameters": {"a": {"type": "ta"}, "b": {"type": "tb"}}}
        out = resolve_parameters(bp, {}, {"ta": {"default": True},
                                          "tb": {"default": 7}})
        assert out == {"a": "true", "b": "7"}

    def test_required_without_default_raises(self):
        bp = {"parameters": {"a": {"type": "ta"}}}
        with pytest.raises(RuntimeError, match="Required parameter 'a'"):
            resolve_parameters(bp, {}, {"ta": {"required": True}})

    def test_controlled_by_inherits_controller(self):
        bp = {"parameters": {
            "model": {"type": "t"},
            "rag-model": {"type": "t", "controlled-by": "model"}}}
        out = resolve_parameters(bp, {"model": "m1"}, {"t": {}})
        assert out == {"model": "m1", "rag-model": "m1"}

    def test_controlled_by_falls_back_to_own_default(self):
        bp = {"parameters": {
            "rag-model": {"type": "t", "controlled-by": "model"}}}
        out = resolve_parameters(bp, {}, {"t": {"default": "d"}})
        assert out == {"rag-model": "d"}

    def test_forward_compat_extras(self):
        bp = {"parameters": {"a": {"type": "t"}}}
        out = resolve_parameters(bp, {"a": "1", "extra": 9}, {"t": {}})
        assert out == {"a": "1", "extra": "9"}


class TestTemplates:

    def test_repl_order_and_params(self):
        out = repl_template("{workspace}/{blueprint}/{id}/{model}",
                            "ws", "bp", "f1", {"model": "m"})
        assert out == "ws/bp/f1/m"

    def test_ownership(self):
        assert is_flow_owned("persistent://tg/flow/chunk-{id}")
        assert not is_flow_owned("request:tg:librarian")


@pytest.fixture
def svc(spark):
    config = ConfigService(spark)
    backend = RecordingBackend()
    fs = FlowService(config, backend)
    config.put("ws", "flow-blueprint", "bp", json.dumps(BLUEPRINT))
    config.put("ws", "parameter-type", "llm-model",
               json.dumps({"default": "gemma"}))
    config.put("ws", "parameter-type", "chunk-size-t",
               json.dumps({"default": 2000}))
    return fs, config, backend


class TestStartFlow:

    def test_validations(self, svc):
        fs, config, _ = svc
        with pytest.raises(FlowError, match="No blueprint name"):
            fs.start_flow("ws", "f1", None, "d")
        with pytest.raises(FlowError, match="No flow ID"):
            fs.start_flow("ws", None, "bp", "d")
        with pytest.raises(FlowError, match="No description"):
            fs.start_flow("ws", "f1", "bp", None)
        with pytest.raises(FlowError, match="Blueprint does not exist"):
            fs.start_flow("ws", "f1", "nope", "d")
        fs.start_flow("ws", "f1", "bp", "d")
        with pytest.raises(FlowError, match="Flow already exists"):
            fs.start_flow("ws", "f1", "bp", "d")

    def test_start_writes_processor_config_and_record(self, svc):
        fs, config, backend = svc
        fs.start_flow("ws", "f1", "bp", "my flow", {"model": "m1"})

        # topics created: flow-section topics, deduped, interpolated
        assert set(backend.created) == {
            "persistent://tg/flow/chunk-f1",
            "persistent://tg/flow/chunked-f1",
            "request:ws:rag-m1",
            "request:tg:librarian",
        }

        # processor config entries (blueprint + flow sections)
        entry = json.loads(config.get("ws", "processor:chunker", "f1"))
        assert entry["topics"] == {
            "input": "persistent://tg/flow/chunk-f1",
            "output": "persistent://tg/flow/chunked-f1"}
        assert entry["parameters"] == {"model": "m1"}
        emb = json.loads(config.get("ws", "processor:embeddings", "bp"))
        assert emb["topics"] == {"input": "persistent://tg/flow/emb-bp"}
        rag = json.loads(config.get("ws", "processor:rag", "ws-f1"))
        assert rag["topics"]["librarian"] == "request:tg:librarian"

        # flow record: description, blueprint, interfaces, parameters
        rec = json.loads(config.get("ws", "flow", "f1"))
        assert rec["description"] == "my flow"
        assert rec["blueprint-name"] == "bp"
        assert rec["interfaces"] == {
            "document-load": {"request": "persistent://tg/flow/chunk-f1"}}
        # controlled-by does NOT override a type default: the reference's
        # pass 2 (flow.py:93-111) only touches parameters still
        # unresolved after pass 1, and llm-model has default "gemma"
        assert rec["parameters"] == {"model": "m1", "rag-model": "gemma",
                                     "chunk-size": "2000"}

    def test_get_and_list_flow(self, svc):
        fs, _, _ = svc
        fs.start_flow("ws", "f1", "bp", "d")
        assert fs.list_flows("ws") == ["f1"]
        got = fs.get_flow("ws", "f1")
        assert got["description"] == "d"
        assert got["parameters"]["model"] == "gemma"


class TestStopFlow:

    def test_validations(self, svc):
        fs, _, _ = svc
        with pytest.raises(FlowError, match="No flow ID"):
            fs.stop_flow("ws", None)
        with pytest.raises(FlowError, match="Flow ID invalid"):
            fs.stop_flow("ws", "nope")

    def test_stop_deletes_owned_only_and_removes_config(self, svc):
        fs, config, backend = svc
        fs.start_flow("ws", "f1", "bp", "d")
        fs.stop_flow("ws", "f1")
        # literal librarian topic never deleted; owned ones are
        assert set(backend.deleted) == {
            "persistent://tg/flow/chunk-f1",
            "persistent://tg/flow/chunked-f1",
            "request:ws:rag-gemma",
        }
        assert config.get("ws", "flow", "f1") is None
        assert config.get("ws", "processor:chunker", "f1") is None
        assert config.get("ws", "processor:rag", "ws-f1") is None
        # blueprint-section processor config survives (only flow-section
        # entries are deleted, matching flow.py:648-657)
        assert config.get("ws", "processor:embeddings", "bp") is not None

    def test_closure_keeps_shared_topics(self, svc):
        fs, config, backend = svc
        fs.start_flow("ws", "f1", "bp", "d")          # model=gemma
        fs.start_flow("ws", "f2", "bp", "d")          # same model
        fs.stop_flow("ws", "f1")
        # {id}-scoped topics of f1 deleted; the shared rag-gemma
        # (param-scoped, still referenced by f2) survives
        assert set(backend.deleted) == {
            "persistent://tg/flow/chunk-f1",
            "persistent://tg/flow/chunked-f1",
        }
        fs.stop_flow("ws", "f2")
        assert "request:ws:rag-gemma" in backend.deleted

    def test_delete_retry_best_effort(self, svc):
        fs, config, _ = svc
        backend = RecordingBackend(fail_deletes=2)
        sleeps = []
        fs2 = FlowService(config, backend, sleep=sleeps.append)
        fs2.start_flow("ws", "f1", "bp", "d")
        fs2.stop_flow("ws", "f1")            # first 2 deletes fail, retried
        assert len(backend.deleted) == 3
        assert sleeps and all(s == 2 for s in sleeps)

    def test_delete_gives_up_after_retries(self, svc):
        fs, config, _ = svc
        backend = RecordingBackend(fail_deletes=10 ** 6)
        fs2 = FlowService(config, backend, sleep=lambda s: None)
        fs2.start_flow("ws", "f1", "bp", "d")
        fs2.stop_flow("ws", "f1")            # never raises
        assert config.get("ws", "flow", "f1") is None


class TestRecoveryAndDispatch:

    def test_ensure_existing_skips_stopping_and_missing_bp(self, svc):
        fs, config, backend = svc
        fs.start_flow("ws", "f1", "bp", "d")
        config.put("ws", "flow", "f2", json.dumps(
            {"blueprint-name": "bp", "status": "stopping",
             "parameters": {}}))
        config.put("ws", "flow", "f3", json.dumps(
            {"blueprint-name": "ghost", "parameters": {}}))
        backend.ensured.clear()
        fs.ensure_existing_flow_topics(["ws"])
        assert set(backend.ensured) == {
            "persistent://tg/flow/chunk-f1",
            "persistent://tg/flow/chunked-f1",
            "request:ws:rag-gemma",
            "request:tg:librarian",
        }

    def test_dispatch(self, svc):
        fs, _, _ = svc
        assert fs.handle({"operation": "list-blueprints"}, "ws") == \
            {"blueprint_names": ["bp"]}
        resp = fs.handle({"operation": "bogus"}, "ws")
        assert resp["error"]["type"] == "bad-operation"
        resp = fs.handle({"operation": "start-flow"}, "ws")
        assert resp["error"]["message"] == "No blueprint name"


class TestDataPlane:

    def test_resolve_flow_topics_matches_service(self, spark):
        flows = spark.createDataFrame(
            [("ws1", "f1", "bp", "running", {"model": "m1"}),
             ("ws1", "f2", "bp", "running", {"model": "m2"}),
             ("ws2", "f3", "bp", "stopping", {"model": "m1"})],
            "workspace string, flow_id string, blueprint_name string, "
            "status string, parameters map<string,string>")
        templates = spark.createDataFrame(
            [("bp", "persistent://tg/flow/chunk-{id}"),
             ("bp", "request:{workspace}:rag-{model}"),
             ("bp", "request:tg:librarian")],
            "blueprint_name string, template string")
        got = {(r.workspace, r.flow_id, r.topic)
               for r in resolve_flow_topics(flows, templates).collect()}
        assert got == {
            ("ws1", "f1", "persistent://tg/flow/chunk-f1"),
            ("ws1", "f1", "request:ws1:rag-m1"),
            ("ws1", "f2", "persistent://tg/flow/chunk-f2"),
            ("ws1", "f2", "request:ws1:rag-m2"),
        }
        refs = {r.topic: r.refs for r in topic_refcounts(
            resolve_flow_topics(flows, templates)).collect()}
        assert refs["persistent://tg/flow/chunk-f1"] == 1

    def test_null_parameters_map(self, spark):
        flows = spark.createDataFrame(
            [("ws", "f", "bp", "running", None)],
            "workspace string, flow_id string, blueprint_name string, "
            "status string, parameters map<string,string>")
        templates = spark.createDataFrame(
            [("bp", "t-{id}")], "blueprint_name string, template string")
        rows = resolve_flow_topics(flows, templates).collect()
        assert rows[0].topic == "t-f"

    def test_plan_native_and_broadcast(self, spark):
        flows = spark.createDataFrame(
            [("ws", "f", "bp", "running", {"m": "x"})],
            "workspace string, flow_id string, blueprint_name string, "
            "status string, parameters map<string,string>")
        templates = spark.createDataFrame(
            [("bp", "t-{id}-{m}")], "blueprint_name string, template string")
        df = resolve_flow_topics(flows, templates)
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "BroadcastHashJoin" in plan
