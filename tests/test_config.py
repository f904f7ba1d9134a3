"""Config service tests — mirrors config/service/config.py handler
semantics (LWW resolve, tombstones, version counter, template
provisioning, dispatch + error shaping, workspace push notifications)
over the append-log data plane."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.config import (
    CONFIG_LOG_SCHEMA, ConfigService, ConfigValue, config_resolve,
    config_version, provision_from_template,
)


def log_df(spark, rows):
    return spark.createDataFrame(rows, CONFIG_LOG_SCHEMA)


class TestResolve:

    def test_last_write_wins_and_tombstones(self, spark):
        log = log_df(spark, [
            ("ws", "prompt", "a", "v1", 1, False),
            ("ws", "prompt", "a", "v2", 2, False),
            ("ws", "prompt", "b", "v1", 1, False),
            ("ws", "prompt", "b", None, 3, True),
            ("ws", "flow", "a", "f1", 4, False),
        ])
        state = {(r.workspace, r.type, r.key): r.value
                 for r in config_resolve(log).collect()}
        assert state == {("ws", "prompt", "a"): "v2",
                         ("ws", "flow", "a"): "f1"}

    def test_reput_after_delete_revives(self, spark):
        log = log_df(spark, [
            ("ws", "t", "k", "v1", 1, False),
            ("ws", "t", "k", None, 2, True),
            ("ws", "t", "k", "v3", 3, False),
        ])
        rows = config_resolve(log).collect()
        assert len(rows) == 1 and rows[0].value == "v3"

    def test_version(self, spark):
        assert config_version(log_df(spark, [])) == 0
        assert config_version(log_df(spark, [("w", "t", "k", "v", 7, False)])) == 7


class TestService:

    @pytest.fixture
    def svc(self, spark):
        return ConfigService(spark)

    def test_put_get_roundtrip_and_missing_none(self, svc):
        svc.handle_put([ConfigValue("prompt", "system", '"S"')], "default")
        resp = svc.handle_get(
            [ConfigValue("prompt", "system"), ConfigValue("prompt", "nope")],
            "default")
        assert resp.version == 1
        assert resp.values[0].value == '"S"'
        assert resp.values[1].value is None

    def test_workspace_isolation(self, svc):
        svc.handle_put([ConfigValue("t", "k", "a")], "ws1")
        svc.handle_put([ConfigValue("t", "k", "b")], "ws2")
        assert svc.handle_get([ConfigValue("t", "k")], "ws1").values[0].value == "a"
        assert svc.handle_get([ConfigValue("t", "k")], "ws2").values[0].value == "b"

    def test_list_and_getvalues(self, svc):
        svc.handle_put([ConfigValue("t", "b", "2"),
                        ConfigValue("t", "a", "1"),
                        ConfigValue("other", "x", "9")], "ws")
        assert svc.handle_list("t", "ws").directory == ["a", "b"]
        vals = svc.handle_getvalues("t", "ws").values
        assert [(v.key, v.value) for v in vals] == [("a", "1"), ("b", "2")]

    def test_delete_bumps_version_and_removes(self, svc):
        svc.handle_put([ConfigValue("t", "k", "v")], "ws")
        svc.handle_delete([ConfigValue("t", "k")], "ws")
        resp = svc.handle_get([ConfigValue("t", "k")], "ws")
        assert resp.version == 2
        assert resp.values[0].value is None

    def test_all_ws_variants(self, svc):
        svc.handle_put([ConfigValue("t", "k1", "a")], "ws1")
        svc.handle_put([ConfigValue("t", "k2", "b")], "ws2")
        svc.handle_put([ConfigValue("u", "k3", "c")], "ws1")
        vals = svc.handle_getvalues_all_ws("t").values
        assert [(v.workspace, v.key, v.value) for v in vals] == \
            [("ws1", "k1", "a"), ("ws2", "k2", "b")]
        keys = svc.handle_getkeys_all_ws("t").values
        assert [(v.workspace, v.key, v.value) for v in keys] == \
            [("ws1", "k1", None), ("ws2", "k2", None)]

    def test_get_config_nested(self, svc):
        svc.handle_put([ConfigValue("prompt", "system", "s"),
                        ConfigValue("prompt", "template-index", "[]"),
                        ConfigValue("flow", "f1", "{}")], "ws")
        assert svc.get_config("ws") == {
            "prompt": {"system": "s", "template-index": "[]"},
            "flow": {"f1": "{}"},
        }
        assert svc.handle_config("ws").config["flow"] == {"f1": "{}"}

    def test_push_payload_shape(self, svc):
        svc.handle_put([ConfigValue("prompt", "a", "1"),
                        ConfigValue("flow", "b", "2")], "ws")
        (push,) = svc.pushes
        assert push["changes"] == {"prompt": ["ws"], "flow": ["ws"]}
        assert push["workspace_changes"] is None

    def test_workspace_lifecycle_notifications(self, svc):
        svc.handle_put([ConfigValue("workspace", "ws-new", "{}")],
                       "__workspaces__")
        assert svc.pushes[-1]["workspace_changes"].created == ["ws-new"]
        svc.handle_delete([ConfigValue("workspace", "ws-new")],
                          "__workspaces__")
        assert svc.pushes[-1]["workspace_changes"].deleted == ["ws-new"]

    def test_provision_from_template(self, svc):
        svc.handle_put([ConfigValue("prompt", "system", "T"),
                        ConfigValue("prompt", "extra", "E"),
                        ConfigValue("flow", "f", "F")], "__template__")
        svc.handle_put([ConfigValue("prompt", "system", "MINE")], "ws")
        v_before = svc.seq
        written = svc.provision_from_template("ws")
        assert written == 2            # system already exists -> skipped
        assert svc.seq == v_before + 1
        cfg = svc.get_config("ws")
        assert cfg["prompt"]["system"] == "MINE"   # customisation survives
        assert cfg["prompt"]["extra"] == "E"
        assert cfg["flow"]["f"] == "F"
        # idempotent: nothing left to write, version unchanged
        assert svc.provision_from_template("ws") == 0
        assert svc.seq == v_before + 1

    def test_provision_empty_template(self, svc):
        assert svc.provision_from_template("ws") == 0
        assert svc.seq == 0

    def test_dispatch_and_errors(self, svc):
        resp = svc.handle_workspace({"operation": "bogus"}, "ws")
        assert resp.error["type"] == "bad-operation"
        resp = svc.handle_system({"operation": "put", "values": []})
        assert resp.error["type"] == "bad-request"
        assert "Workspace is required" in resp.error["message"]
        svc.handle_system({"operation": "put", "workspace": "ws",
                           "values": [ConfigValue("t", "k", "v")]})
        resp = svc.handle_system({"operation": "getvalues-all-ws",
                                  "type": "t"})
        assert resp.values[0].value == "v"


class TestDataPlane:

    def test_resolve_plan_prunes_partitions(self, spark, tmp_path):
        log = log_df(spark, [
            ("ws1", "t", "k", "v", 1, False),
            ("ws2", "t", "k", "v", 1, False),
        ])
        path = str(tmp_path / "conf")
        log.write.partitionBy("workspace", "type").parquet(path)
        back = spark.read.parquet(path)
        df = config_resolve(back).where(F.col("workspace") == "ws1")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters: [" in plan
        assert "ws1" in plan          # pruned at the scan, not post-filtered
        assert "BatchEvalPython" not in plan

    def test_provision_is_anti_join(self, spark):
        log = log_df(spark, [
            ("__template__", "t", "a", "1", 1, False),
            ("ws", "t", "a", "mine", 2, False),
        ])
        batch = provision_from_template(log, "ws", 3)
        assert batch.collect() == []
        plan = batch._jdf.queryExecution().executedPlan().toString()
        assert "LeftAnti" in plan
