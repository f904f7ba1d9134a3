"""Bootstrapper tests — reference parity for the reconciliation state
machine (bootstrap/bootstrapper/service.py), the initialiser set
(template_seed / workspace_init / default_flow_start / pulsar_topology
plan), spec parsing arms, and a REAL first-boot convergence composing
the repo's ConfigService + IamService + FlowService kernels end-to-end
— the integration the reference only achieves across five processes
and a Pulsar bus."""

import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.bootstrap import (
    GATE_BACKOFF,
    INIT_RETRY,
    NAMESPACE_CONFIG,
    STEADY_INTERVAL,
    Bootstrapper,
    DefaultFlowStart,
    InitialiserSpec,
    PulsarTopology,
    TemplateSeed,
    WorkspaceInit,
    bootstrap_pending,
    load_initialisers_file,
    parse_initialiser_specs,
)
from trustgraph_spark.operators.config import ConfigService
from trustgraph_spark.operators.flow import FlowService
from trustgraph_spark.operators.iam import IamService

SEED = {
    "flow-blueprint": {
        "bp1": {
            "blueprint": {},
            "flow": {"chunker:{id}": {
                "topics": {"input": "persistent://tg/flow/chunk-{id}"}}},
            "interfaces": {},
        },
    },
    "prompt": {"system": "Be helpful.", "extract": "Extract things."},
}


def _stack(spark):
    """One in-process deployment: config + IAM (workspace registration
    wired through the config store, as the reference service does) +
    flow service."""
    config = ConfigService(spark)
    iam = IamService(
        "bootstrap",
        now_fn=lambda: 1_700_000_000,
        iterations=10,
        on_workspace_created=lambda ws: config.put(
            "__workspaces__", "workspace", ws, '{"enabled": true}'),
    )
    flow = FlowService(config)
    return config, iam, flow


def _specs(overwrite=False):
    return [
        InitialiserSpec("template-seed", "v1",
                        TemplateSeed(seed=SEED, overwrite=overwrite)),
        InitialiserSpec("workspace-init", "v1",
                        WorkspaceInit(workspace="default",
                                      overwrite=overwrite)),
        InitialiserSpec("default-flow", "v1",
                        DefaultFlowStart(blueprint="bp1")),
    ]


def _boot(spark, specs=None):
    config, iam, flow = _stack(spark)
    b = Bootstrapper(specs if specs is not None else _specs(), config,
                     make_iam_client=lambda: iam,
                     make_flow_client=lambda ws: flow)
    return b, config, iam, flow


# ---------------------------------------------------------------------------
# Spec parsing
# ---------------------------------------------------------------------------


def test_parse_specs_arms():
    with pytest.raises(RuntimeError, match="must be a mapping"):
        parse_initialiser_specs(["nope"])
    with pytest.raises(RuntimeError, match="missing required field"):
        parse_initialiser_specs([{"class": "TemplateSeed", "name": "x"}])
    with pytest.raises(RuntimeError, match="Duplicate initialiser name"):
        parse_initialiser_specs([
            {"class": "TemplateSeed", "name": "a", "flag": "v1",
             "params": {"seed": {}}},
            {"class": "TemplateSeed", "name": "a", "flag": "v1",
             "params": {"seed": {}}},
        ])
    with pytest.raises(RuntimeError, match="Unknown initialiser class"):
        parse_initialiser_specs([
            {"class": "no.such.Thing", "name": "a", "flag": "v1"}])
    with pytest.raises(RuntimeError, match="Failed to instantiate"):
        parse_initialiser_specs([
            {"class": "DefaultFlowStart", "name": "a", "flag": "v1"}])
    # the reference's dotted paths resolve to our twins
    specs = parse_initialiser_specs([
        {"class": ("trustgraph.bootstrap.initialisers."
                   "template_seed.TemplateSeed"),
         "name": "seed", "flag": "v2", "params": {"seed": SEED}},
    ])
    assert isinstance(specs[0].instance, TemplateSeed)
    assert specs[0].flag == "v2"


def test_load_initialisers_file(tmp_path):
    p = tmp_path / "inits.json"
    p.write_text(json.dumps({"initialisers": [
        {"class": "TemplateSeed", "name": "seed", "flag": "v1",
         "params": {"seed": {}}}]}))
    entries = load_initialisers_file(str(p))
    assert entries[0]["name"] == "seed"
    bad = tmp_path / "bad.json"
    bad.write_text("[]")
    with pytest.raises(RuntimeError, match="initialisers"):
        load_initialisers_file(str(bad))


# ---------------------------------------------------------------------------
# PulsarTopology plan (pre-gate transport seam)
# ---------------------------------------------------------------------------


def test_pulsar_topology_plan_and_seam():
    pt = PulsarTopology(admin_url="http://p:8080/", tenant="tg")
    assert not pt.wait_for_services
    ops = pt.plan(["standalone"])
    assert ops[0] == ("put-tenant", "/admin/v2/tenants/tg",
                      {"allowedClusters": ["standalone"]})
    assert [o[1] for o in ops[1:]] == [
        f"/admin/v2/namespaces/tg/{ns}" for ns in NAMESPACE_CONFIG]
    # response/notify carry the aggressive retention policies
    by_path = {o[1]: o[2] for o in ops[1:]}
    assert by_path["/admin/v2/namespaces/tg/response"][
        "retention_policies"]["retentionTimeInMinutes"] == 3
    assert by_path["/admin/v2/namespaces/tg/flow"] == {}
    with pytest.raises(NotImplementedError, match="transport seam"):
        pt.run(None, None, "v1")
    calls = []
    live = PulsarTopology(admin=lambda op, path, body:
                          calls.append((op, path)) or ["c1"])
    live.run(None, None, "v1")
    assert calls[0] == ("get-clusters", "/admin/v2/clusters")
    assert len(calls) == 1 + 1 + len(NAMESPACE_CONFIG)


# ---------------------------------------------------------------------------
# First-boot convergence (the real composed stack)
# ---------------------------------------------------------------------------


def test_first_boot_converges(spark):
    b, config, iam, flow = _boot(spark)
    history = b.converge()
    assert history[0] == ({"template-seed": "ran",
                           "workspace-init": "ran",
                           "default-flow": "ran"}, INIT_RETRY)
    assert history[1] == ({"template-seed": "skip",
                           "workspace-init": "skip",
                           "default-flow": "skip"}, STEADY_INTERVAL)
    assert len(history) == 2
    # the template workspace holds the seed, the workspace a copy
    assert config.get("__template__", "prompt", "system") == \
        json.dumps("Be helpful.")
    assert config.get("default", "prompt", "extract") == \
        json.dumps("Extract things.")
    # the workspace was registered via IAM -> config push
    assert "default" in config.keys("__workspaces__", "workspace")
    assert iam.store.workspaces["default"]["enabled"] is True
    # the flow is running
    assert flow.list_flows("default") == ["default"]
    # completion state lives where the reference puts it
    assert config.get("__system__", "init-state", "template-seed") == \
        '"v1"'


def test_prerequisite_ordering_retries(spark):
    # workspace-init BEFORE template-seed: first cycle fails on the
    # empty template, second converges — the reference's reconcile-
    # until-prerequisites-met mechanism.
    specs = [
        InitialiserSpec("workspace-init", "v1", WorkspaceInit()),
        InitialiserSpec("template-seed", "v1", TemplateSeed(seed=SEED)),
    ]
    b, config, _, _ = _boot(spark, specs)
    r1, s1 = b.run_cycle()
    assert r1 == {"workspace-init": "failed", "template-seed": "ran"}
    assert s1 == INIT_RETRY
    r2, s2 = b.run_cycle()
    assert r2 == {"workspace-init": "ran", "template-seed": "skip"}
    r3, s3 = b.run_cycle()
    assert set(r3.values()) == {"skip"} and s3 == STEADY_INTERVAL


def test_flag_bump_upserts_missing_preserving_customisation(spark):
    b, config, _, _ = _boot(spark, _specs()[:2])
    b.converge()
    # operator customises a workspace value, then the seed gains a key
    config.put("default", "prompt", "system", json.dumps("Customised."))
    SEED2 = {"prompt": dict(SEED["prompt"], extra="New.")}
    specs2 = [
        InitialiserSpec("template-seed", "v2", TemplateSeed(seed=SEED2)),
        InitialiserSpec("workspace-init", "v2", WorkspaceInit()),
    ]
    b2 = Bootstrapper(specs2, config,
                      make_iam_client=b._make_iam,
                      make_flow_client=b._make_flow)
    r, _ = b2.run_cycle()
    assert r == {"template-seed": "ran", "workspace-init": "ran"}
    # upsert-missing: the customisation survives, the new key lands
    assert config.get("default", "prompt", "system") == \
        json.dumps("Customised.")
    assert config.get("default", "prompt", "extra") == json.dumps("New.")


def test_flag_bump_overwrite_resets(spark):
    b, config, iam, flow = _boot(spark, [
        InitialiserSpec("template-seed", "v1",
                        TemplateSeed(seed=SEED, overwrite=True)),
        InitialiserSpec("workspace-init", "v1",
                        WorkspaceInit(overwrite=True)),
    ])
    b.converge()
    config.put("default", "prompt", "system", json.dumps("Customised."))
    for s in b.specs:
        s.flag = "v2"
    r, _ = b.run_cycle()
    assert set(r.values()) == {"ran"}
    assert config.get("default", "prompt", "system") == \
        json.dumps("Be helpful.")


def test_default_flow_start_is_idempotent_beyond_flag(spark):
    b, config, iam, flow = _boot(spark)
    b.converge()
    # flag bump: the flow is already running; the belt-and-braces list
    # check makes the re-run a clean no-op instead of a start error
    b.specs[2].flag = "v2"
    r, _ = b.run_cycle()
    assert r["default-flow"] == "ran"
    assert flow.list_flows("default") == ["default"]


def test_gate_failure_backs_off(spark):
    class DownConfig:
        def keys(self, *a):
            raise ConnectionError("config-svc not ready")

    b = Bootstrapper(_specs(), DownConfig())
    results, sleep_for = b.run_cycle()
    assert results == {} and sleep_for == GATE_BACKOFF


def test_failed_state_write_arm(spark):
    config, iam, flow = _stack(spark)

    class FlakyStateConfig:
        """Delegates everything; put to __system__ raises once."""
        def __init__(self, inner):
            self.inner = inner
            self.fail = True

        def __getattr__(self, name):
            return getattr(self.inner, name)

        def put(self, workspace, type_, key, value):
            if workspace == "__system__" and self.fail:
                self.fail = False
                raise ConnectionError("transient")
            return self.inner.put(workspace, type_, key, value)

    flaky = FlakyStateConfig(config)
    b = Bootstrapper([InitialiserSpec("template-seed", "v1",
                                      TemplateSeed(seed=SEED))], flaky,
                     make_iam_client=lambda: iam,
                     make_flow_client=lambda ws: flow)
    r1, s1 = b.run_cycle()
    assert r1 == {"template-seed": "failed-state-write"}
    assert s1 == INIT_RETRY
    # next cycle re-runs (idempotent) and records
    r2, _ = b.run_cycle()
    assert r2 == {"template-seed": "ran"}
    r3, s3 = b.run_cycle()
    assert r3 == {"template-seed": "skip"} and s3 == STEADY_INTERVAL


def test_pre_service_phase_runs_pre_gate_specs_only(spark):
    ran = []

    class Pre(PulsarTopology):
        def run(self, ctx, old_flag, new_flag):
            ran.append("pre")

    config, iam, flow = _stack(spark)
    b = Bootstrapper([
        InitialiserSpec("topology", "v1", Pre()),
        InitialiserSpec("template-seed", "v1", TemplateSeed(seed=SEED)),
    ], config, make_iam_client=lambda: iam,
        make_flow_client=lambda ws: flow)
    b.run_pre_service()
    assert ran == ["pre"]
    # the wake cycle skips pre-gate specs (no flag tracking for them)
    results, _ = b.run_cycle()
    assert results == {"template-seed": "ran"}
    assert b.stored_flag("topology") is None


def test_create_workspace_iam_error_raises(spark):
    config, iam, flow = _stack(spark)
    # '_'-reserved workspace id: IAM rejects with invalid-argument,
    # which is NOT the tolerated 'duplicate' arm -> the spec fails
    b = Bootstrapper([
        InitialiserSpec("template-seed", "v1", TemplateSeed(seed=SEED)),
        InitialiserSpec("workspace-init", "v1",
                        WorkspaceInit(workspace="_reserved")),
    ], config, make_iam_client=lambda: iam,
        make_flow_client=lambda ws: flow)
    r, _ = b.run_cycle()
    assert r["workspace-init"] == "failed"


# ---------------------------------------------------------------------------
# Fleet reconciliation view (data plane)
# ---------------------------------------------------------------------------


def test_bootstrap_pending_reads_real_store_encoding(spark):
    # the view must decode what store_flag actually persists
    # (json.dumps -> '"v1"'): a REAL converged deployment's config log
    # fed straight in reads all-skip / steady cadence
    b, config, _, _ = _boot(spark)
    b.converge()
    log = (config.log
           .where((F.col("workspace") == "__system__")
                  & (F.col("type") == "init-state"))
           .select(F.lit("prod").alias("deployment"),
                   F.col("key").alias("name"), "value", "seq", "deleted"))
    specs = spark.createDataFrame(
        [(s.name, s.flag) for s in b.specs], "name string, flag string")
    rows = bootstrap_pending(log, specs).collect()
    assert {r.verdict for r in rows} == {"skip"}
    assert {r.sleep_for for r in rows} == {STEADY_INTERVAL}
    # and a flag bump flips exactly that spec to run / INIT_RETRY
    specs2 = spark.createDataFrame(
        [("template-seed", "v2"), ("workspace-init", "v1"),
         ("default-flow", "v1")], "name string, flag string")
    got = {r.name: (r.verdict, r.sleep_for)
           for r in bootstrap_pending(log, specs2).collect()}
    assert got["template-seed"] == ("run", INIT_RETRY)
    assert got["workspace-init"] == ("skip", INIT_RETRY)


def test_bootstrap_pending_matches_replay(spark):
    rows = []
    # 6 deployments, 3 specs; deployment d_i has stored flags with
    # history: seq-ordered rewrites, tombstones, stale flags
    for d in range(6):
        dep = f"d{d}"
        rows.append((dep, "template-seed", "v0", 1, False))
        if d % 2 == 0:
            rows.append((dep, "template-seed", "v1", 2, False))
        if d % 3 == 0:
            rows.append((dep, "workspace-init", "v1", 3, False))
        if d == 3:
            rows.append((dep, "workspace-init", "v1", 4, True))  # tomb
    log = spark.createDataFrame(
        rows, "deployment string, name string, value string, seq long, "
              "deleted boolean")
    specs = spark.createDataFrame(
        [("template-seed", "v1"), ("workspace-init", "v1"),
         ("default-flow", "v1")], "name string, flag string")
    got = {(r.deployment, r.name): (r.verdict, r.sleep_for)
           for r in bootstrap_pending(log, specs).collect()}
    # Python replay
    stored = {}
    for dep, name, value, seq, deleted in rows:
        cur = stored.get((dep, name))
        if cur is None or seq > cur[0]:
            stored[(dep, name)] = (seq, None if deleted else value)
    for d in range(6):
        dep = f"d{d}"
        pending = any(
            (stored.get((dep, n)) or (0, None))[1] != "v1"
            for n in ("template-seed", "workspace-init", "default-flow"))
        sleep = INIT_RETRY if pending else STEADY_INTERVAL
        for n in ("template-seed", "workspace-init", "default-flow"):
            cur = (stored.get((dep, n)) or (0, None))[1]
            verdict = "skip" if cur == "v1" else "run"
            assert got[(dep, n)] == (verdict, sleep), (dep, n)
    assert len(got) == 18
    # every deployment here has default-flow pending
    assert all(v[1] == INIT_RETRY for v in got.values())
