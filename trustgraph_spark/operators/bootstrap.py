"""Bootstrapper — the reference's deployment-initialisation
reconciliation loop (bootstrap/bootstrapper/service.py:1-422, base.py,
initialisers/*): a pluggable list of initialisers converged by a
wake-cycle state machine whose completion state lives in the config
store's reserved ``__system__`` workspace under the ``init-state``
type.

This module composes the kernels already built here — the
ConfigService append-log store, the IamService (create-workspace), and
the FlowService (list/start flows) — exactly the way the reference
wires its Pulsar clients, so a full first-boot converges end-to-end in
one process: PulsarTopology (pre-gate transport seam) -> TemplateSeed
-> WorkspaceInit -> DefaultFlowStart.

Spark-first shape: one deployment's init-state is a handful of rows —
the reconciliation loop is driver-side control logic by design (like
the orchestrator kernels).  The DATA-PLANE face is
:func:`bootstrap_pending`: a fleet-reconciliation view that resolves
the init-state of MANY deployments from one append log (the same
window argmax as ``config_resolve``) and joins the broadcast spec list
to produce per-deployment pending-work verdicts and cadence — the
query a control plane managing thousands of deployments runs, one scan
+ one broadcast join at any fleet size.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SYSTEM_WORKSPACE = "__system__"
INIT_STATE_TYPE = "init-state"
TEMPLATE_WORKSPACE = "__template__"

# Cadence tiers (service.py:48-52).
GATE_BACKOFF = 5           # Services not responding; retry soon.
INIT_RETRY = 15            # Gate passed but something ran/failed.
STEADY_INTERVAL = 300      # Everything at target flag; idle cheaply.

# Pulsar namespace topology (initialisers/pulsar_topology.py:18-35) —
# the deterministic reconcile PLAN; the HTTP admin transport is a seam.
NAMESPACE_CONFIG = {
    "flow": {},
    "request": {},
    "response": {
        "retention_policies": {
            "retentionSizeInMB": -1,
            "retentionTimeInMinutes": 3,
            "subscriptionExpirationTimeMinutes": 30,
        },
    },
    "notify": {
        "retention_policies": {
            "retentionSizeInMB": -1,
            "retentionTimeInMinutes": 3,
            "subscriptionExpirationTimeMinutes": 5,
        },
    },
}


# ---------------------------------------------------------------------------
# Framework (bootstrap/base.py)
# ---------------------------------------------------------------------------


@dataclass
class InitContext:
    """Per-wake context handed to each initialiser (base.py:13-25):
    the config service, plus factories for the IAM and flow clients —
    here the in-process service kernels themselves."""
    config: Any
    make_flow_client: Callable[[str], Any] | None = None
    make_iam_client: Callable[[], Any] | None = None


class Initialiser:
    """Base class (base.py:28-69).  ``wait_for_services=False`` marks
    pre-gate infrastructure initialisers (Pulsar topology) that run
    before the config-service gate and without flag tracking — they
    must be idempotent."""

    wait_for_services: bool = True

    def __init__(self, **params):
        # Catch-all so stray params don't TypeError (base.py:47-52).
        pass

    def run(self, ctx: InitContext, old_flag, new_flag) -> None:
        raise NotImplementedError


@dataclass
class InitialiserSpec:
    """One configured initialiser (service.py:55-60)."""
    name: str
    flag: str
    instance: Initialiser


# The registry stands in for the reference's dotted-path importlib
# resolution (service.py:60-68) — same config shape, the class source
# is this module.  Reference dotted paths map to our twins so existing
# initialisers files parse unchanged.
def _registry() -> dict:
    reg = {
        "PulsarTopology": PulsarTopology,
        "TemplateSeed": TemplateSeed,
        "WorkspaceInit": WorkspaceInit,
        "DefaultFlowStart": DefaultFlowStart,
    }
    for name, cls in list(reg.items()):
        dotted = ("trustgraph.bootstrap.initialisers."
                  + _snake(name))
        reg[dotted + "." + name] = cls
    return reg


def _snake(name: str) -> str:
    out = []
    for i, ch in enumerate(name):
        if ch.isupper() and i:
            out.append("_")
        out.append(ch.lower())
    return "".join(out)


def parse_initialiser_specs(entries: list, registry: dict | None = None
                            ) -> list[InitialiserSpec]:
    """Validate and instantiate the configured initialisers list
    (service.py:113-158): every entry a mapping with class/name/flag,
    names unique, params forwarded to the constructor with the
    reference's error shaping."""
    reg = dict(_registry())
    if registry:
        reg.update(registry)
    specs, names = [], set()
    for entry in entries:
        if not isinstance(entry, dict):
            raise RuntimeError(
                f"Initialiser entry must be a mapping, got: {entry!r}")
        for required in ("class", "name", "flag"):
            if required not in entry:
                raise RuntimeError(
                    f"Initialiser entry missing required field "
                    f"{required!r}: {entry!r}")
        name = entry["name"]
        if name in names:
            raise RuntimeError(f"Duplicate initialiser name {name!r}")
        names.add(name)
        dotted = entry["class"]
        cls = reg.get(dotted) or reg.get(dotted.rpartition(".")[2])
        if cls is None:
            raise RuntimeError(
                f"Unknown initialiser class {dotted!r} "
                f"(register custom classes via the registry argument)")
        try:
            instance = cls(**entry.get("params", {}))
        except Exception as e:
            raise RuntimeError(
                f"Failed to instantiate initialiser {entry['class']!r} "
                f"as {name!r}: {type(e).__name__}: {e}")
        specs.append(InitialiserSpec(name=name, flag=entry["flag"],
                                     instance=instance))
    return specs


def load_initialisers_file(path: str) -> list:
    """service.py:71-98 — YAML or JSON, a mapping with an
    ``initialisers`` list."""
    with open(path) as f:
        content = f.read()
    if path.endswith((".yaml", ".yml")):
        import yaml
        doc = yaml.safe_load(content)
    else:
        doc = json.loads(content)
    if not isinstance(doc, dict) or "initialisers" not in doc:
        raise RuntimeError(
            f"{path}: expected a mapping with an 'initialisers' key")
    return doc["initialisers"]


# ---------------------------------------------------------------------------
# Initialisers
# ---------------------------------------------------------------------------


class PulsarTopology(Initialiser):
    """initialisers/pulsar_topology.py — tenant + four namespaces with
    retention policies, pre-gate.  The deterministic part is the
    reconcile plan; the HTTP admin calls are a transport seam: pass an
    ``admin`` callable(op, path, body) to execute, omit it to get the
    plan-only raise."""

    wait_for_services = False

    def __init__(self, admin_url: str = "http://pulsar:8080",
                 tenant: str = "tg", admin: Callable | None = None,
                 **kwargs):
        super().__init__(**kwargs)
        self.admin_url = admin_url.rstrip("/")
        self.tenant = tenant
        self._admin = admin

    def plan(self, clusters: list[str]) -> list[tuple[str, str, dict]]:
        """The idempotent op sequence: ensure-tenant then one
        ensure-namespace per NAMESPACE_CONFIG entry, policies attached."""
        ops = [("put-tenant", f"/admin/v2/tenants/{self.tenant}",
                {"allowedClusters": clusters})]
        for ns, cfg in NAMESPACE_CONFIG.items():
            ops.append(("put-namespace",
                        f"/admin/v2/namespaces/{self.tenant}/{ns}",
                        dict(cfg)))
        return ops

    def run(self, ctx: InitContext, old_flag, new_flag) -> None:
        if self._admin is None:
            raise NotImplementedError(
                "PulsarTopology needs a live Pulsar admin endpoint; "
                "inject admin=callable(op, path, body) (declared "
                "transport seam — see plan() for the op sequence)")
        clusters = self._admin("get-clusters", "/admin/v2/clusters", None)
        for op, path, body in self.plan(clusters or []):
            self._admin(op, path, body)


def _write_all(config, workspace: str, tree: dict) -> int:
    values = []
    for type_name, entries in tree.items():
        for key, value in entries.items():
            values.append((type_name, key, json.dumps(value)))
    if values:
        config.put_many(workspace, values)
    return len(values)


def _upsert_missing(config, workspace: str, tree: dict) -> int:
    written = 0
    for type_name, entries in tree.items():
        existing = set(config.keys(workspace, type_name))
        values = [(type_name, key, json.dumps(value))
                  for key, value in entries.items() if key not in existing]
        if values:
            config.put_many(workspace, values)
            written += len(values)
    return written


class TemplateSeed(Initialiser):
    """initialisers/template_seed.py — populate ``__template__`` from a
    seed tree {type: {key: json-value}}.  First run writes all;
    re-runs (flag change) overwrite or upsert-missing.  ``seed`` may be
    passed directly (in-process embedding) or via ``config_file``."""

    def __init__(self, config_file: str | None = None,
                 seed: dict | None = None, overwrite: bool = False,
                 **kwargs):
        super().__init__(**kwargs)
        if seed is None and not config_file:
            raise ValueError("TemplateSeed requires 'config_file'")
        self.config_file = config_file
        self.seed = seed
        self.overwrite = overwrite

    def _load(self) -> dict:
        if self.seed is not None:
            return self.seed
        with open(self.config_file) as f:
            return json.load(f)

    def run(self, ctx: InitContext, old_flag, new_flag) -> None:
        seed = self._load()
        if old_flag is None or self.overwrite:
            _write_all(ctx.config, TEMPLATE_WORKSPACE, seed)
        else:
            _upsert_missing(ctx.config, TEMPLATE_WORKSPACE, seed)


class WorkspaceInit(Initialiser):
    """initialisers/workspace_init.py — create the workspace via IAM
    (duplicate tolerated; any other IAM error raises so the cycle
    retries) and populate it from the ``__template__`` workspace or a
    seed file.  An EMPTY template raises — the bootstrapper re-runs
    next cycle once TemplateSeed has converged (the reference's
    prerequisite-ordering mechanism)."""

    def __init__(self, workspace: str = "default",
                 source: str = "template", seed_file: str | None = None,
                 seed: dict | None = None, overwrite: bool = False,
                 **kwargs):
        super().__init__(**kwargs)
        if source not in ("template", "seed-file"):
            raise ValueError(
                f"WorkspaceInit: source must be 'template' or "
                f"'seed-file', got {source!r}")
        if source == "seed-file" and not (seed_file or seed is not None):
            raise ValueError(
                "WorkspaceInit: seed_file required when source='seed-file'")
        self.workspace = workspace
        self.source = source
        self.seed_file = seed_file
        self.seed = seed
        self.overwrite = overwrite

    def _create_workspace(self, ctx: InitContext) -> None:
        iam = ctx.make_iam_client()
        resp = iam.handle({
            "operation": "create-workspace",
            "workspace_record": {"id": self.workspace,
                                 "name": self.workspace.title(),
                                 "enabled": True},
        })
        err = resp.get("error")
        if err and err["type"] != "duplicate":
            raise RuntimeError(
                f"IAM create-workspace failed: "
                f"{err['type']}: {err['message']}")

    def _load_from_template(self, ctx: InitContext) -> dict:
        raw_tree = ctx.config.get_config(TEMPLATE_WORKSPACE)
        tree, total = {}, 0
        for type_name, entries in raw_tree.items():
            parsed = {}
            for key, raw in entries.items():
                if raw is None:
                    continue
                try:
                    parsed[key] = json.loads(raw)
                except Exception:
                    parsed[key] = raw
                total += 1
            if parsed:
                tree[type_name] = parsed
        if total == 0:
            raise RuntimeError(
                "Template workspace is empty — has TemplateSeed run yet?")
        return tree

    def run(self, ctx: InitContext, old_flag, new_flag) -> None:
        self._create_workspace(ctx)
        if self.source == "seed-file":
            if self.seed is not None:
                tree = self.seed
            else:
                with open(self.seed_file) as f:
                    tree = json.load(f)
        else:
            tree = self._load_from_template(ctx)
        if old_flag is None or self.overwrite:
            _write_all(ctx.config, self.workspace, tree)
        else:
            _upsert_missing(ctx.config, self.workspace, tree)


class DefaultFlowStart(Initialiser):
    """initialisers/default_flow_start.py — start a named flow from a
    blueprint.  Prerequisites raise (workspace not yet registered in
    ``__workspaces__``) so the cycle retries; an already-running flow
    is the belt-and-braces no-op beyond the flag gate."""

    def __init__(self, workspace: str = "default",
                 flow_id: str = "default", blueprint: str | None = None,
                 description: str = "Default",
                 parameters: dict | None = None, **kwargs):
        super().__init__(**kwargs)
        if not blueprint:
            raise ValueError("DefaultFlowStart requires 'blueprint'")
        self.workspace = workspace
        self.flow_id = flow_id
        self.blueprint = blueprint
        self.description = description
        self.parameters = dict(parameters) if parameters else {}

    def run(self, ctx: InitContext, old_flag, new_flag) -> None:
        workspaces = ctx.config.keys("__workspaces__", "workspace")
        if self.workspace not in workspaces:
            raise RuntimeError(
                f"Workspace {self.workspace!r} does not exist yet")
        flow = ctx.make_flow_client(self.workspace)
        if self.flow_id in (flow.list_flows(self.workspace) or []):
            return
        flow.start_flow(self.workspace, self.flow_id, self.blueprint,
                        self.description, self.parameters)


# ---------------------------------------------------------------------------
# Reconciliation engine (service.py:200-400)
# ---------------------------------------------------------------------------


class Bootstrapper:
    """The wake-cycle reconciler.  ``run_cycle()`` executes one wake:
    gate probe, post-service spec convergence, cadence selection —
    returning (results, sleep_for) so the scheduling loop stays
    caller-owned (and testable).  Completion state is stored through
    the injected config service exactly where the reference puts it:
    ``__system__`` / ``init-state`` / <spec name> = json(flag)."""

    def __init__(self, specs: list[InitialiserSpec], config,
                 make_iam_client: Callable[[], Any] | None = None,
                 make_flow_client: Callable[[str], Any] | None = None):
        self.specs = specs
        self.config = config
        self._make_iam = make_iam_client
        self._make_flow = make_flow_client

    def _ctx(self) -> InitContext:
        return InitContext(config=self.config,
                           make_flow_client=self._make_flow,
                           make_iam_client=self._make_iam)

    # -- completion state (service.py:221-235) ---------------------------

    def stored_flag(self, name: str):
        raw = self.config.get(SYSTEM_WORKSPACE, INIT_STATE_TYPE, name)
        if raw is None:
            return None
        try:
            return json.loads(raw)
        except Exception:
            return raw

    def store_flag(self, name: str, flag) -> None:
        self.config.put(SYSTEM_WORKSPACE, INIT_STATE_TYPE, name,
                        json.dumps(flag))

    # -- gate (service.py:203-214) ----------------------------------------

    def gate_ready(self) -> bool:
        try:
            self.config.keys(SYSTEM_WORKSPACE, INIT_STATE_TYPE)
        except Exception:
            return False
        return True

    # -- per-spec state machine (service.py:242-295) ------------------------

    def run_spec(self, spec: InitialiserSpec) -> str:
        """skip | ran | failed | failed-state-write."""
        try:
            old_flag = self.stored_flag(spec.name)
        except Exception:
            return "failed"
        if old_flag == spec.flag:
            return "skip"
        try:
            spec.instance.run(self._ctx(), old_flag, spec.flag)
        except Exception:
            return "failed"
        try:
            self.store_flag(spec.name, spec.flag)
        except Exception:
            # Transient: work done but not recorded — re-runs next
            # cycle, which is why initialisers must be idempotent.
            return "failed-state-write"
        return "ran"

    # -- pre-service phase (service.py:301-337) ------------------------------

    def run_pre_service(self) -> None:
        """Pre-gate infrastructure initialisers: no flag tracking,
        failures raise (the caller's loop retries at GATE_BACKOFF)."""
        for spec in self.specs:
            if not spec.instance.wait_for_services:
                spec.instance.run(self._ctx(), None, spec.flag)

    # -- one wake cycle (service.py:355-400) ----------------------------------

    def run_cycle(self) -> tuple[dict, int]:
        gate_ok = self.gate_ready()
        results: dict[str, str] = {}
        if gate_ok:
            for spec in self.specs:
                if spec.instance.wait_for_services:
                    results[spec.name] = self.run_spec(spec)
        if not gate_ok:
            sleep_for = GATE_BACKOFF
        elif any(r != "skip" for r in results.values()):
            sleep_for = INIT_RETRY
        else:
            sleep_for = STEADY_INTERVAL
        return results, sleep_for

    def converge(self, max_cycles: int = 10) -> list[tuple[dict, int]]:
        """Run cycles until steady state or ``max_cycles`` — the test /
        first-boot harness face of the reference's endless loop."""
        history = []
        for _ in range(max_cycles):
            results, sleep_for = self.run_cycle()
            history.append((results, sleep_for))
            if sleep_for == STEADY_INTERVAL:
                break
        return history


# ---------------------------------------------------------------------------
# Data plane: fleet reconciliation view
# ---------------------------------------------------------------------------


def bootstrap_pending(init_log: DataFrame, specs: DataFrame) -> DataFrame:
    """Resolve pending initialiser work for MANY deployments from one
    init-state append log: (deployment, name, value, seq, deleted) ->
    last-write-wins per (deployment, name) — the same window argmax as
    ``config_resolve`` — right-joined against the broadcast spec list
    (name, flag) per deployment, yielding verdict 'skip' when the
    stored flag matches the target and 'run' otherwise (never-stored
    and tombstoned flags both mean run, per stored_flag's None
    semantics).  Stored values are DECODED the way ``stored_flag``
    decodes them: ``store_flag`` persists ``json.dumps(flag)``, so a
    converged deployment's log holds '"v1"' — json-parse with
    raw-string fallback (native variant get) before comparing against
    the spec's plain flag string.  Adds the per-deployment cadence the
    reference's loop would pick: INIT_RETRY while anything is pending,
    else STEADY_INTERVAL.  One shuffle on the log + one broadcast join
    at any fleet size."""
    from pyspark.sql import Window

    w = Window.partitionBy("deployment", "name").orderBy(
        F.col("seq").desc())
    decoded = F.coalesce(
        F.try_variant_get(F.try_parse_json(F.col("value")), "$", "string"),
        F.col("value"))
    current = (init_log
               .withColumn("_rn", F.row_number().over(w))
               .where((F.col("_rn") == 1) & ~F.col("deleted"))
               .select("deployment", "name", decoded.alias("stored")))
    deployments = init_log.select("deployment").distinct()
    wanted = deployments.crossJoin(F.broadcast(specs))
    verdicts = (wanted
                .join(current, ["deployment", "name"], "left")
                .select("deployment", "name",
                        F.when(F.col("stored") == F.col("flag"),
                               F.lit("skip")).otherwise(F.lit("run"))
                        .alias("verdict")))
    cadence = (verdicts.groupBy("deployment")
               .agg(F.when(F.max(F.col("verdict") == "run"),
                           F.lit(INIT_RETRY))
                    .otherwise(F.lit(STEADY_INTERVAL)).alias("sleep_for")))
    return verdicts.join(cadence, "deployment")
