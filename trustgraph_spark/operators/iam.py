"""IAM service — the reference's identity / authorisation regime
(iam/service/iam.py:1-1402 over tables/iam.py's four Cassandra tables
``iam_workspaces`` / ``iam_users`` (+ username lookup) /
``iam_api_keys`` (key_hash primary key) / ``iam_signing_keys``), plus
the no-auth permissive handler (iam/noauth/handler.py:20-140) and the
service processor's audit-event shaping (iam/service/service.py:
274-405).

Spark-first shape: the gateway-facing HOT PATH is not the CRUD — it is
``resolve-api-key`` and ``authorise``, which the reference evaluates
one request at a time against Cassandra point reads.  Here both are
BATCH data-plane operators: a micro-batch of inbound credentials /
authorisation checks is joined against the identity tables in one
plan — the identity dimensions (users, api keys, workspaces, and the
~3x40 role-capability vocabulary) are broadcast, the request stream is
the big side, and every verdict rule (key expiry, disabled user,
disabled workspace, role capability + workspace scope) is a native
column expression.  At 100 TB-of-traffic scale this is one scan of the
request batch with zero shuffles; the reference's shape is N round
trips.

The per-request service kernel (``IamService``) mirrors the reference
handler-for-handler — bootstrap token/bootstrap modes with masked
failures, login issuing REAL Ed25519 JWTs (the ``cryptography``
package is present in this image), password hashing in the reference's
``pbkdf2-sha256$iters$salt$hash`` envelope, CRUD validation arms,
cascade semantics (disable-user revokes keys; disable-workspace
disables users and revokes their keys), signing-key rotation — with an
injectable clock / token source so every behavior is deterministic
under test.  Pure-Python crypto here is driver-side per-request work
(login IS per-request in the reference too), not a corpus seam; the
corpus-scale faces are the two batch operators above.
"""

from __future__ import annotations

import base64
import hashlib
import json
import secrets
import uuid
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Role / capability vocabulary (iam/service/iam.py:58-121).  These
# constant tables ARE the behavioral contract being replicated — the
# OSS regime's policy lives here, not in the gateway.
# ---------------------------------------------------------------------------

READER_CAPS = frozenset({
    "agent",
    "graph:read",
    "triples:read",
    "sparql:read",
    "graph-rag:read",
    "graph-embeddings:read",
    "documents:read",
    "document-rag:read",
    "document-embeddings:read",
    "entity-contexts:read",
    "rows:read",
    "nlp-query:read",
    "structured-query:read",
    "row-embeddings:read",
    "llm",
    "embeddings",
    "reranker",
    "image-to-text",
    "mcp",
    "config:read",
    "flows:read",
    "collections:read",
    "knowledge:read",
    "keys:self",
})

WRITER_CAPS = READER_CAPS | {
    "graph:write",
    "triples:write",
    "graph-embeddings:write",
    "document-embeddings:write",
    "entity-contexts:write",
    "documents:write",
    "rows:write",
    "collections:write",
    "knowledge:write",
}

ADMIN_CAPS = WRITER_CAPS | {
    "config:write",
    "flows:write",
    "users:read", "users:write", "users:admin",
    "keys:admin",
    "workspaces:admin",
    "iam:admin",
    "metrics:read",
}

ROLE_DEFINITIONS = {
    "reader": {"capabilities": READER_CAPS, "workspace_scope": "assigned"},
    "writer": {"capabilities": WRITER_CAPS, "workspace_scope": "assigned"},
    "admin": {"capabilities": ADMIN_CAPS, "workspace_scope": "*"},
}

DEFAULT_WORKSPACE = "default"
BOOTSTRAP_ADMIN_USERNAME = "admin"
BOOTSTRAP_ADMIN_NAME = "Administrator"

PBKDF2_ITERATIONS = 600_000
API_KEY_PREFIX = "tg_"
API_KEY_RANDOM_BYTES = 24

JWT_ISSUER = "trustgraph-iam"
JWT_TTL_SECONDS = 3600
AUTHZ_CACHE_TTL_SECONDS = 60


def scope_permits(role_scope: str, target_workspace: str,
                  assigned_workspace: str) -> bool:
    """iam.py:123-130 — does a role with ``role_scope`` apply to
    ``target_workspace`` for a user homed in ``assigned_workspace``?"""
    if role_scope == "*":
        return True
    if role_scope == "assigned":
        return target_workspace == assigned_workspace
    return False


# ---------------------------------------------------------------------------
# Credential primitives (iam.py:150-260).  Reference envelope formats
# kept bit-exact so stored rows interoperate.
# ---------------------------------------------------------------------------


def hash_password(password: str, *, salt: bytes | None = None,
                  iterations: int = PBKDF2_ITERATIONS) -> str:
    """``pbkdf2-sha256$<iters>$<b64-salt>$<b64-hash>`` (iam.py:150-166).
    ``salt`` is injectable for deterministic tests; production callers
    leave it None for a fresh random salt."""
    if salt is None:
        salt = secrets.token_bytes(16)
    dk = hashlib.pbkdf2_hmac("sha256", password.encode("utf-8"),
                             salt, iterations)
    return (f"pbkdf2-sha256${iterations}"
            f"${base64.b64encode(salt).decode('ascii')}"
            f"${base64.b64encode(dk).decode('ascii')}")


def verify_password(password: str, encoded: str) -> bool:
    """Constant-time verify against the stored envelope; every
    malformed-envelope arm returns False (iam.py:169-187)."""
    try:
        algo, iters, b64_salt, b64_hash = (encoded or "").split("$")
    except ValueError:
        return False
    if algo != "pbkdf2-sha256":
        return False
    try:
        iters = int(iters)
        salt = base64.b64decode(b64_salt)
        target = base64.b64decode(b64_hash)
    except Exception:
        return False
    dk = hashlib.pbkdf2_hmac("sha256", password.encode("utf-8"),
                             salt, iters)
    return secrets.compare_digest(dk, target)


def generate_api_key(token_fn: Callable[[int], str] | None = None) -> str:
    """``tg_<urlsafe-random>`` (iam.py:189-191)."""
    fn = token_fn or secrets.token_urlsafe
    return API_KEY_PREFIX + fn(API_KEY_RANDOM_BYTES)


def hash_api_key(plaintext: str) -> str:
    """SHA-256 hex digest — the ``iam_api_keys`` primary key, making
    resolve-api-key O(1) (iam.py:194-197)."""
    return hashlib.sha256(plaintext.encode("utf-8")).hexdigest()


def key_prefix(plaintext: str) -> str:
    """The stored display prefix: ``tg_`` + 4 chars (iam.py:1213)."""
    return plaintext[:len(API_KEY_PREFIX) + 4]


def b64url(data: bytes) -> str:
    """URL-safe base64 without padding, per JWT (iam.py:213-215)."""
    return base64.urlsafe_b64encode(data).rstrip(b"=").decode("ascii")


def generate_signing_keypair() -> tuple[str, str, str]:
    """(kid, private_pem, public_pem) for a fresh Ed25519 keypair
    (iam.py:218-234)."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ed25519

    key = ed25519.Ed25519PrivateKey.generate()
    private_pem = key.private_bytes(
        encoding=serialization.Encoding.PEM,
        format=serialization.PrivateFormat.PKCS8,
        encryption_algorithm=serialization.NoEncryption(),
    ).decode("ascii")
    public_pem = key.public_key().public_bytes(
        encoding=serialization.Encoding.PEM,
        format=serialization.PublicFormat.SubjectPublicKeyInfo,
    ).decode("ascii")
    kid = uuid.uuid4().hex[:16]
    return kid, private_pem, public_pem


def sign_jwt(kid: str, private_pem: str, claims: dict) -> str:
    """Compact-serialisation EdDSA JWT (iam.py:237-260): sorted-key
    compact JSON for header and payload, Ed25519 signature."""
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ed25519

    key = serialization.load_pem_private_key(
        private_pem.encode("ascii"), password=None)
    if not isinstance(key, ed25519.Ed25519PrivateKey):
        raise RuntimeError(
            f"signing key is not Ed25519: {type(key).__name__}")
    header = {"alg": "EdDSA", "typ": "JWT", "kid": kid}
    header_b = b64url(json.dumps(
        header, separators=(",", ":"), sort_keys=True).encode("utf-8"))
    payload_b = b64url(json.dumps(
        claims, separators=(",", ":"), sort_keys=True).encode("utf-8"))
    signing_input = f"{header_b}.{payload_b}".encode("ascii")
    signature = key.sign(signing_input)
    return f"{header_b}.{payload_b}.{b64url(signature)}"


def verify_jwt(token: str, public_pem: str) -> dict:
    """Validate an EdDSA JWT against the public key and return its
    claims.  The reference defers validation to the gateway middleware;
    provided here so the issued-token contract is testable end-to-end.
    Raises ValueError on any structural or signature failure."""
    from cryptography.hazmat.primitives import serialization

    try:
        header_b, payload_b, sig_b = token.split(".")
    except ValueError:
        raise ValueError("not a compact JWT")

    def _unb64(s: str) -> bytes:
        return base64.urlsafe_b64decode(s + "=" * (-len(s) % 4))

    header = json.loads(_unb64(header_b))
    if header.get("alg") != "EdDSA":
        raise ValueError(f"unexpected alg: {header.get('alg')!r}")
    key = serialization.load_pem_public_key(public_pem.encode("ascii"))
    try:
        key.verify(_unb64(sig_b),
                   f"{header_b}.{payload_b}".encode("ascii"))
    except Exception as e:
        raise ValueError(f"bad signature: {e}")
    return json.loads(_unb64(payload_b))


# ---------------------------------------------------------------------------
# Batch data plane
# ---------------------------------------------------------------------------

USERS_SCHEMA = ("id string, default_workspace string, username string, "
                "name string, email string, password_hash string, "
                "roles array<string>, enabled boolean, "
                "must_change_password boolean, created string")
API_KEYS_SCHEMA = ("key_hash string, id string, user_id string, "
                   "name string, prefix string, expires_epoch long, "
                   "created string, last_used string")
WORKSPACES_SCHEMA = "id string, name string, enabled boolean, created string"


def role_capability_rows() -> list[tuple[str, str, str]]:
    """The ROLE_DEFINITIONS vocabulary flattened to (role, capability,
    workspace_scope) rows — the broadcast dimension for
    :func:`authorise_batch`.  ~3x40 rows at any deployment size."""
    out = []
    for role, defn in sorted(ROLE_DEFINITIONS.items()):
        for cap in sorted(defn["capabilities"]):
            out.append((role, cap, defn["workspace_scope"]))
    return out


def authorise_batch(spark: SparkSession, checks: DataFrame,
                    users: DataFrame) -> DataFrame:
    """The regime's ``authorise`` contract (iam.py:1304-1344 _decide)
    over a BATCH of checks: (check_id, user_id, capability,
    target_workspace?) -> (check_id, allow, ttl).

    Decision rule, replicated exactly: deny if the user is unknown or
    disabled; else allow iff SOME held role (unknown role names are
    skipped) grants the capability AND (no target workspace is
    involved OR the role's workspace scope permits it — '*' always,
    'assigned' iff target == the user's home workspace).

    Plan shape: checks (big side, the gateway's request stream) left-
    joins the users dim, explodes held roles, and left-joins the
    broadcast ~120-row role-capability vocabulary on (role,
    capability); the verdict is one boolean expression and a map-side-
    combinable max() per check.  No Python anywhere."""
    defs = F.broadcast(spark.createDataFrame(
        role_capability_rows(),
        "role string, capability string, workspace_scope string"))
    u = users.select(
        F.col("id").alias("user_id"),
        F.col("default_workspace").alias("_assigned"),
        F.col("roles").alias("_roles"),
        F.col("enabled").alias("_enabled"))
    per_role = (checks
                .join(F.broadcast(u), "user_id", "left")
                .select("check_id", "capability", "target_workspace",
                        "_assigned", "_enabled",
                        F.explode_outer("_roles").alias("role"))
                .join(defs, ["role", "capability"], "left"))
    # '' target means absent, matching _decide's falsy extraction of
    # the workspace from resource/parameters (iam.py:1322-1325) — the
    # batch and per-request faces must agree on every input
    no_target = (F.col("target_workspace").isNull()
                 | (F.col("target_workspace") == ""))
    allow_row = (
        F.coalesce(F.col("_enabled"), F.lit(False))
        & F.col("workspace_scope").isNotNull()
        & (no_target
           | (F.col("workspace_scope") == "*")
           | ((F.col("workspace_scope") == "assigned")
              & (F.col("target_workspace") == F.col("_assigned")))))
    return (per_role
            .groupBy("check_id")
            .agg(F.coalesce(F.max(allow_row), F.lit(False)).alias("allow"))
            .withColumn("ttl", F.lit(AUTHZ_CACHE_TTL_SECONDS)))


def resolve_api_keys_batch(requests: DataFrame, api_keys: DataFrame,
                           users: DataFrame, workspaces: DataFrame,
                           now_epoch: int) -> DataFrame:
    """``resolve-api-key`` (iam.py:1070-1112) over a batch of inbound
    credentials: (req_id, api_key?) -> (req_id, error, user_id,
    default_workspace, roles_csv).

    The reference's failure arms, in ITS precedence order, as one CASE:
    no key -> 'no api key'; hash miss -> 'unknown api key'; expiry
    (NULL = never) -> 'api key expired'; owner row missing -> 'owning
    user missing'; owner disabled -> 'owning user disabled'; owner's
    home workspace missing-or-disabled -> 'owning workspace disabled';
    else the resolved identity (roles sorted, per _row_to_user_record).
    Expiry is carried as epoch seconds (``expires_epoch``); the
    reference stores a timestamp — representation only, same compare.

    Plan shape: sha2 of the presented key (the table's primary key)
    equi-joins the broadcast key dim, then the broadcast user and
    workspace dims — the request stream never shuffles."""
    k = api_keys.select("key_hash", F.col("id").alias("_key_id"),
                        F.col("user_id").alias("_owner"), "expires_epoch")
    u = users.select(F.col("id").alias("_owner"),
                     F.col("default_workspace").alias("_ws"),
                     F.col("roles").alias("_roles"),
                     F.col("enabled").alias("_u_enabled"))
    w = workspaces.select(F.col("id").alias("_ws"),
                          F.col("enabled").alias("_w_enabled"))
    j = (requests
         .withColumn("_kh", F.sha2(F.col("api_key").cast("binary"), 256))
         .join(F.broadcast(k), F.col("_kh") == F.col("key_hash"), "left")
         .join(F.broadcast(u), "_owner", "left")
         .join(F.broadcast(w), "_ws", "left"))
    error = (
        F.when(F.col("api_key").isNull() | (F.col("api_key") == ""),
               F.lit("no api key"))
        .when(F.col("_key_id").isNull(), F.lit("unknown api key"))
        .when(F.col("expires_epoch").isNotNull()
              & (F.col("expires_epoch") < F.lit(now_epoch)),
              F.lit("api key expired"))
        .when(F.col("_u_enabled").isNull(), F.lit("owning user missing"))
        .when(~F.col("_u_enabled"), F.lit("owning user disabled"))
        .when(F.col("_w_enabled").isNull() | ~F.col("_w_enabled"),
              F.lit("owning workspace disabled"))
        .otherwise(F.lit("")))
    ok = error == ""
    return j.select(
        "req_id",
        error.alias("error"),
        F.when(ok, F.col("_owner")).otherwise(F.lit("")).alias("user_id"),
        F.when(ok, F.col("_ws")).otherwise(F.lit(""))
        .alias("default_workspace"),
        F.when(ok, F.array_join(F.array_sort(
            F.coalesce(F.col("_roles"),
                       F.array().cast("array<string>"))), ","))
        .otherwise(F.lit("")).alias("roles_csv"))


def disable_user_cascade(user_id: str, users: DataFrame,
                         api_keys: DataFrame) -> tuple[DataFrame, DataFrame]:
    """handle_disable_user (iam.py:818-837) set-oriented: flip the
    user's enabled flag, revoke (anti-join away) every key they own."""
    users2 = users.withColumn(
        "enabled",
        F.when(F.col("id") == user_id, F.lit(False))
        .otherwise(F.col("enabled")))
    # null-safe: a NULL-owner key row must survive (plain != filters
    # NULLs out, i.e. silently revokes them)
    keys2 = api_keys.where(~F.col("user_id").eqNullSafe(F.lit(user_id)))
    return users2, keys2


def disable_workspace_cascade(
        workspace_id: str, workspaces: DataFrame, users: DataFrame,
        api_keys: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """handle_disable_workspace (iam.py:995-1030) set-oriented: disable
    the workspace, disable every user homed there, revoke every key
    those users own — the reference's per-user loop becomes one flag
    projection plus one broadcast anti-join."""
    ws2 = workspaces.withColumn(
        "enabled",
        F.when(F.col("id") == workspace_id, F.lit(False))
        .otherwise(F.col("enabled")))
    affected = (users.where(F.col("default_workspace") == workspace_id)
                .select(F.col("id").alias("user_id")))
    users2 = users.withColumn(
        "enabled",
        F.when(F.col("default_workspace") == workspace_id, F.lit(False))
        .otherwise(F.col("enabled")))
    keys2 = api_keys.join(F.broadcast(affected), "user_id", "left_anti")
    return ws2, users2, keys2


# ---------------------------------------------------------------------------
# Per-request service kernel
# ---------------------------------------------------------------------------


def _err(type: str, message: str) -> dict:
    return {"error": {"type": type, "message": message}}


def _user_record(row: dict) -> dict:
    """_row_to_user_record (iam.py:380-395): roles sorted, password
    hash never leaves the store."""
    return {
        "id": row.get("id") or "",
        "default_workspace": row.get("default_workspace") or "",
        "username": row.get("username") or "",
        "name": row.get("name") or "",
        "email": row.get("email") or "",
        "roles": sorted(row.get("roles") or []),
        "enabled": bool(row.get("enabled")),
        "must_change_password": bool(row.get("must_change_password")),
        "created": row.get("created") or "",
    }


def _api_key_record(row: dict) -> dict:
    """_row_to_api_key_record (iam.py:397-410): the hash never leaves
    the store; only the display prefix does."""
    return {
        "id": row.get("id") or "",
        "user_id": row.get("user_id") or "",
        "name": row.get("name") or "",
        "prefix": row.get("prefix") or "",
        "expires": row.get("expires") or "",
        "created": row.get("created") or "",
        "last_used": row.get("last_used") or "",
    }


@dataclass
class IamStore:
    """In-memory twin of tables/iam.py's four tables.  ``users_by_
    username`` mirrors the reference's lookup table (global username
    uniqueness); ``api_keys`` is keyed by key_hash (the primary key)."""
    workspaces: dict = field(default_factory=dict)      # id -> row
    users: dict = field(default_factory=dict)           # id -> row
    users_by_username: dict = field(default_factory=dict)   # username -> id
    api_keys: dict = field(default_factory=dict)        # key_hash -> row
    signing_keys: dict = field(default_factory=dict)    # kid -> row

    def to_frames(self, spark: SparkSession
                  ) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Materialize (users, api_keys, workspaces) DataFrames for the
        batch operators — the bridge from the service kernel to the
        data plane."""
        users = spark.createDataFrame(
            [(r["id"], r["default_workspace"], r["username"], r["name"],
              r["email"], r["password_hash"], sorted(r["roles"] or []),
              bool(r["enabled"]), bool(r["must_change_password"]),
              r["created"]) for r in self.users.values()],
            USERS_SCHEMA)
        keys = spark.createDataFrame(
            [(h, r["id"], r["user_id"], r["name"], r["prefix"],
              r["expires_epoch"], r["created"], r["last_used"])
             for h, r in self.api_keys.items()],
            API_KEYS_SCHEMA)
        ws = spark.createDataFrame(
            [(r["id"], r["name"], bool(r["enabled"]), r["created"])
             for r in self.workspaces.values()],
            WORKSPACES_SCHEMA)
        return users, keys, ws


class IamService:
    """Handler-for-handler mirror of the reference IamService
    (iam/service/iam.py:263-1402) over :class:`IamStore`.

    Injectables keep every behavior deterministic under test:
    ``now_fn`` -> epoch seconds (int), ``token_fn(nbytes)`` -> urlsafe
    token, ``uuid_fn`` -> hex string, ``iterations`` -> PBKDF2 cost
    (tests lower it; the envelope records it per-row so verification
    is self-describing, as in the reference).

    Requests and responses are plain dicts shaped like the wire
    schema's IamRequest/IamResponse fields.  ``audit_events`` collects
    the processor's audit emissions (service.py:337-405) —
    (kind, payload) tuples — in arrival order.
    """

    def __init__(self, bootstrap_mode: str, bootstrap_token: str | None =
                 None, *, now_fn: Callable[[], int] | None = None,
                 token_fn: Callable[[int], str] | None = None,
                 uuid_fn: Callable[[], str] | None = None,
                 iterations: int = PBKDF2_ITERATIONS,
                 on_workspace_created: Callable[[str], None] | None = None,
                 on_workspace_deleted: Callable[[str], None] | None = None):
        if bootstrap_mode not in ("token", "bootstrap"):
            raise ValueError(
                f"bootstrap_mode must be 'token' or 'bootstrap', "
                f"got {bootstrap_mode!r}")
        if bootstrap_mode == "token" and not bootstrap_token:
            raise ValueError("bootstrap_token required in token mode")
        self.store = IamStore()
        self.bootstrap_mode = bootstrap_mode
        self.bootstrap_token = bootstrap_token
        self._now = now_fn or (lambda: 0)
        self._token = token_fn or secrets.token_urlsafe
        self._uuid = uuid_fn or (lambda: str(uuid.uuid4()))
        self._iterations = iterations
        self._signing_key: tuple[str, str, str] | None = None
        self._on_ws_created = on_workspace_created
        self._on_ws_deleted = on_workspace_deleted
        self.audit_events: list[tuple[str, dict]] = []
        if bootstrap_mode == "token":
            self._auto_bootstrap()

    # -- time / record helpers ------------------------------------------

    def _now_iso(self) -> str:
        import datetime
        return datetime.datetime.fromtimestamp(
            self._now(), tz=datetime.timezone.utc).isoformat()

    # -- seeding (iam.py:442-506) ---------------------------------------

    def _auto_bootstrap(self) -> None:
        if self.store.signing_keys:
            return
        self._seed_tables(self.bootstrap_token)

    def _seed_tables(self, api_key_plaintext: str) -> str:
        now = self._now_iso()
        admin_user_id = self._uuid()
        admin_password = self._token(32)
        self._put_user(
            id=admin_user_id, default_workspace=DEFAULT_WORKSPACE,
            username=BOOTSTRAP_ADMIN_USERNAME, name=BOOTSTRAP_ADMIN_NAME,
            email="",
            password_hash=hash_password(admin_password,
                                        iterations=self._iterations),
            roles=["admin"], enabled=True, must_change_password=True,
            created=now)
        self.store.api_keys[hash_api_key(api_key_plaintext)] = {
            "id": self._uuid(), "user_id": admin_user_id,
            "name": "bootstrap", "prefix": key_prefix(api_key_plaintext),
            "expires": "", "expires_epoch": None,
            "created": now, "last_used": "",
        }
        kid, priv, pub = generate_signing_keypair()
        self.store.signing_keys[kid] = {
            "kid": kid, "private_pem": priv, "public_pem": pub,
            "created": now, "retired": None,
        }
        self._signing_key = (kid, priv, pub)
        return admin_user_id

    def _put_user(self, **row) -> None:
        self.store.users[row["id"]] = row
        self.store.users_by_username[row["username"]] = row["id"]

    # -- dispatch (service.py:287-317 + audit) --------------------------

    AUTHENTICATE_OPS = frozenset({
        "resolve-api-key", "login", "authenticate-anonymous",
    })
    AUTHORISE_OPS = frozenset({"authorise", "authorise-many"})
    MANAGEMENT_OPS = frozenset({
        "create-user", "update-user", "disable-user", "enable-user",
        "delete-user", "create-api-key", "revoke-api-key",
        "create-workspace", "update-workspace", "disable-workspace",
        "reset-password", "rotate-signing-key", "bootstrap",
    })

    _HANDLERS = {
        "bootstrap": "handle_bootstrap",
        "bootstrap-status": "handle_bootstrap_status",
        "whoami": "handle_whoami",
        "login": "handle_login",
        "get-signing-key-public": "handle_get_signing_key_public",
        "rotate-signing-key": "handle_rotate_signing_key",
        "resolve-api-key": "handle_resolve_api_key",
        "change-password": "handle_change_password",
        "reset-password": "handle_reset_password",
        "create-user": "handle_create_user",
        "get-user": "handle_get_user",
        "update-user": "handle_update_user",
        "disable-user": "handle_disable_user",
        "enable-user": "handle_enable_user",
        "delete-user": "handle_delete_user",
        "list-users": "handle_list_users",
        "create-workspace": "handle_create_workspace",
        "get-workspace": "handle_get_workspace",
        "update-workspace": "handle_update_workspace",
        "disable-workspace": "handle_disable_workspace",
        "list-workspaces": "handle_list_workspaces",
        "list-my-workspaces": "handle_list_my_workspaces",
        "create-api-key": "handle_create_api_key",
        "list-api-keys": "handle_list_api_keys",
        "revoke-api-key": "handle_revoke_api_key",
        "authorise": "handle_authorise",
        "authorise-many": "handle_authorise_many",
    }

    def handle(self, v: dict) -> dict:
        """Operation dispatch + audit emission, mirroring the
        processor's on_iam_request -> _emit_audit path."""
        op = v.get("operation", "")
        name = self._HANDLERS.get(op)
        if name is None:
            resp = _err("invalid-argument", f"unknown operation: {op!r}")
        else:
            try:
                resp = getattr(self, name)(v)
            except Exception as e:  # service.py:318-335 error shaping
                resp = _err("internal-error", str(e))
        self._emit_audit(op, v, resp)
        return resp

    # -- audit shaping (service.py:337-405) ------------------------------

    @staticmethod
    def _credential_type(operation: str) -> str:
        if operation == "resolve-api-key":
            return "api-key"
        if operation == "login":
            return "login-password"
        return "anonymous"

    def _emit_audit(self, op: str, v: dict, resp: dict) -> None:
        if op in self.AUTHENTICATE_OPS:
            has_error = "error" in resp
            payload = {
                "request_id": v.get("request_id"),
                "credential_type": self._credential_type(op),
                # schema default: resolved_user_id is '' when unset
                # (login success sets only jwt fields), never None
                "identity": ((resp.get("resolved_user_id") or "")
                             if not has_error else "unknown"),
                "outcome": "failure" if has_error else "success",
                "client_ip": v.get("client_ip"),
            }
            if has_error:
                payload["failure_reason"] = resp["error"]["type"]
            if v.get("key_id"):
                payload["key_id"] = v["key_id"]
            self.audit_events.append(("iam.authenticate", payload))
        elif op in self.AUTHORISE_OPS:
            workspace = v.get("workspace")
            if not workspace:
                try:
                    resource = json.loads(v.get("resource_json") or "{}")
                    workspace = resource.get("workspace", "")
                except Exception:
                    pass
            payload = {
                "request_id": v.get("request_id"),
                "identity": v.get("user_id"),
                "capability": v.get("capability"),
                "outcome": ("allow" if resp.get("decision_allow")
                            else "deny"),
            }
            if workspace:
                payload["workspace"] = workspace
            if not resp.get("decision_allow"):
                payload["denial_reason"] = "capability-not-in-role"
            self.audit_events.append(("iam.authorise", payload))
        elif op in self.MANAGEMENT_OPS:
            has_error = "error" in resp
            payload = {
                "request_id": v.get("request_id"),
                "actor": v.get("actor"),
                "operation": op,
                "outcome": "error" if has_error else "success",
            }
            if v.get("user_id"):
                payload["target_identity"] = v["user_id"]
            if v.get("workspace"):
                payload["target_workspace"] = v["workspace"]
            self.audit_events.append(("iam.management", payload))

    # -- bootstrap (iam.py:494-549) --------------------------------------

    def handle_bootstrap(self, v: dict) -> dict:
        """Every refusal arm masked to the same generic failure — the
        caller cannot distinguish wrong-mode from already-seeded."""
        if self.bootstrap_mode != "bootstrap":
            return _err("auth-failed", "auth failure")
        if self.store.signing_keys:
            return _err("auth-failed", "auth failure")
        plaintext = generate_api_key(self._token)
        admin_user_id = self._seed_tables(plaintext)
        return {"bootstrap_admin_user_id": admin_user_id,
                "bootstrap_admin_api_key": plaintext}

    def handle_bootstrap_status(self, v: dict) -> dict:
        return {"bootstrap_available": (
            self.bootstrap_mode == "bootstrap"
            and not self.store.signing_keys)}

    def handle_whoami(self, v: dict) -> dict:
        if not v.get("actor"):
            return _err("invalid-argument",
                        "actor required (gateway should populate this)")
        row = self.store.users.get(v["actor"])
        if row is None:
            return _err("not-found", "user not found")
        return {"user": _user_record(row)}

    # -- signing keys (iam.py:551-592, 1032-1065) -------------------------

    def _get_active_signing_key(self) -> tuple[str, str, str]:
        if self._signing_key is not None:
            return self._signing_key
        active = [r for r in self.store.signing_keys.values()
                  if r["retired"] is None]
        if active:
            r = active[0]
            self._signing_key = (r["kid"], r["private_pem"],
                                 r["public_pem"])
            return self._signing_key
        kid, priv, pub = generate_signing_keypair()
        self.store.signing_keys[kid] = {
            "kid": kid, "private_pem": priv, "public_pem": pub,
            "created": self._now_iso(), "retired": None,
        }
        self._signing_key = (kid, priv, pub)
        return self._signing_key

    def handle_get_signing_key_public(self, v: dict) -> dict:
        _, _, pub = self._get_active_signing_key()
        return {"signing_key_public": pub}

    def handle_rotate_signing_key(self, v: dict) -> dict:
        """Retire the active key (kept for the validator's grace
        window), install a fresh one."""
        cur = self._get_active_signing_key()
        now = self._now_iso()
        self.store.signing_keys[cur[0]]["retired"] = now
        kid, priv, pub = generate_signing_keypair()
        self.store.signing_keys[kid] = {
            "kid": kid, "private_pem": priv, "public_pem": pub,
            "created": now, "retired": None,
        }
        self._signing_key = (kid, priv, pub)
        return {}

    # -- login (iam.py:594-650) -------------------------------------------

    def handle_login(self, v: dict) -> dict:
        if not v.get("username"):
            return _err("auth-failed", "username required")
        if not v.get("password"):
            return _err("auth-failed", "password required")
        user_id = self.store.users_by_username.get(v["username"])
        if not user_id:
            return _err("auth-failed", "no such user")
        row = self.store.users.get(user_id)
        if row is None:
            return _err("auth-failed", "user disappeared")
        if not row["enabled"]:
            return _err("auth-failed", "user disabled")
        if not row["password_hash"] or not verify_password(
                v["password"], row["password_hash"]):
            return _err("auth-failed", "bad credentials")
        jwt_workspace = v.get("workspace") or row["default_workspace"]
        ws = self.store.workspaces.get(jwt_workspace)
        if ws is None or not ws["enabled"]:
            return _err("auth-failed", "workspace disabled")
        kid, priv, _ = self._get_active_signing_key()
        now_ts = self._now()
        exp_ts = now_ts + JWT_TTL_SECONDS
        claims = {
            "iss": JWT_ISSUER,
            "sub": row["id"],
            "default_workspace": jwt_workspace,
            "iat": now_ts,
            "exp": exp_ts,
        }
        import datetime
        expires_iso = datetime.datetime.fromtimestamp(
            exp_ts, tz=datetime.timezone.utc).isoformat()
        return {"jwt": sign_jwt(kid, priv, claims),
                "jwt_expires": expires_iso}

    # -- resolve-api-key (iam.py:1070-1112) -------------------------------

    def handle_resolve_api_key(self, v: dict) -> dict:
        if not v.get("api_key"):
            return _err("auth-failed", "no api key")
        row = self.store.api_keys.get(hash_api_key(v["api_key"]))
        if row is None:
            return _err("auth-failed", "unknown api key")
        exp = row.get("expires_epoch")
        if exp is not None and exp < self._now():
            return _err("auth-failed", "api key expired")
        user = self.store.users.get(row["user_id"])
        if user is None:
            return _err("auth-failed", "owning user missing")
        if not user["enabled"]:
            return _err("auth-failed", "owning user disabled")
        ws = self.store.workspaces.get(user["default_workspace"])
        if ws is None or not ws["enabled"]:
            return _err("auth-failed", "owning workspace disabled")
        return {"resolved_user_id": user["id"],
                "resolved_default_workspace": user["default_workspace"],
                "resolved_roles": sorted(user["roles"] or [])}

    # -- passwords (iam.py:695-756) ----------------------------------------

    def handle_change_password(self, v: dict) -> dict:
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id required")
        if not v.get("password"):
            return _err("invalid-argument", "password (current) required")
        if not v.get("new_password"):
            return _err("invalid-argument", "new_password required")
        row = self.store.users.get(v["user_id"])
        if row is None:
            return _err("auth-failed", "no such user")
        if not row["enabled"]:
            return _err("auth-failed", "user disabled")
        if not row["password_hash"] or not verify_password(
                v["password"], row["password_hash"]):
            return _err("auth-failed", "bad credentials")
        row["password_hash"] = hash_password(
            v["new_password"], iterations=self._iterations)
        row["must_change_password"] = False
        return {}

    def handle_reset_password(self, v: dict) -> dict:
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id required")
        row, err = self._resolve_user(v["user_id"], v.get("workspace"))
        if err is not None:
            return err
        temporary = self._token(12)
        row["password_hash"] = hash_password(
            temporary, iterations=self._iterations)
        row["must_change_password"] = True
        return {"temporary_password": temporary}

    # -- user CRUD (iam.py:669-891, 1118-1182) ------------------------------

    def _resolve_user(self, user_id: str, workspace: str | None
                      ) -> tuple[dict | None, dict | None]:
        """Load by id; ``workspace`` is the reference's OPTIONAL
        integrity check on the record's home workspace."""
        row = self.store.users.get(user_id)
        if row is None:
            return None, _err("not-found", "user not found")
        if workspace and row["default_workspace"] != workspace:
            return None, _err("operation-not-permitted",
                              "user is in a different workspace")
        return row, None

    def handle_create_user(self, v: dict) -> dict:
        if not v.get("workspace"):
            return _err("invalid-argument",
                        "workspace required for create-user")
        user = v.get("user")
        if user is None:
            return _err("invalid-argument",
                        "user field required for create-user")
        if not user.get("username"):
            return _err("invalid-argument", "user.username required")
        if not user.get("password"):
            return _err("invalid-argument", "user.password required")
        ws = self.store.workspaces.get(v["workspace"])
        if ws is None or not ws["enabled"]:
            return _err("not-found", "workspace not found or disabled")
        if user["username"] in self.store.users_by_username:
            return _err("duplicate", "username already exists")
        user_id = self._uuid()
        # absent enabled/must_change_password take the UserInput schema
        # defaults (True / False, schema/services/iam.py:25-26) — storing
        # the raw absent value would create a silently-disabled user
        u_enabled = user.get("enabled")
        u_mcp = user.get("must_change_password")
        self._put_user(
            id=user_id, default_workspace=v["workspace"],
            username=user["username"],
            name=user.get("name") or user["username"],
            email=user.get("email") or "",
            password_hash=hash_password(user["password"],
                                        iterations=self._iterations),
            roles=list(user.get("roles") or []),
            enabled=True if u_enabled is None else u_enabled,
            must_change_password=False if u_mcp is None else u_mcp,
            created=self._now_iso())
        return {"user": _user_record(self.store.users[user_id])}

    def handle_get_user(self, v: dict) -> dict:
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id required")
        row, err = self._resolve_user(v["user_id"], v.get("workspace"))
        if err is not None:
            return err
        return {"user": _user_record(row)}

    def handle_update_user(self, v: dict) -> dict:
        """Profile updates only; username immutable; password changes
        refused toward change-/reset-password.  Absent fields carry
        forward (enabled/must_change_password on None-is-absent
        semantics, per the reference)."""
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id required")
        user = v.get("user")
        if user is None:
            return _err("invalid-argument", "user field required")
        if user.get("password"):
            return _err("invalid-argument",
                        "password cannot be changed via update-user; "
                        "use change-password or reset-password")
        existing, err = self._resolve_user(v["user_id"], v.get("workspace"))
        if err is not None:
            return err
        if user.get("username") and user["username"] != existing["username"]:
            return _err("invalid-argument",
                        "username is immutable; create a new user instead")
        existing["name"] = user.get("name") or existing["name"]
        existing["email"] = user.get("email") or existing["email"]
        existing["roles"] = (list(user["roles"]) if user.get("roles")
                             else list(existing["roles"] or []))
        if user.get("enabled") is not None:
            existing["enabled"] = user["enabled"]
        if user.get("must_change_password") is not None:
            existing["must_change_password"] = user["must_change_password"]
        return {"user": _user_record(existing)}

    def handle_disable_user(self, v: dict) -> dict:
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id required")
        row, err = self._resolve_user(v["user_id"], v.get("workspace"))
        if err is not None:
            return err
        row["enabled"] = False
        self.store.api_keys = {
            h: r for h, r in self.store.api_keys.items()
            if r["user_id"] != v["user_id"]}
        return {}

    def handle_enable_user(self, v: dict) -> dict:
        """Re-enable; keys are NOT restored — re-issue them."""
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id required")
        row, err = self._resolve_user(v["user_id"], v.get("workspace"))
        if err is not None:
            return err
        row["enabled"] = True
        return {}

    def handle_delete_user(self, v: dict) -> dict:
        """Hard delete: user row + username lookup + every owned key —
        frees the username for re-use (GDPR-erasure-style)."""
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id required")
        row, err = self._resolve_user(v["user_id"], v.get("workspace"))
        if err is not None:
            return err
        self.store.api_keys = {
            h: r for h, r in self.store.api_keys.items()
            if r["user_id"] != v["user_id"]}
        if row["username"]:
            self.store.users_by_username.pop(row["username"], None)
        self.store.users.pop(v["user_id"], None)
        return {}

    def handle_list_users(self, v: dict) -> dict:
        """workspace, when supplied, filters on home-workspace
        association; empty returns the deployment-wide list."""
        rows = self.store.users.values()
        if v.get("workspace"):
            rows = [r for r in rows
                    if r["default_workspace"] == v["workspace"]]
        return {"users": [_user_record(r) for r in rows]}

    # -- workspace CRUD (iam.py:894-1030) -----------------------------------

    def _ws_record(self, row: dict) -> dict:
        return {"id": row.get("id") or "", "name": row.get("name") or "",
                "enabled": bool(row.get("enabled")),
                "created": row.get("created") or ""}

    def handle_create_workspace(self, v: dict) -> dict:
        rec = v.get("workspace_record")
        if rec is None or not rec.get("id"):
            return _err("invalid-argument",
                        "workspace_record.id required for create-workspace")
        if rec["id"].startswith("_"):
            return _err("invalid-argument",
                        "workspace ids beginning with '_' are reserved")
        if self._on_ws_created:
            self._on_ws_created(rec["id"])
        if rec["id"] not in self.store.workspaces:
            # absent enabled takes the WorkspaceInput schema default
            # (True, schema/services/iam.py:46)
            w_enabled = rec.get("enabled")
            self.store.workspaces[rec["id"]] = {
                "id": rec["id"], "name": rec.get("name") or rec["id"],
                "enabled": True if w_enabled is None else w_enabled,
                "created": self._now_iso(),
            }
        return {"workspace":
                self._ws_record(self.store.workspaces[rec["id"]])}

    def handle_get_workspace(self, v: dict) -> dict:
        rec = v.get("workspace_record")
        if rec is None or not rec.get("id"):
            return _err("invalid-argument", "workspace_record.id required")
        row = self.store.workspaces.get(rec["id"])
        if row is None:
            return _err("not-found", "workspace not found")
        return {"workspace": self._ws_record(row)}

    def handle_update_workspace(self, v: dict) -> dict:
        rec = v.get("workspace_record")
        if rec is None or not rec.get("id"):
            return _err("invalid-argument", "workspace_record.id required")
        row = self.store.workspaces.get(rec["id"])
        if row is None:
            return _err("not-found", "workspace not found")
        row["name"] = rec.get("name") or row["name"]
        if rec.get("enabled") is not None:
            row["enabled"] = rec["enabled"]
        return {"workspace": self._ws_record(row)}

    def handle_disable_workspace(self, v: dict) -> dict:
        rec = v.get("workspace_record")
        if rec is None or not rec.get("id"):
            return _err("invalid-argument", "workspace_record.id required")
        row = self.store.workspaces.get(rec["id"])
        if row is None:
            return _err("not-found", "workspace not found")
        row["name"] = row["name"] or rec["id"]
        row["enabled"] = False
        affected = [u["id"] for u in self.store.users.values()
                    if u["default_workspace"] == rec["id"]]
        for uid in affected:
            self.store.users[uid]["enabled"] = False
        self.store.api_keys = {
            h: r for h, r in self.store.api_keys.items()
            if r["user_id"] not in set(affected)}
        if self._on_ws_deleted:
            self._on_ws_deleted(rec["id"])
        return {}

    def handle_list_workspaces(self, v: dict) -> dict:
        return {"workspaces": [self._ws_record(r)
                               for r in self.store.workspaces.values()]}

    def handle_list_my_workspaces(self, v: dict) -> dict:
        """Admins see all; everyone else sees their home workspace."""
        if not v.get("actor"):
            return _err("invalid-argument", "actor required")
        row = self.store.users.get(v["actor"])
        if row is None:
            return _err("not-found", "user not found")
        if "admin" in (row["roles"] or []):
            rows = list(self.store.workspaces.values())
        else:
            ws = self.store.workspaces.get(row["default_workspace"])
            rows = [ws] if ws else []
        return {"workspaces": [self._ws_record(r) for r in rows]}

    # -- API keys (iam.py:1185-1301) -----------------------------------------

    def handle_create_api_key(self, v: dict) -> dict:
        key = v.get("key")
        if key is None or not key.get("user_id"):
            return _err("invalid-argument", "key.user_id required")
        if not key.get("name"):
            return _err("invalid-argument", "key.name required")
        _, err = self._resolve_user(key["user_id"], v.get("workspace"))
        if err is not None:
            return err
        plaintext = generate_api_key(self._token)
        expires = key.get("expires") or ""
        expires_epoch = _parse_expires_epoch(expires)
        row = {
            "id": self._uuid(), "user_id": key["user_id"],
            "name": key["name"], "prefix": key_prefix(plaintext),
            "expires": expires if expires_epoch is not None else "",
            "expires_epoch": expires_epoch,
            "created": self._now_iso(), "last_used": "",
        }
        self.store.api_keys[hash_api_key(plaintext)] = row
        return {"api_key_plaintext": plaintext,
                "api_key": _api_key_record(row)}

    def handle_list_api_keys(self, v: dict) -> dict:
        if not v.get("user_id"):
            return _err("invalid-argument",
                        "user_id required for list-api-keys")
        _, err = self._resolve_user(v["user_id"], v.get("workspace"))
        if err is not None:
            return err
        return {"api_keys": [
            _api_key_record(r) for r in self.store.api_keys.values()
            if r["user_id"] == v["user_id"]]}

    def handle_revoke_api_key(self, v: dict) -> dict:
        if not v.get("key_id"):
            return _err("invalid-argument", "key_id required")
        found = None
        for h, r in self.store.api_keys.items():
            if r["id"] == v["key_id"]:
                found = (h, r)
                break
        if found is None:
            return _err("not-found", "api key not found")
        h, r = found
        if v.get("workspace"):
            owner = self.store.users.get(r["user_id"])
            if owner is None or owner["default_workspace"] != v["workspace"]:
                return _err("operation-not-permitted",
                            "key belongs to a different workspace")
        del self.store.api_keys[h]
        return {}

    # -- authorise (iam.py:1304-1402) ------------------------------------------

    def _decide(self, user_row: dict | None, capability: str,
                resource: dict, parameters: dict) -> tuple[bool, int]:
        if user_row is None or not user_row.get("enabled"):
            return False, AUTHZ_CACHE_TTL_SECONDS
        target_workspace = ((resource or {}).get("workspace")
                            or (parameters or {}).get("workspace"))
        for role_name in user_row.get("roles") or []:
            defn = ROLE_DEFINITIONS.get(role_name)
            if defn is None:
                continue
            if capability not in defn["capabilities"]:
                continue
            if target_workspace is None or scope_permits(
                    defn["workspace_scope"], target_workspace,
                    user_row["default_workspace"]):
                return True, AUTHZ_CACHE_TTL_SECONDS
        return False, AUTHZ_CACHE_TTL_SECONDS

    def handle_authorise(self, v: dict) -> dict:
        if not v.get("capability"):
            return _err("invalid-argument", "capability required")
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id (handle) required")
        try:
            resource = json.loads(v.get("resource_json") or "{}")
            parameters = json.loads(v.get("parameters_json") or "{}")
        except json.JSONDecodeError as e:
            return _err("invalid-argument", f"bad json: {e}")
        allow, ttl = self._decide(self.store.users.get(v["user_id"]),
                                  v["capability"], resource, parameters)
        return {"decision_allow": allow, "decision_ttl_seconds": ttl}

    def handle_authorise_many(self, v: dict) -> dict:
        if not v.get("user_id"):
            return _err("invalid-argument", "user_id (handle) required")
        if not v.get("authorise_checks"):
            return _err("invalid-argument", "authorise_checks required")
        try:
            checks = json.loads(v["authorise_checks"])
        except json.JSONDecodeError as e:
            return _err("invalid-argument", f"bad json: {e}")
        if not isinstance(checks, list):
            return _err("invalid-argument",
                        "authorise_checks must be a JSON list")
        user_row = self.store.users.get(v["user_id"])
        decisions = []
        for c in checks:
            if not isinstance(c, dict):
                decisions.append({"allow": False,
                                  "ttl": AUTHZ_CACHE_TTL_SECONDS})
                continue
            allow, ttl = self._decide(
                user_row, c.get("capability", ""),
                c.get("resource") or {}, c.get("parameters") or {})
            decisions.append({"allow": allow, "ttl": ttl})
        return {"decisions_json": json.dumps(decisions)}


def _parse_expires_epoch(s: str) -> int | None:
    """iam.py:204-210 _parse_expires: empty / unparsable -> never."""
    if not s:
        return None
    import datetime
    try:
        dt = datetime.datetime.fromisoformat(s)
    except Exception:
        return None
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=__import__("datetime").timezone.utc)
    return int(dt.timestamp())


class NoAuthHandler:
    """iam/noauth/handler.py:20-140 — the permissive no-database
    regime: every identity resolves to the configured anonymous admin,
    every authorisation allows with a long TTL, management ops return
    stub records."""

    def __init__(self, default_user_id: str = "anonymous",
                 default_workspace: str = "default",
                 on_workspace_created: Callable[[str], None] | None = None):
        self.default_user_id = default_user_id
        self.default_workspace = default_workspace
        self._on_ws_created = on_workspace_created

    def _identity(self) -> dict:
        return {"resolved_user_id": self.default_user_id,
                "resolved_default_workspace": self.default_workspace,
                "resolved_roles": ["admin"]}

    def _user(self) -> dict:
        return {"id": self.default_user_id,
                "default_workspace": self.default_workspace,
                "username": self.default_user_id,
                "name": "Anonymous User",
                "roles": ["admin"], "enabled": True}

    def handle(self, v: dict) -> dict:
        op = v.get("operation", "")
        try:
            if op in ("authenticate-anonymous", "resolve-api-key"):
                return self._identity()
            if op == "authorise":
                return {"decision_allow": True,
                        "decision_ttl_seconds": 3600}
            if op == "authorise-many":
                checks = json.loads(v.get("authorise_checks") or "[]")
                return {"decisions_json": json.dumps(
                    [{"allow": True, "ttl": 3600} for _ in checks])}
            if op == "get-signing-key-public":
                return {"signing_key_public": ""}
            if op == "bootstrap":
                return {}
            if op == "bootstrap-status":
                return {"bootstrap_available": False}
            if op == "whoami":
                return {"user": self._user()}
            if op == "login":
                return {}
            if op in ("create-user", "get-user", "update-user",
                      "disable-user", "enable-user"):
                return {"user": self._user()}
            if op == "list-users":
                return {"users": [self._user()]}
            if op == "delete-user":
                return {}
            if op == "create-workspace":
                rec = v.get("workspace_record")
                if self._on_ws_created and rec:
                    self._on_ws_created(rec["id"])
                return {}
            if op in ("get-workspace", "update-workspace",
                      "disable-workspace", "list-workspaces",
                      "list-my-workspaces", "create-api-key",
                      "list-api-keys", "revoke-api-key",
                      "change-password", "reset-password",
                      "rotate-signing-key"):
                return {}
            return _err("invalid-argument", f"unknown operation: {op!r}")
        except Exception as e:
            return _err("internal-error", str(e))
