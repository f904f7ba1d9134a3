"""IAM regime tests — reference parity for iam/service/iam.py (role
vocabulary, credential envelopes, JWT issuance, every handler's
validation and cascade arms), the audit shaping from
iam/service/service.py, the no-auth handler, and the two batch
data-plane operators (authorise_batch / resolve_api_keys_batch)
verified against the per-request evaluator over randomized matrices."""

import base64
import hashlib
import itertools
import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.iam import (
    ADMIN_CAPS,
    API_KEY_PREFIX,
    AUTHZ_CACHE_TTL_SECONDS,
    JWT_ISSUER,
    JWT_TTL_SECONDS,
    READER_CAPS,
    ROLE_DEFINITIONS,
    WRITER_CAPS,
    IamService,
    NoAuthHandler,
    authorise_batch,
    generate_api_key,
    generate_signing_keypair,
    hash_api_key,
    hash_password,
    key_prefix,
    resolve_api_keys_batch,
    role_capability_rows,
    scope_permits,
    sign_jwt,
    verify_jwt,
    verify_password,
)

# Low PBKDF2 cost for tests — the envelope records the cost per row, so
# verification is self-describing at any iteration count.
ITERS = 10


def _svc(mode="bootstrap", token=None, t0=1_700_000_000):
    """Deterministic service: fixed clock, counter-based tokens/uuids."""
    counter = itertools.count(1)
    return IamService(
        mode, token,
        now_fn=lambda: t0,
        token_fn=lambda n: f"token{next(counter):03d}x" + "a" * n,
        uuid_fn=lambda: f"uuid-{next(counter):03d}",
        iterations=ITERS,
    )


def _seeded():
    """bootstrap-mode service, seeded, with the default workspace
    created (the reference leaves workspace creation to the
    bootstrapper's WorkspaceInit initialiser)."""
    svc = _svc()
    boot = svc.handle({"operation": "bootstrap"})
    svc.handle({"operation": "create-workspace",
                "workspace_record": {"id": "default", "enabled": True}})
    return svc, boot


# ---------------------------------------------------------------------------
# Vocabulary + primitives
# ---------------------------------------------------------------------------


def test_role_vocabulary_nesting():
    assert READER_CAPS < WRITER_CAPS < ADMIN_CAPS
    assert len(READER_CAPS) == 24
    assert len(WRITER_CAPS) == 33
    assert len(ADMIN_CAPS) == 42
    assert ROLE_DEFINITIONS["admin"]["workspace_scope"] == "*"
    assert ROLE_DEFINITIONS["reader"]["workspace_scope"] == "assigned"
    rows = role_capability_rows()
    assert len(rows) == 24 + 33 + 42
    assert ("writer", "rows:write", "assigned") in rows
    assert ("reader", "rows:write", "assigned") not in rows


def test_scope_permits_matrix():
    assert scope_permits("*", "anything", "home")
    assert scope_permits("assigned", "home", "home")
    assert not scope_permits("assigned", "other", "home")
    assert not scope_permits("bogus", "home", "home")


def test_password_envelope_roundtrip_and_malformed_arms():
    enc = hash_password("s3cret", iterations=ITERS)
    algo, iters, b64s, b64h = enc.split("$")
    assert algo == "pbkdf2-sha256" and int(iters) == ITERS
    assert verify_password("s3cret", enc)
    assert not verify_password("wrong", enc)
    # envelope arms all fail closed
    assert not verify_password("s3cret", "")
    assert not verify_password("s3cret", "no-dollars")
    assert not verify_password("s3cret", f"md5${iters}${b64s}${b64h}")
    assert not verify_password("s3cret", f"pbkdf2-sha256$x${b64s}${b64h}")
    assert not verify_password("s3cret", "pbkdf2-sha256$10$!!$??")


def test_password_envelope_deterministic_with_injected_salt():
    salt = b"\x00" * 16
    enc = hash_password("pw", salt=salt, iterations=ITERS)
    dk = hashlib.pbkdf2_hmac("sha256", b"pw", salt, ITERS)
    assert enc == (f"pbkdf2-sha256${ITERS}"
                   f"${base64.b64encode(salt).decode()}"
                   f"${base64.b64encode(dk).decode()}")


def test_api_key_shape():
    k = generate_api_key(lambda n: "X" * n)
    assert k == "tg_" + "X" * 24
    assert key_prefix(k) == "tg_XXXX"
    assert hash_api_key(k) == hashlib.sha256(k.encode()).hexdigest()
    assert len(API_KEY_PREFIX) == 3


def test_jwt_sign_verify_roundtrip():
    kid, priv, pub = generate_signing_keypair()
    claims = {"iss": JWT_ISSUER, "sub": "u1", "iat": 1, "exp": 2}
    tok = sign_jwt(kid, priv, claims)
    header_b = tok.split(".")[0]
    header = json.loads(base64.urlsafe_b64decode(
        header_b + "=" * (-len(header_b) % 4)))
    assert header == {"alg": "EdDSA", "kid": kid, "typ": "JWT"}
    assert verify_jwt(tok, pub) == claims
    # tamper -> reject
    bad = tok[:-2] + ("AA" if not tok.endswith("AA") else "BB")
    with pytest.raises(ValueError):
        verify_jwt(bad, pub)
    # wrong key -> reject
    _, _, other_pub = generate_signing_keypair()
    with pytest.raises(ValueError):
        verify_jwt(tok, other_pub)


# ---------------------------------------------------------------------------
# Bootstrap modes
# ---------------------------------------------------------------------------


def test_token_mode_auto_seeds_and_masks_bootstrap():
    svc = _svc(mode="token", token="tg_operator-token")
    # seeded: admin user + the token as its API key + a signing key
    assert len(svc.store.users) == 1
    admin = next(iter(svc.store.users.values()))
    assert admin["username"] == "admin" and admin["roles"] == ["admin"]
    assert admin["must_change_password"] is True
    assert hash_api_key("tg_operator-token") in svc.store.api_keys
    # explicit bootstrap op refused with the masked generic failure
    r = svc.handle({"operation": "bootstrap"})
    assert r["error"]["type"] == "auth-failed"
    assert r["error"]["message"] == "auth failure"
    assert svc.handle({"operation": "bootstrap-status"}) == {
        "bootstrap_available": False}


def test_token_mode_requires_token():
    with pytest.raises(ValueError):
        IamService("token")
    with pytest.raises(ValueError):
        IamService("other-mode")


def test_bootstrap_mode_lifecycle():
    svc = _svc()
    assert svc.handle({"operation": "bootstrap-status"}) == {
        "bootstrap_available": True}
    r = svc.handle({"operation": "bootstrap"})
    assert r["bootstrap_admin_api_key"].startswith("tg_")
    assert r["bootstrap_admin_user_id"] in svc.store.users
    # second bootstrap masked, indistinguishable from wrong-mode
    r2 = svc.handle({"operation": "bootstrap"})
    assert r2["error"]["message"] == "auth failure"
    assert svc.handle({"operation": "bootstrap-status"}) == {
        "bootstrap_available": False}


def test_resolve_bootstrap_key_requires_workspace_then_succeeds():
    # the seed does NOT create the workspace (the bootstrapper's
    # WorkspaceInit does) — resolution fails closed until it exists
    svc = _svc()
    boot = svc.handle({"operation": "bootstrap"})
    key = boot["bootstrap_admin_api_key"]
    r = svc.handle({"operation": "resolve-api-key", "api_key": key})
    assert r["error"]["message"] == "owning workspace disabled"
    svc.handle({"operation": "create-workspace",
                "workspace_record": {"id": "default", "enabled": True}})
    r = svc.handle({"operation": "resolve-api-key", "api_key": key})
    assert r == {"resolved_user_id": boot["bootstrap_admin_user_id"],
                 "resolved_default_workspace": "default",
                 "resolved_roles": ["admin"]}


# ---------------------------------------------------------------------------
# Login + JWT issuance
# ---------------------------------------------------------------------------


def _mk_user(svc, username="alice", roles=("reader",), workspace="default",
             password="pw1", enabled=True):
    r = svc.handle({"operation": "create-user", "workspace": workspace,
                    "user": {"username": username, "password": password,
                             "roles": list(roles), "enabled": enabled}})
    assert "error" not in r, r
    return r["user"]["id"]


def test_login_arms_and_jwt_contract():
    svc, _ = _seeded()
    uid = _mk_user(svc)
    assert svc.handle({"operation": "login"})["error"]["message"] == \
        "username required"
    assert svc.handle({"operation": "login", "username": "alice"})[
        "error"]["message"] == "password required"
    assert svc.handle({"operation": "login", "username": "ghost",
                       "password": "x"})["error"]["message"] == "no such user"
    assert svc.handle({"operation": "login", "username": "alice",
                       "password": "bad"})["error"]["message"] == \
        "bad credentials"
    r = svc.handle({"operation": "login", "username": "alice",
                    "password": "pw1"})
    pub = svc.handle({"operation": "get-signing-key-public"})[
        "signing_key_public"]
    claims = verify_jwt(r["jwt"], pub)
    assert claims == {"iss": JWT_ISSUER, "sub": uid,
                      "default_workspace": "default",
                      "iat": 1_700_000_000,
                      "exp": 1_700_000_000 + JWT_TTL_SECONDS}
    assert r["jwt_expires"].startswith("2023-11-14T")
    # workspace override in the login request lands in the JWT
    svc.handle({"operation": "create-workspace",
                "workspace_record": {"id": "ws2", "enabled": True}})
    r2 = svc.handle({"operation": "login", "username": "alice",
                     "password": "pw1", "workspace": "ws2"})
    assert verify_jwt(r2["jwt"], pub)["default_workspace"] == "ws2"
    # disabled target workspace fails closed
    svc.handle({"operation": "update-workspace",
                "workspace_record": {"id": "ws2", "enabled": False}})
    r3 = svc.handle({"operation": "login", "username": "alice",
                     "password": "pw1", "workspace": "ws2"})
    assert r3["error"]["message"] == "workspace disabled"
    # disabled user fails closed
    svc.handle({"operation": "disable-user", "user_id": uid})
    assert svc.handle({"operation": "login", "username": "alice",
                       "password": "pw1"})["error"]["message"] == \
        "user disabled"


def test_rotate_signing_key_keeps_old_tokens_verifiable():
    svc, _ = _seeded()
    _mk_user(svc)
    old_pub = svc.handle({"operation": "get-signing-key-public"})[
        "signing_key_public"]
    old_tok = svc.handle({"operation": "login", "username": "alice",
                          "password": "pw1"})["jwt"]
    svc.handle({"operation": "rotate-signing-key"})
    new_pub = svc.handle({"operation": "get-signing-key-public"})[
        "signing_key_public"]
    assert new_pub != old_pub
    # the retired key row is kept for the validator's grace window
    retired = [r for r in svc.store.signing_keys.values()
               if r["retired"] is not None]
    assert len(retired) == 1 and retired[0]["public_pem"] == old_pub
    assert verify_jwt(old_tok, old_pub)["sub"]
    new_tok = svc.handle({"operation": "login", "username": "alice",
                          "password": "pw1"})["jwt"]
    assert verify_jwt(new_tok, new_pub)
    with pytest.raises(ValueError):
        verify_jwt(new_tok, old_pub)


# ---------------------------------------------------------------------------
# Password ops
# ---------------------------------------------------------------------------


def test_change_password_arms():
    svc, _ = _seeded()
    uid = _mk_user(svc)
    base = {"operation": "change-password", "user_id": uid}
    assert svc.handle({"operation": "change-password"})[
        "error"]["type"] == "invalid-argument"
    assert svc.handle({**base, "password": "pw1"})[
        "error"]["message"] == "new_password required"
    assert svc.handle({**base, "password": "bad", "new_password": "n"})[
        "error"]["message"] == "bad credentials"
    assert svc.handle({**base, "password": "pw1", "new_password": "pw2"}) \
        == {}
    assert svc.store.users[uid]["must_change_password"] is False
    assert svc.handle({"operation": "login", "username": "alice",
                       "password": "pw1"})["error"]["message"] == \
        "bad credentials"
    assert "jwt" in svc.handle({"operation": "login", "username": "alice",
                                "password": "pw2"})


def test_reset_password_sets_temporary_and_flag():
    svc, _ = _seeded()
    uid = _mk_user(svc)
    r = svc.handle({"operation": "reset-password", "user_id": uid})
    assert "jwt" in svc.handle({"operation": "login", "username": "alice",
                                "password": r["temporary_password"]})
    assert svc.store.users[uid]["must_change_password"] is True
    # optional workspace integrity check
    r2 = svc.handle({"operation": "reset-password", "user_id": uid,
                     "workspace": "other"})
    assert r2["error"]["type"] == "operation-not-permitted"


# ---------------------------------------------------------------------------
# User CRUD
# ---------------------------------------------------------------------------


def test_create_user_validation_arms():
    svc, _ = _seeded()
    u = {"username": "bob", "password": "p"}
    assert svc.handle({"operation": "create-user", "user": u})[
        "error"]["message"] == "workspace required for create-user"
    assert svc.handle({"operation": "create-user", "workspace": "default"})[
        "error"]["message"] == "user field required for create-user"
    assert svc.handle({"operation": "create-user", "workspace": "default",
                       "user": {"password": "p"}})[
        "error"]["message"] == "user.username required"
    assert svc.handle({"operation": "create-user", "workspace": "default",
                       "user": {"username": "bob"}})[
        "error"]["message"] == "user.password required"
    assert svc.handle({"operation": "create-user", "workspace": "nope",
                       "user": u})["error"]["type"] == "not-found"
    _mk_user(svc, username="bob")
    assert svc.handle({"operation": "create-user", "workspace": "default",
                       "user": u})["error"]["type"] == "duplicate"
    # name defaults to username, email to ""; absent enabled /
    # must_change_password take the UserInput schema defaults
    # (True / False) — carol must be able to log in immediately
    r = svc.handle({"operation": "create-user", "workspace": "default",
                    "user": {"username": "carol", "password": "p"}})
    assert r["user"]["name"] == "carol" and r["user"]["email"] == ""
    assert r["user"]["roles"] == []
    assert r["user"]["enabled"] is True
    assert r["user"]["must_change_password"] is False
    assert "jwt" in svc.handle({"operation": "login", "username": "carol",
                                "password": "p"})


def test_update_user_semantics():
    svc, _ = _seeded()
    uid = _mk_user(svc, roles=("reader", "writer"))
    # password refused toward the dedicated ops
    assert "change-password" in svc.handle(
        {"operation": "update-user", "user_id": uid,
         "user": {"password": "x"}})["error"]["message"]
    # username immutable
    assert "immutable" in svc.handle(
        {"operation": "update-user", "user_id": uid,
         "user": {"username": "renamed"}})["error"]["message"]
    # carry-forward: absent fields keep current values; enabled=False
    # is an explicit set (None-is-absent semantics)
    r = svc.handle({"operation": "update-user", "user_id": uid,
                    "user": {"email": "a@b.c"}})
    assert r["user"]["name"] == "alice"
    assert r["user"]["roles"] == ["reader", "writer"]
    assert r["user"]["enabled"] is True
    r = svc.handle({"operation": "update-user", "user_id": uid,
                    "user": {"enabled": False}})
    assert r["user"]["enabled"] is False and r["user"]["email"] == "a@b.c"


def test_disable_enable_delete_user_cascades():
    svc, _ = _seeded()
    uid = _mk_user(svc)
    svc.handle({"operation": "create-api-key",
                "key": {"user_id": uid, "name": "k1"}})
    assert any(r["user_id"] == uid for r in svc.store.api_keys.values())
    svc.handle({"operation": "disable-user", "user_id": uid})
    assert not any(r["user_id"] == uid for r in svc.store.api_keys.values())
    assert svc.store.users[uid]["enabled"] is False
    # enable does NOT restore keys
    svc.handle({"operation": "enable-user", "user_id": uid})
    assert svc.store.users[uid]["enabled"] is True
    assert svc.handle({"operation": "list-api-keys", "user_id": uid})[
        "api_keys"] == []
    # delete frees the username
    svc.handle({"operation": "delete-user", "user_id": uid})
    assert uid not in svc.store.users
    assert _mk_user(svc) != uid  # same username re-creatable


def test_list_users_workspace_filter():
    svc, _ = _seeded()
    svc.handle({"operation": "create-workspace",
                "workspace_record": {"id": "ws2", "enabled": True}})
    _mk_user(svc, username="a1")
    _mk_user(svc, username="a2", workspace="ws2")
    all_users = svc.handle({"operation": "list-users"})["users"]
    assert {u["username"] for u in all_users} == {"admin", "a1", "a2"}
    ws2 = svc.handle({"operation": "list-users", "workspace": "ws2"})[
        "users"]
    assert [u["username"] for u in ws2] == ["a2"]


# ---------------------------------------------------------------------------
# Workspace CRUD
# ---------------------------------------------------------------------------


def test_workspace_arms_and_disable_cascade():
    svc, _ = _seeded()
    assert "reserved" in svc.handle(
        {"operation": "create-workspace",
         "workspace_record": {"id": "_system"}})["error"]["message"]
    # create is first-writer-wins: re-create returns the existing row
    svc.handle({"operation": "create-workspace",
                "workspace_record": {"id": "ws2", "name": "Two",
                                     "enabled": True}})
    r = svc.handle({"operation": "create-workspace",
                    "workspace_record": {"id": "ws2", "name": "Other",
                                         "enabled": True}})
    assert r["workspace"]["name"] == "Two"
    # name defaults to id; absent enabled takes the WorkspaceInput
    # schema default (True) — not a silently-disabled workspace
    r = svc.handle({"operation": "create-workspace",
                    "workspace_record": {"id": "ws3"}})
    assert r["workspace"]["name"] == "ws3"
    assert r["workspace"]["enabled"] is True
    # disable cascade: users homed there disabled, their keys revoked
    uid = _mk_user(svc, username="w2user", workspace="ws2")
    svc.handle({"operation": "create-api-key",
                "key": {"user_id": uid, "name": "k"}})
    svc.handle({"operation": "disable-workspace",
                "workspace_record": {"id": "ws2"}})
    assert svc.store.workspaces["ws2"]["enabled"] is False
    assert svc.store.users[uid]["enabled"] is False
    assert not any(r["user_id"] == uid for r in svc.store.api_keys.values())
    # not-found arm
    assert svc.handle({"operation": "disable-workspace",
                       "workspace_record": {"id": "nope"}})[
        "error"]["type"] == "not-found"


def test_list_my_workspaces_admin_vs_regular():
    svc, boot = _seeded()
    svc.handle({"operation": "create-workspace",
                "workspace_record": {"id": "ws2", "enabled": True}})
    admin_id = boot["bootstrap_admin_user_id"]
    uid = _mk_user(svc)
    mine = svc.handle({"operation": "list-my-workspaces", "actor": uid})
    assert [w["id"] for w in mine["workspaces"]] == ["default"]
    theirs = svc.handle({"operation": "list-my-workspaces",
                         "actor": admin_id})
    assert {w["id"] for w in theirs["workspaces"]} == {"default", "ws2"}


# ---------------------------------------------------------------------------
# API keys
# ---------------------------------------------------------------------------


def test_api_key_lifecycle_and_resolution_arms():
    svc, _ = _seeded()
    uid = _mk_user(svc)
    assert svc.handle({"operation": "create-api-key", "key": {}})[
        "error"]["message"] == "key.user_id required"
    assert svc.handle({"operation": "create-api-key",
                       "key": {"user_id": uid}})[
        "error"]["message"] == "key.name required"
    r = svc.handle({"operation": "create-api-key",
                    "key": {"user_id": uid, "name": "k1"}})
    plain = r["api_key_plaintext"]
    assert plain.startswith("tg_")
    assert r["api_key"]["prefix"] == plain[:7]
    # resolve success
    got = svc.handle({"operation": "resolve-api-key", "api_key": plain})
    assert got["resolved_user_id"] == uid
    assert got["resolved_roles"] == ["reader"]
    # unknown / missing arms
    assert svc.handle({"operation": "resolve-api-key"})[
        "error"]["message"] == "no api key"
    assert svc.handle({"operation": "resolve-api-key",
                       "api_key": "tg_nope"})[
        "error"]["message"] == "unknown api key"
    # expired arm (now_fn = 1.7e9; expiry in the past)
    r2 = svc.handle({"operation": "create-api-key",
                     "key": {"user_id": uid, "name": "old",
                             "expires": "2020-01-01T00:00:00+00:00"}})
    assert svc.handle({"operation": "resolve-api-key",
                       "api_key": r2["api_key_plaintext"]})[
        "error"]["message"] == "api key expired"
    # unparsable expiry string -> never expires (reference behavior)
    r3 = svc.handle({"operation": "create-api-key",
                     "key": {"user_id": uid, "name": "weird",
                             "expires": "not-a-date"}})
    assert "resolved_user_id" in svc.handle(
        {"operation": "resolve-api-key",
         "api_key": r3["api_key_plaintext"]})
    # revoke arms
    assert svc.handle({"operation": "revoke-api-key"})[
        "error"]["type"] == "invalid-argument"
    assert svc.handle({"operation": "revoke-api-key", "key_id": "nope"})[
        "error"]["type"] == "not-found"
    assert svc.handle({"operation": "revoke-api-key",
                       "key_id": r["api_key"]["id"],
                       "workspace": "other"})[
        "error"]["type"] == "operation-not-permitted"
    assert svc.handle({"operation": "revoke-api-key",
                       "key_id": r["api_key"]["id"],
                       "workspace": "default"}) == {}
    assert svc.handle({"operation": "resolve-api-key", "api_key": plain})[
        "error"]["message"] == "unknown api key"


# ---------------------------------------------------------------------------
# Authorise
# ---------------------------------------------------------------------------


def test_authorise_arms():
    svc, _ = _seeded()
    uid = _mk_user(svc, roles=("reader",))
    wid = _mk_user(svc, username="wendy", roles=("writer",))
    aid = _mk_user(svc, username="ann", roles=("admin",))

    def ask(user, cap, resource=None):
        return svc.handle({
            "operation": "authorise", "user_id": user, "capability": cap,
            "resource_json": json.dumps(resource) if resource else "",
        })

    ok = {"decision_allow": True,
          "decision_ttl_seconds": AUTHZ_CACHE_TTL_SECONDS}
    deny = {"decision_allow": False,
            "decision_ttl_seconds": AUTHZ_CACHE_TTL_SECONDS}
    assert ask(uid, "triples:read") == ok
    assert ask(uid, "rows:write") == deny                 # reader can't write
    assert ask(wid, "rows:write") == ok
    assert ask(wid, "users:admin") == deny
    assert ask(aid, "users:admin") == ok
    # workspace scoping: assigned-scope roles bound to home workspace
    assert ask(uid, "triples:read", {"workspace": "default"}) == ok
    assert ask(uid, "triples:read", {"workspace": "other"}) == deny
    assert ask(aid, "triples:read", {"workspace": "other"}) == ok
    # parameters fallback for the target workspace
    assert svc.handle({"operation": "authorise", "user_id": uid,
                       "capability": "triples:read",
                       "parameters_json": '{"workspace": "other"}'}) == deny
    # '' workspace is falsy -> treated as no-target (system-level), so
    # an assigned-scope role still allows; the batch face must agree
    assert ask(uid, "triples:read", {"workspace": ""}) == ok
    # unknown user / disabled user / unknown capability all deny
    assert ask("ghost", "triples:read") == deny
    svc.handle({"operation": "disable-user", "user_id": uid})
    assert ask(uid, "triples:read") == deny
    assert ask(aid, "no-such-capability") == deny
    # validation arms
    assert svc.handle({"operation": "authorise", "user_id": uid})[
        "error"]["message"] == "capability required"
    assert svc.handle({"operation": "authorise", "capability": "x"})[
        "error"]["message"] == "user_id (handle) required"
    assert svc.handle({"operation": "authorise", "user_id": uid,
                       "capability": "x", "resource_json": "{bad"})[
        "error"]["type"] == "invalid-argument"


def test_authorise_many():
    svc, _ = _seeded()
    uid = _mk_user(svc, roles=("writer",))
    checks = [
        {"capability": "rows:write"},
        {"capability": "users:admin"},
        "not-a-dict",
        {"capability": "triples:read",
         "resource": {"workspace": "other"}},
    ]
    r = svc.handle({"operation": "authorise-many", "user_id": uid,
                    "authorise_checks": json.dumps(checks)})
    assert [d["allow"] for d in json.loads(r["decisions_json"])] == \
        [True, False, False, False]
    assert svc.handle({"operation": "authorise-many", "user_id": uid,
                       "authorise_checks": '"a string"'})[
        "error"]["message"] == "authorise_checks must be a JSON list"
    assert svc.handle({"operation": "authorise-many", "user_id": uid,
                       "authorise_checks": "{bad"})[
        "error"]["type"] == "invalid-argument"


def test_unknown_operation_and_whoami():
    svc, boot = _seeded()
    assert "unknown operation" in svc.handle({"operation": "frobnicate"})[
        "error"]["message"]
    admin = boot["bootstrap_admin_user_id"]
    assert svc.handle({"operation": "whoami", "actor": admin})[
        "user"]["username"] == "admin"
    assert svc.handle({"operation": "whoami"})[
        "error"]["type"] == "invalid-argument"


# ---------------------------------------------------------------------------
# Audit shaping (service.py:274-405)
# ---------------------------------------------------------------------------


def test_audit_event_categories_and_payloads():
    svc, _ = _seeded()
    svc.audit_events.clear()
    uid = _mk_user(svc)
    kinds = [k for k, _ in svc.audit_events]
    assert kinds == ["iam.management"]
    mgmt = svc.audit_events[0][1]
    assert mgmt["operation"] == "create-user"
    assert mgmt["outcome"] == "success"
    assert mgmt["target_workspace"] == "default"

    svc.audit_events.clear()
    svc.handle({"operation": "resolve-api-key", "api_key": "tg_bad",
                "request_id": "r1", "client_ip": "1.2.3.4"})
    kind, p = svc.audit_events[-1]
    assert kind == "iam.authenticate"
    assert p == {"request_id": "r1", "credential_type": "api-key",
                 "identity": "unknown", "outcome": "failure",
                 "client_ip": "1.2.3.4",
                 "failure_reason": "auth-failed"}

    r = svc.handle({"operation": "create-api-key",
                    "key": {"user_id": uid, "name": "k"}})
    svc.audit_events.clear()
    svc.handle({"operation": "resolve-api-key",
                "api_key": r["api_key_plaintext"]})
    kind, p = svc.audit_events[-1]
    assert p["outcome"] == "success" and p["identity"] == uid
    assert "failure_reason" not in p

    svc.audit_events.clear()
    svc.handle({"operation": "authorise", "user_id": uid,
                "capability": "triples:read",
                "resource_json": '{"workspace": "default"}'})
    kind, p = svc.audit_events[-1]
    assert kind == "iam.authorise"
    assert p["outcome"] == "allow" and p["workspace"] == "default"
    assert "denial_reason" not in p
    svc.audit_events.clear()
    svc.handle({"operation": "authorise", "user_id": uid,
                "capability": "users:admin"})
    assert svc.audit_events[-1][1]["denial_reason"] == \
        "capability-not-in-role"
    # login is an authenticate op; success carries identity='' (the
    # schema default — login responses set only the jwt fields)
    svc.audit_events.clear()
    svc.handle({"operation": "login", "username": "alice",
                "password": "pw1"})
    assert svc.audit_events[-1][0] == "iam.authenticate"
    assert svc.audit_events[-1][1]["credential_type"] == "login-password"
    assert svc.audit_events[-1][1]["identity"] == ""
    # non-audited op emits nothing
    svc.audit_events.clear()
    svc.handle({"operation": "list-users"})
    assert svc.audit_events == []


# ---------------------------------------------------------------------------
# No-auth handler
# ---------------------------------------------------------------------------


def test_noauth_handler_permissive():
    h = NoAuthHandler()
    assert h.handle({"operation": "resolve-api-key"}) == {
        "resolved_user_id": "anonymous",
        "resolved_default_workspace": "default",
        "resolved_roles": ["admin"]}
    assert h.handle({"operation": "authorise"}) == {
        "decision_allow": True, "decision_ttl_seconds": 3600}
    many = h.handle({"operation": "authorise-many",
                     "authorise_checks": json.dumps([{}, {}, {}])})
    assert json.loads(many["decisions_json"]) == [
        {"allow": True, "ttl": 3600}] * 3
    assert h.handle({"operation": "whoami"})["user"]["roles"] == ["admin"]
    assert h.handle({"operation": "bootstrap-status"}) == {
        "bootstrap_available": False}
    assert "unknown operation" in h.handle({"operation": "zap"})[
        "error"]["message"]
    created = []
    h2 = NoAuthHandler(on_workspace_created=created.append)
    h2.handle({"operation": "create-workspace",
               "workspace_record": {"id": "w"}})
    assert created == ["w"]


# ---------------------------------------------------------------------------
# Batch data plane vs the per-request evaluator
# ---------------------------------------------------------------------------


def _matrix_service():
    """Service populated with a matrix of identities covering every
    decision arm; returns (svc, user_ids)."""
    svc, _ = _seeded()
    svc.handle({"operation": "create-workspace",
                "workspace_record": {"id": "ws2", "enabled": True}})
    ids = {}
    ids["reader"] = _mk_user(svc, username="r1", roles=("reader",))
    ids["writer"] = _mk_user(svc, username="w1", roles=("writer",),
                             workspace="ws2")
    ids["admin"] = _mk_user(svc, username="a1", roles=("admin",))
    ids["ghost_role"] = _mk_user(svc, username="g1", roles=("ghost",))
    ids["no_roles"] = _mk_user(svc, username="n1", roles=())
    ids["multi"] = _mk_user(svc, username="m1", roles=("ghost", "reader"))
    ids["disabled"] = _mk_user(svc, username="d1", roles=("admin",),
                               enabled=False)
    return svc, ids


def test_authorise_batch_matches_per_request_evaluator(spark):
    svc, ids = _matrix_service()
    users_df, _, _ = svc.store.to_frames(spark)
    caps = ["triples:read", "rows:write", "users:admin", "no-such-cap"]
    # '' exercises the falsy-target agreement between the two faces
    targets = [None, "", "default", "ws2", "elsewhere"]
    checks, expected = [], {}
    i = 0
    for uid in list(ids.values()) + ["missing-user"]:
        for cap in caps:
            for tw in targets:
                checks.append((i, uid, cap, tw))
                resource = {"workspace": tw} if tw else {}
                allow, _ = svc._decide(svc.store.users.get(uid), cap,
                                       resource, {})
                expected[i] = allow
                i += 1
    checks_df = spark.createDataFrame(
        checks, "check_id long, user_id string, capability string, "
                "target_workspace string")
    got = {r.check_id: r.allow
           for r in authorise_batch(spark, checks_df, users_df).collect()}
    assert got == expected
    assert i == len(got) == 8 * 4 * 5


def test_resolve_api_keys_batch_matches_per_request(spark):
    svc, ids = _matrix_service()
    now = 1_700_000_000
    plains = {}
    for name in ("reader", "disabled", "writer"):
        r = svc.handle({"operation": "create-api-key",
                        "key": {"user_id": ids[name], "name": name}})
        plains[name] = r["api_key_plaintext"]
    r = svc.handle({"operation": "create-api-key",
                    "key": {"user_id": ids["admin"], "name": "expired",
                            "expires": "2020-01-01T00:00:00+00:00"}})
    plains["expired"] = r["api_key_plaintext"]
    # orphan key: owner hard-deleted afterwards
    r = svc.handle({"operation": "create-api-key",
                    "key": {"user_id": ids["no_roles"], "name": "orphan"}})
    plains["orphan"] = r["api_key_plaintext"]
    svc.store.users.pop(ids["no_roles"])
    # writer's home workspace disabled AFTER key issue: resolution has
    # to fail closed (bypass the service cascade to isolate this arm)
    svc.store.workspaces["ws2"]["enabled"] = False

    requests = [(0, plains["reader"]), (1, plains["disabled"]),
                (2, plains["expired"]), (3, plains["orphan"]),
                (4, plains["writer"]), (5, "tg_unknown"), (6, None),
                (7, "")]
    users_df, keys_df, ws_df = svc.store.to_frames(spark)
    req_df = spark.createDataFrame(requests,
                                   "req_id long, api_key string")
    got = {r.req_id: r.asDict() for r in resolve_api_keys_batch(
        req_df, keys_df, users_df, ws_df, now).collect()}
    # success row carries the full resolved identity
    assert got[0] == {"req_id": 0, "error": "", "user_id": ids["reader"],
                      "default_workspace": "default",
                      "roles_csv": "reader"}
    assert got[1]["error"] == "owning user disabled"
    assert got[2]["error"] == "api key expired"
    assert got[3]["error"] == "owning user missing"
    assert got[4]["error"] == "owning workspace disabled"
    assert got[5]["error"] == "unknown api key"
    assert got[6]["error"] == "no api key"
    assert got[7]["error"] == "no api key"
    # the batch errors agree with the per-request handler everywhere
    for rid, plain in enumerate([plains["reader"], plains["disabled"],
                                 plains["expired"], plains["orphan"],
                                 plains["writer"], "tg_unknown"]):
        single = svc.handle({"operation": "resolve-api-key",
                             "api_key": plain})
        if "error" in single:
            assert single["error"]["message"] == got[rid]["error"]
        else:
            assert got[rid]["error"] == ""


def test_cascade_frames_null_safe(spark):
    from trustgraph_spark.operators.iam import (
        disable_user_cascade,
        disable_workspace_cascade,
    )
    from trustgraph_spark.operators.iam import (
        API_KEYS_SCHEMA,
        USERS_SCHEMA,
        WORKSPACES_SCHEMA,
    )

    users = spark.createDataFrame(
        [("u1", "ws1", "a", "a", "", "", ["reader"], True, False, ""),
         ("u2", "ws2", "b", "b", "", "", ["reader"], True, False, "")],
        USERS_SCHEMA)
    keys = spark.createDataFrame(
        [("h1", "k1", "u1", "n", "p", None, "", ""),
         ("h2", "k2", "u2", "n", "p", None, "", ""),
         ("h3", "k3", None, "n", "p", None, "", "")],  # NULL owner
        API_KEYS_SCHEMA)
    ws = spark.createDataFrame(
        [("ws1", "one", True, ""), ("ws2", "two", True, "")],
        WORKSPACES_SCHEMA)
    u2, k2 = disable_user_cascade("u1", users, keys)
    # only u1's key revoked; the NULL-owner row must survive
    assert {r.id for r in k2.collect()} == {"k2", "k3"}
    assert {r.id: r.enabled for r in u2.collect()} == {
        "u1": False, "u2": True}
    w3, u3, k3 = disable_workspace_cascade("ws1", ws, users, keys)
    assert {r.id: r.enabled for r in w3.collect()} == {
        "ws1": False, "ws2": True}
    assert {r.id: r.enabled for r in u3.collect()} == {
        "u1": False, "u2": True}
    assert {r.id for r in k3.collect()} == {"k2", "k3"}


def test_batch_plans_native_and_broadcast(spark):
    svc, ids = _matrix_service()
    users_df, keys_df, ws_df = svc.store.to_frames(spark)
    checks_df = spark.createDataFrame(
        [(0, ids["reader"], "triples:read", None)],
        "check_id long, user_id string, capability string, "
        "target_workspace string")
    req_df = spark.createDataFrame([(0, "tg_x")],
                                   "req_id long, api_key string")
    for df in (authorise_batch(spark, checks_df, users_df),
               resolve_api_keys_batch(req_df, keys_df, users_df, ws_df,
                                      0)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan
        assert "ArrowEvalPython" not in plan
        assert "BroadcastHashJoin" in plan
        assert "CartesianProduct" not in plan
