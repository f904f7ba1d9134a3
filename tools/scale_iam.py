"""10x scale evidence for the IAM batch hot paths (round-5 session 4):
authorise_batch and resolve_api_keys_batch.

Same discipline as tools/scale_family.py / scale_wire.py: the 10x
population is a deterministic doc_id-offset replication preserving the
planted mod structure, so per-check decision density is constant and
the growth RATIOS are the controlled quantity.  Two claims under test:

- 10x checks (with a FIXED identity dim) -> wall tracks the check scan
  (the role-capability vocabulary and user dim are broadcast; the
  reference's shape is one Cassandra point read per check, i.e. 10x
  round-trips).
- 10x identities AND 10x requests together -> still scan-dominated:
  broadcast dims grow but stay far under the broadcast threshold at
  any realistic deployment size (users are thousands, not billions).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def _wall(fn, reps=2):
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def _ids(spark, mult):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    n = 5000
    parts = [d]
    for k in range(1, mult):
        parts.append(d.select((F.col("doc_id") + k * n).alias("doc_id")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _users(base):
    n = F.col("doc_id")
    return base.select(
        F.concat(F.lit("u"), n.cast("string")).alias("id"),
        F.concat(F.lit("ws"), (n % 4).cast("string"))
        .alias("default_workspace"),
        F.lit("x").alias("username"), F.lit("x").alias("name"),
        F.lit("").alias("email"), F.lit("").alias("password_hash"),
        F.when(n % 5 == 0, F.array(F.lit("reader")))
        .when(n % 5 == 1, F.array(F.lit("writer")))
        .when(n % 5 == 2, F.array(F.lit("admin")))
        .when(n % 5 == 3, F.array(F.lit("ghost"), F.lit("reader")))
        .otherwise(F.array().cast("array<string>")).alias("roles"),
        (n % 7 != 0).alias("enabled"),
        F.lit(False).alias("must_change_password"),
        F.lit("").alias("created"))


def _checks(base, user_mod):
    n = F.col("doc_id")
    return base.select(
        n.cast("long").alias("check_id"),
        F.concat(F.lit("u"), (n % user_mod).cast("string"))
        .alias("user_id"),
        F.when(n % 4 == 0, F.lit("triples:read"))
        .when(n % 4 == 1, F.lit("rows:write"))
        .when(n % 4 == 2, F.lit("users:admin"))
        .otherwise(F.lit("no-such-cap")).alias("capability"),
        F.when(n % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ws"), (n % 3).cast("string")))
        .alias("target_workspace"))


def _keys(base):
    n = F.col("doc_id")
    return base.select(
        F.sha2(F.concat(F.lit("tg_key"), n.cast("string"))
               .cast("binary"), 256).alias("key_hash"),
        F.concat(F.lit("k"), n.cast("string")).alias("id"),
        F.concat(F.lit("u"), n.cast("string")).alias("user_id"),
        F.lit("key").alias("name"), F.lit("tg_key").alias("prefix"),
        F.lit(None).cast("long").alias("expires_epoch"),
        F.lit("").alias("created"), F.lit("").alias("last_used"))


def _requests(base, key_mod):
    n = F.col("doc_id")
    return base.select(
        n.cast("long").alias("req_id"),
        F.when(n % 3 != 2,
               F.concat(F.lit("tg_key"), (n % key_mod).cast("string")))
        .otherwise(F.concat(F.lit("tg_missing"), n.cast("string")))
        .alias("api_key"))


def main():
    from trustgraph_spark.operators.iam import (
        authorise_batch,
        resolve_api_keys_batch,
    )
    from trustgraph_spark.session import get_spark

    spark = get_spark(cores=32)
    base = _ids(spark, 1).localCheckpoint()
    big = _ids(spark, 10).localCheckpoint()
    n_base, n_big = base.count(), big.count()

    workspaces = spark.range(4).select(
        F.concat(F.lit("ws"), F.col("id").cast("string")).alias("id"),
        F.col("id").cast("string").alias("name"),
        (F.col("id") != 2).alias("enabled"), F.lit("").alias("created"))

    users_fixed = _users(base).localCheckpoint()

    print(f"== authorise_batch (fixed {n_base}-user dim)")
    for label, checks in (("1x", _checks(base, 5000)),
                          ("10x", _checks(big, 5000))):
        w, out = _wall(
            lambda c=checks: authorise_batch(spark, c, users_fixed)
            .groupBy("allow").count().collect())
        total = sum(r["count"] for r in out)
        allowed = {r.allow: r["count"] for r in out}.get(True, 0)
        print(f"checks {label}: n={total} allow={allowed} wall={w:.2f}s")

    print(f"== authorise_batch (identities scale WITH checks)")
    for label, ids in (("1x", base), ("10x", big)):
        u = _users(ids)
        c = _checks(ids, 50_000)
        w, out = _wall(
            lambda u=u, c=c: authorise_batch(spark, c, u)
            .groupBy("allow").count().collect())
        total = sum(r["count"] for r in out)
        print(f"both {label}: n={total} wall={w:.2f}s")

    print("== resolve_api_keys_batch (identities scale with requests)")
    for label, ids in (("1x", base), ("10x", big)):
        u = _users(ids)
        k = _keys(ids)
        r = _requests(ids, 5000)
        w, out = _wall(
            lambda u=u, k=k, r=r: resolve_api_keys_batch(
                r, k, u, workspaces, 1_700_000_000)
            .groupBy("error").count().collect())
        total = sum(x["count"] for x in out)
        ok = {x.error: x["count"] for x in out}.get("", 0)
        print(f"requests {label}: n={total} resolved={ok} wall={w:.2f}s")

    spark.stop()


if __name__ == "__main__":
    main()
