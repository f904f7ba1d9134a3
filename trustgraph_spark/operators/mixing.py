"""Deterministic data-mixture construction — the sampling stage that
turns a curated corpus into a training mix with pinned per-source
proportions (the published recipe behind every major pre-training
dataset card: per-domain target weights, downsample the over-
represented sources, repeat ("epoch") the under-represented ones).

Two operators:

* :func:`source_stats` — per-source doc/token/char totals and corpus
  fractions.  ONE map-side-combinable aggregate; the fraction join is
  against a 1-row total, broadcast.
* :func:`sample_to_mix` — given ``targets`` (source → fraction of the
  token budget), compute each source's sampling rate
  ``rate = target_frac * budget / source_tokens`` and emit each doc
  ``floor(rate)`` times plus one more with probability ``frac(rate)``
  — i.e. downsampling for rate < 1 and epoch-repeat upsampling for
  rate > 1, in expectation hitting the budget exactly.

Determinism (the property that makes the mix reproducible across
cluster sizes and reruns, and lets the DuckDB oracle replay it): the
Bernoulli draw is NOT ``rand()`` but ``u(doc) = int(md5(salt ||
doc_id)[:8]) / 2^32`` — a pure column expression, identical on any
partitioning.  md5 (not xxhash64) so the oracle computes the same u.

Scale shape: the per-source token totals are a tiny aggregate (one
row per source) joined back via broadcast; the copy expansion is a
native ``explode(sequence(...))`` — no corpus-side shuffle anywhere,
scan speed at 100 TB.  Sources missing from ``targets`` get rate 0
(dropped); targeted sources missing from the corpus contribute no
rows (there is nothing to upsample).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _n_tokens(text: Column) -> Column:
    return F.size(F.filter(F.split(text, r"\s+"), lambda x: x != ""))


def uniform_hash(doc_id: Column, salt: str) -> Column:
    """Deterministic u in [0, 1): first 8 md5 hex digits of
    salt||doc_id over 2^32.  Pure column expr — partitioning-proof."""
    h = F.md5(F.concat(F.lit(salt), doc_id.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
            / F.lit(4294967296.0))


def source_stats(documents: DataFrame, id_col: str = "doc_id",
                 text_col: str = "text",
                 source_col: str = "source") -> DataFrame:
    """Per-source doc/token/char totals + corpus fractions."""
    per = (documents
           .select(F.col(source_col).alias("source"),
                   _n_tokens(F.col(text_col)).alias("toks"),
                   F.length(text_col).alias("chars"))
           .groupBy("source")
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum("toks").alias("n_tokens"),
                F.sum("chars").alias("n_chars")))
    tot = per.agg(F.sum("n_docs").alias("td"),
                  F.sum("n_tokens").alias("tt"))

    def _frac(num, den):
        return F.round(F.when(F.col(den) > 0, F.col(num) / F.col(den))
                       .otherwise(F.lit(0.0)), 6)

    return (per.join(F.broadcast(tot))
            .select("source", "n_docs", "n_tokens", "n_chars",
                    _frac("n_docs", "td").alias("doc_frac"),
                    _frac("n_tokens", "tt").alias("token_frac")))


def sample_to_mix(documents: DataFrame, targets: dict[str, float],
                  token_budget: int | None = None, salt: str = "mix",
                  id_col: str = "doc_id", text_col: str = "text",
                  source_col: str = "source") -> DataFrame:
    """Emit (doc_id, source, epoch, rate) rows realizing the target
    mix; epoch numbers copies 1..n for upsampled docs.  With
    ``token_budget=None`` the budget is the corpus's own token total
    (pure re-weighting)."""
    tgt = F.create_map(*[
        F.lit(x) for kv in targets.items() for x in kv])

    per = (documents
           .select(F.col(source_col).alias("source"),
                   _n_tokens(F.col(text_col)).alias("toks"))
           .groupBy("source")
           .agg(F.sum("toks").alias("src_tokens")))
    # budget as a scalar: the corpus's own token total (or the constant)
    tot = per.agg(F.sum("src_tokens").cast("double").alias("budget"))
    budget = (F.lit(float(token_budget)) if token_budget is not None
              else F.col("budget"))
    # src_tokens == 0 (a source whose docs are all empty) would trip
    # ANSI DIVIDE_BY_ZERO before the join could filter it; rate 0 is
    # also the right semantics — nothing to sample or upsample
    rates = (per.join(F.broadcast(tot))
             .select(
                 "source", "src_tokens",
                 F.when(
                     F.col("src_tokens") > 0,
                     F.coalesce(tgt[F.col("source")], F.lit(0.0))
                     * budget / F.col("src_tokens"))
                 .otherwise(F.lit(0.0)).alias("rate")))

    docs = documents.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"))
    u = uniform_hash(F.col("doc_id"), salt)
    n_copies = (F.floor("rate").cast("int")
                + F.when(u < F.col("rate") - F.floor("rate"), 1)
                .otherwise(0))
    return (docs
            .join(F.broadcast(rates.drop("src_tokens")), "source")
            .withColumn("n_copies", n_copies)
            .where(F.col("n_copies") > 0)
            .select("doc_id", "source",
                    F.explode(F.sequence(F.lit(1), F.col("n_copies")))
                    .alias("epoch"),
                    F.round("rate", 6).alias("rate")))


# ---------------------------------------------------------------------------
# Seeded corpus shuffle + sharding (the export stage after selection /
# mixing / packing: training loaders consume a reproducible pseudo-random
# permutation in fixed-size shards).  Brief-mandated family extension —
# no reference analog, same determinism contract as sample_to_mix above.
# ---------------------------------------------------------------------------


def shuffle_shards(documents: DataFrame, n_shards: int = 1024,
                   seed: str = "s0", id_col: str = "doc_id",
                   key_cols: list | None = None) -> DataFrame:
    """Assign every document a seeded shuffle ``order_key`` and a
    ``shard_id``; reading shards in (shard_id, order_key) order is one
    fixed global permutation of the corpus.

    The 100 TB shape: a literal global ``ORDER BY random()`` is a total
    sort — range-exchange plus sampling over the whole corpus, and not
    reproducible across reruns or cluster sizes.  A training shuffle only
    needs (a) a deterministic permutation and (b) bounded shard sizes,
    so both come from one md5 per doc: ``order_key = md5(seed:doc_id)``
    (the permutation — uniform, seed-keyed, partitioning-independent),
    ``shard_id = first-8-hex-digits % n_shards`` (uniform balance, no
    sampling pass).  This function is a narrow projection — ZERO
    shuffles; :func:`shard_layout` adds the single hash exchange that
    physically clusters shards for the writer.  md5 (not xxhash64) so
    the DuckDB oracle replays the exact assignment.

    ``key_cols`` (default ``[id_col]``) must uniquely identify a row:
    a mixed corpus carries epoch-repeat copies of each doc, so pass
    ``["doc_id", "epoch"]`` there — otherwise all copies of a doc share
    one order_key (repeats land back-to-back in the export stream and
    the sort tie-order among them is nondeterministic).  A NULL in any
    key column propagates to a NULL order_key/shard_id (``F.concat``
    semantics — identical to the SQL ``||`` oracle and loud downstream)
    rather than silently hashing a partial key.
    """
    cols = list(key_cols) if key_cols else [id_col]
    parts = [F.lit(seed)]
    for c in cols:
        parts.extend([F.lit(":"), F.col(c).cast("string")])
    h = F.md5(F.concat(*parts))
    return (documents
            .withColumn("order_key", h)
            .withColumn(
                "shard_id",
                (F.conv(F.substring(F.col("order_key"), 1, 8), 16, 10)
                 .cast("long") % n_shards).cast("int")))


def shard_layout(sharded: DataFrame, n_shards: int) -> DataFrame:
    """Physically cluster the assignment for export: ONE hash exchange on
    shard_id with an in-partition sort on (shard_id, order_key) — a
    writer then emits row-order-stable shard files (partitionBy or
    per-task files), never a global sort."""
    return (sharded.repartition(n_shards, "shard_id")
            .sortWithinPartitions("shard_id", "order_key"))


def shard_stats(sharded: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-shard manifest: doc/char totals plus the first (order_key,
    doc) of each shard — the loader's integrity check that a re-export
    reproduced the same permutation.  One map-side-combinable
    aggregate."""
    return (sharded.groupBy("shard_id")
            .agg(F.count("*").cast("long").alias("n_docs"),
                 F.sum(F.length(F.col(text_col))).cast("long")
                 .alias("n_chars"),
                 F.min("order_key").alias("first_key"),
                 F.min_by(F.col(id_col), F.col("order_key"))
                 .alias("first_doc")))
