"""Token metering — the reference's metering processor
(trustgraph-flow/trustgraph/metering/counter.py:26-140) as corpus-scale
column arithmetic instead of a per-message Prometheus increment.

Reference semantics pinned here:

- per-workspace price tables come from the config store, type
  ``token-cost``, one key per model, value a JSON object with
  ``input_price`` / ``output_price`` in USD per token
  (counter.py:66-90: ``json.loads`` per entry);
- a response's model falls back to ``"unknown"`` when absent
  (counter.py:101) and token counts fall back to 0 (:102-103);
- per-call cost = ``round(in*input_price + out*output_price, 6)``
  (:106-109), priced only when the model is in the workspace's table
  (:104-105 — the reference logs "Model Not Found in Price list").
  The reference's ``round`` is Python's (banker's); ``F.bround`` is
  the Spark twin.  They can still diverge ONE ulp at an exact
  .5-micro-USD boundary (Python ties on the double's true binary
  value, Spark on its shortest decimal repr) — per the repo's float
  policy the gated oracle uses integer-micro prices where no boundary
  exists, and the divergence is confined to sub-micro price tables;
- the two counters (``tg_metering_tokens_total`` /
  ``tg_metering_cost_usd_total``, labelled model x direction,
  :31-44,110-114) become ONE map-side-combinable groupBy.

Scale shape: the price table is a config artifact (a few rows per
workspace) — always the broadcast side; the completions table is the
100 TB side and is scanned once, never shuffled for the join.  The
counter aggregate shuffles only (workspace, model) groups.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_COST_TYPE = "token-cost"


def price_table_from_config(log: DataFrame) -> DataFrame:
    """Resolve the config append-log to the current per-workspace price
    tables: (workspace, model, input_price, output_price).  Mirrors
    on_cost_config (counter.py:66-90): key = model name, value = JSON
    with input_price/output_price; malformed or incomplete JSON keeps
    the model UNPRICED (null prices -> the not-found arm) rather than
    poisoning the batch."""
    from trustgraph_spark.operators.config import config_resolve

    prices = F.from_json(
        "value", "struct<input_price:double,output_price:double>")
    return (config_resolve(log)
            .where(F.col("type") == TOKEN_COST_TYPE)
            .select("workspace",
                    F.col("key").alias("model"),
                    prices.getField("input_price").alias("input_price"),
                    prices.getField("output_price").alias("output_price"))
            .where(F.col("input_price").isNotNull()
                   & F.col("output_price").isNotNull()))


def meter_costs(completions: DataFrame, prices: DataFrame) -> DataFrame:
    """Per-call metering over a completions table (workspace, model,
    in_token, out_token, + passthrough columns): adds num_in/num_out
    (null -> 0), the effective model name (null/empty -> "unknown"),
    price_found, and cost_in/cost_out/cost_per_call rounded to 6 dp —
    the exact counter.py:96-114 arithmetic.  Unpriced models keep NULL
    costs (the reference's "Model Not Found in Price list" arm)."""
    model = F.coalesce(
        F.nullif(F.col("model"), F.lit("")), F.lit("unknown"))
    normalized = completions.withColumn("model", model).withColumn(
        "num_in", F.coalesce(F.col("in_token"), F.lit(0)).cast("long")
    ).withColumn(
        "num_out", F.coalesce(F.col("out_token"), F.lit(0)).cast("long"))

    joined = normalized.join(
        F.broadcast(prices), ["workspace", "model"], "left")
    cost_in = F.col("num_in") * F.col("input_price")
    cost_out = F.col("num_out") * F.col("output_price")
    return (joined
            .withColumn("price_found", F.col("input_price").isNotNull())
            .withColumn("cost_in", F.bround(cost_in, 6))
            .withColumn("cost_out", F.bround(cost_out, 6))
            .withColumn("cost_per_call", F.bround(cost_in + cost_out, 6)))


def token_counters(metered: DataFrame) -> DataFrame:
    """The two Prometheus counters as one grouped frame — (workspace,
    model, direction) -> tokens (tg_metering_tokens_total) and cost_usd
    (tg_metering_cost_usd_total; unpriced calls contribute tokens but
    no cost, exactly like the reference's skipped inc at :104-114)."""
    base = metered.select(
        "workspace", "model",
        F.explode(F.array(
            F.struct(F.lit("input").alias("direction"),
                     F.col("num_in").alias("tokens"),
                     F.col("cost_in").alias("cost")),
            F.struct(F.lit("output").alias("direction"),
                     F.col("num_out").alias("tokens"),
                     F.col("cost_out").alias("cost")),
        )).alias("x"),
    ).select("workspace", "model", "x.direction", "x.tokens",
             F.when(F.col("x.cost").isNotNull(), F.col("x.cost"))
             .otherwise(F.lit(0.0)).alias("cost"))
    return (base.groupBy("workspace", "model", "direction")
            .agg(F.sum("tokens").cast("long").alias("tokens"),
                 F.bround(F.sum("cost"), 6).alias("cost_usd")))
