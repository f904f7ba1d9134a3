"""Token metering parity (metering/counter.py:26-140)."""

import pytest

from pyspark.sql import functions as F

from trustgraph_spark.operators.metering import (
    meter_costs,
    price_table_from_config,
    token_counters,
)

_LOG_SCHEMA = ("workspace string, type string, key string, "
               "value string, seq long, deleted boolean")
_COMP_SCHEMA = ("workspace string, model string, in_token long, "
                "out_token long")


@pytest.fixture(scope="module")
def prices(spark):
    log = spark.createDataFrame([
        # LWW: seq 2 beats seq 1 for (ws0, gpt-a)
        ("ws0", "token-cost", "gpt-a",
         '{"input_price": 0.001, "output_price": 0.002}', 1, False),
        ("ws0", "token-cost", "gpt-a",
         '{"input_price": 0.003, "output_price": 0.004}', 2, False),
        # malformed JSON -> unpriced, not a crash (counter.py json.loads
        # is per-entry; we skip per-entry too)
        ("ws0", "token-cost", "bad", "not json", 3, False),
        # incomplete object -> unpriced
        ("ws0", "token-cost", "half", '{"input_price": 0.001}', 4, False),
        # other config types never leak into the price table
        ("ws0", "prompt", "gpt-z",
         '{"input_price": 9.0, "output_price": 9.0}', 5, False),
        # second workspace has its own table (self.prices[workspace])
        ("ws1", "token-cost", "gpt-a",
         '{"input_price": 0.01, "output_price": 0.02}', 6, False),
    ], _LOG_SCHEMA)
    return price_table_from_config(log)


def test_price_table_resolution(prices):
    rows = {(r["workspace"], r["model"]):
            (r["input_price"], r["output_price"])
            for r in prices.collect()}
    assert rows == {("ws0", "gpt-a"): (0.003, 0.004),
                    ("ws1", "gpt-a"): (0.01, 0.02)}


def test_meter_costs_reference_arithmetic(spark, prices):
    comp = spark.createDataFrame([
        ("ws0", "gpt-a", 100, 50),        # priced
        ("ws1", "gpt-a", 7, 3),           # other workspace's prices
        ("ws0", "mystery", 10, 20),       # not in price list
        ("ws0", "", 5, 5),                # empty -> "unknown" (:101)
        ("ws0", None, 1, None),           # null model + null out (:101-103)
    ], _COMP_SCHEMA)
    rows = {(r["workspace"], r["model"], r["num_in"], r["num_out"]):
            (r["price_found"], r["cost_per_call"])
            for r in meter_costs(comp, prices).collect()}
    # the reference's exact formula: round(in*p_in + out*p_out, 6)
    assert rows[("ws0", "gpt-a", 100, 50)] == (
        True, round(100 * 0.003 + 50 * 0.004, 6))
    assert rows[("ws1", "gpt-a", 7, 3)] == (
        True, round(7 * 0.01 + 3 * 0.02, 6))
    assert rows[("ws0", "mystery", 10, 20)] == (False, None)
    assert rows[("ws0", "unknown", 5, 5)] == (False, None)
    assert rows[("ws0", "unknown", 1, 0)] == (False, None)


def test_token_counters_match_python_replay(spark, prices):
    comp = spark.createDataFrame([
        ("ws0", "gpt-a", 100, 50),
        ("ws0", "gpt-a", 10, 5),
        ("ws0", "mystery", 10, 20),
        ("ws1", "gpt-a", 7, 3),
    ], _COMP_SCHEMA)
    got = {(r["workspace"], r["model"], r["direction"]):
           (r["tokens"], r["cost_usd"])
           for r in token_counters(meter_costs(comp, prices)).collect()}
    # counter semantics: tokens always inc; cost only when priced
    assert got[("ws0", "gpt-a", "input")] == (110, round(110 * 0.003, 6))
    assert got[("ws0", "gpt-a", "output")] == (55, round(55 * 0.004, 6))
    assert got[("ws0", "mystery", "input")] == (10, 0.0)
    assert got[("ws0", "mystery", "output")] == (20, 0.0)
    assert got[("ws1", "gpt-a", "input")] == (7, round(7 * 0.01, 6))
    assert got[("ws1", "gpt-a", "output")] == (3, round(3 * 0.02, 6))


def test_price_join_is_broadcast(spark, prices):
    comp = spark.createDataFrame(
        [("ws0", "gpt-a", 1, 1)], _COMP_SCHEMA)
    plan = meter_costs(comp, prices)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan
