"""Deterministic mixture sampling (operators/mixing.py) vs a hashlib
replay, plus expectation checks on the realized mix."""

import hashlib

import pytest

from trustgraph_spark.operators.mixing import sample_to_mix, source_stats


def _mk_docs(spark, n=300):
    # three sources with very different sizes: web 70%, code 20%, wiki 10%
    rows = []
    for i in range(n):
        src = "web" if i % 10 < 7 else ("code" if i % 10 < 9 else "wiki")
        rows.append((i, "tok " * (5 + i % 7), src))
    return spark.createDataFrame(
        [(i, t.strip(), s) for i, t, s in rows],
        "doc_id long, text string, source string"), rows


def py_u(doc_id, salt="mix"):
    h = hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()
    return int(h[:8], 16) / 2**32


@pytest.fixture(scope="module")
def corpus(spark):
    return _mk_docs(spark)


def test_source_stats(spark, corpus):
    df, rows = corpus
    got = {r["source"]: r.asDict() for r in source_stats(df).collect()}
    toks = {}
    for i, t, s in rows:
        toks[s] = toks.get(s, 0) + len(t.split())
    total = sum(toks.values())
    assert got["web"]["n_docs"] == sum(1 for r in rows if r[2] == "web")
    for s in ("web", "code", "wiki"):
        assert got[s]["n_tokens"] == toks[s]
        assert got[s]["token_frac"] == pytest.approx(
            round(toks[s] / total, 6), abs=1e-9)


def test_sample_to_mix_matches_hash_replay(spark, corpus):
    df, rows = corpus
    targets = {"web": 0.3, "code": 0.5, "wiki": 0.2}
    out = sample_to_mix(df, targets).collect()
    toks = {}
    for i, t, s in rows:
        toks[s] = toks.get(s, 0) + len(t.split())
    budget = sum(toks.values())
    rate = {s: targets.get(s, 0.0) * budget / toks[s] for s in toks}
    exp = {}
    for i, t, s in rows:
        r = rate[s]
        n = int(r) + (1 if py_u(i) < r - int(r) else 0)
        if n > 0:
            exp[i] = (s, n, round(r, 6))
    got = {}
    for row in out:
        s, n, rr = got.get(row["doc_id"], (row["source"], 0, row["rate"]))
        got[row["doc_id"]] = (row["source"], n + 1, row["rate"])
    assert got == exp
    # epochs are 1..n for each doc
    epochs = {}
    for row in out:
        epochs.setdefault(row["doc_id"], []).append(row["epoch"])
    for i, es in epochs.items():
        assert sorted(es) == list(range(1, exp[i][1] + 1))


def test_mix_hits_budget_in_expectation(spark, corpus):
    df, rows = corpus
    targets = {"web": 0.3, "code": 0.5, "wiki": 0.2}
    out = sample_to_mix(df, targets).collect()
    toks = {i: len(t.split()) for i, t, s in rows}
    src_of = {i: s for i, t, s in rows}
    realized = {}
    for row in out:
        realized[row["source"]] = (realized.get(row["source"], 0)
                                   + toks[row["doc_id"]])
    budget = sum(toks.values())
    for s, frac in targets.items():
        # wiki is upsampled ~2x, code ~2.5x, web downsampled ~0.43x;
        # Bernoulli noise at n=300 stays well inside 25%
        assert realized[s] == pytest.approx(frac * budget, rel=0.25), s


def test_mix_rate_extremes(spark):
    df = spark.createDataFrame(
        [(0, "a b c", "keep"), (1, "d e f", "drop"), (2, "g h", "keep")],
        "doc_id long, text string, source string")
    out = sample_to_mix(df, {"keep": 1.0}, token_budget=16).collect()
    # rate = 16/5 = 3.2 for 'keep'; 'drop' has target 0 -> absent
    assert {r["doc_id"] for r in out} == {0, 2}
    n0 = sum(1 for r in out if r["doc_id"] == 0)
    assert n0 in (3, 4)
    for r in out:
        assert r["rate"] == pytest.approx(3.2)


def test_mix_plan_no_corpus_shuffle(spark, corpus):
    df, _ = corpus
    out = sample_to_mix(df, {"web": 1.0})
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the docs side reaches the join without an exchange; the only
    # aggregates are the tiny per-source token totals
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan


# ---------------------------------------------------------------------------
# seeded shuffle + sharding
# ---------------------------------------------------------------------------


def py_shard(doc_id, seed, n_shards):
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()
    return h, int(h[:8], 16) % n_shards


def test_shuffle_shards_matches_hash_replay(spark, corpus):
    from trustgraph_spark.operators.mixing import shuffle_shards

    df, rows = corpus
    out = {r["doc_id"]: (r["order_key"], r["shard_id"])
           for r in shuffle_shards(df, n_shards=16, seed="r5").collect()}
    assert len(out) == len(rows)
    for i, _, _ in rows:
        assert out[i] == py_shard(i, "r5", 16)


def test_shuffle_is_seeded_permutation(spark, corpus):
    from trustgraph_spark.operators.mixing import shuffle_shards

    df, rows = corpus
    a = shuffle_shards(df, n_shards=8, seed="a")
    b = shuffle_shards(df, n_shards=8, seed="b")
    order_a = [r["doc_id"] for r in
               a.orderBy("shard_id", "order_key").collect()]
    order_b = [r["doc_id"] for r in
               b.orderBy("shard_id", "order_key").collect()]
    # permutations of the same set, different under different seeds,
    # and not the ingest order
    assert sorted(order_a) == sorted(order_b) == [r[0] for r in rows]
    assert order_a != order_b
    assert order_a != [r[0] for r in rows]
    # same seed reproduces exactly
    again = [r["doc_id"] for r in
             shuffle_shards(df, n_shards=8, seed="a")
             .orderBy("shard_id", "order_key").collect()]
    assert again == order_a


def test_shard_stats_and_balance(spark, corpus):
    from trustgraph_spark.operators.mixing import shard_stats, shuffle_shards

    df, rows = corpus
    stats = {r["shard_id"]: r.asDict()
             for r in shard_stats(shuffle_shards(df, 16, seed="r5"))
             .collect()}
    # every shard populated at 300 docs / 16 shards; totals conserved
    assert set(stats) == set(range(16))
    assert sum(s["n_docs"] for s in stats.values()) == len(rows)
    assert sum(s["n_chars"] for s in stats.values()) == sum(
        len(t.strip()) for _, t, _ in rows)
    # first_doc is the arg-min of order_key within the shard
    per_shard = {}
    for i, _, _ in rows:
        key, sid = py_shard(i, "r5", 16)
        if sid not in per_shard or key < per_shard[sid][0]:
            per_shard[sid] = (key, i)
    for sid, (key, i) in per_shard.items():
        assert stats[sid]["first_key"] == key
        assert stats[sid]["first_doc"] == i


def test_shard_layout_single_exchange(spark, corpus):
    from trustgraph_spark.operators.mixing import shard_layout, shuffle_shards

    df, _ = corpus
    plan = shard_layout(shuffle_shards(df, 16, seed="r5"), 16) \
        ._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "rangepartitioning" not in plan.lower()  # never a global sort


def test_shuffle_null_id_propagates(spark):
    from trustgraph_spark.operators.mixing import shuffle_shards

    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (None, "c")],
        "doc_id long, text string")
    rows = {r["text"]: (r["order_key"], r["shard_id"])
            for r in shuffle_shards(df, 8, seed="r5").collect()}
    # non-null id hashes; NULL ids yield NULL key/shard (never a silent
    # shared md5('r5') bucket), matching the SQL || oracle
    assert rows["a"] == py_shard(1, "r5", 8)
    assert rows["b"] == (None, None) and rows["c"] == (None, None)


def test_shuffle_epoch_key_separates_repeats(spark):
    from trustgraph_spark.operators.mixing import shuffle_shards

    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "x"), (2, 1, "y")],
        "doc_id long, epoch int, text string")
    out = shuffle_shards(df, 8, seed="r5",
                         key_cols=["doc_id", "epoch"]).collect()
    keys = {(r["doc_id"], r["epoch"]): r["order_key"] for r in out}
    assert len(set(keys.values())) == 3  # epoch copies get distinct keys
    h, sid = py_shard("1:2", "r5", 8)   # md5('r5:1:2') replay
    assert keys[(1, 2)] == h
