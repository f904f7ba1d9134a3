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
