"""DSIR importance resampling (operators/dsir.py) vs a pure-Python
replay of the hashed-n-gram models, plus selection-quality and plan
checks."""

import hashlib
import math

import pytest

from trustgraph_spark.operators.dsir import dsir_sample, dsir_weights

B = 64  # small bucket count so collisions are exercised


def _grams(text):
    w = [t for t in text.lower().split() if t]
    return w + [" ".join(p) for p in zip(w, w[1:])]


def _bucket(g):
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _fit(texts):
    counts = {}
    total = 0
    for t in texts:
        for g in _grams(t):
            counts[_bucket(g)] = counts.get(_bucket(g), 0) + 1
            total += 1
    logp = {b: math.log((c + 1.0) / (total + B)) for b, c in counts.items()}
    floor = math.log(1.0 / (total + B))
    return logp, floor


def py_weights(raw_rows, target_texts):
    t_logp, t_floor = _fit(target_texts)
    b_logp, b_floor = _fit([t for _, t in raw_rows])
    out = {}
    for i, t in raw_rows:
        gs = _grams(t)
        w = sum(t_logp.get(_bucket(g), t_floor) - b_logp.get(_bucket(g), b_floor)
                for g in gs)
        out[i] = (len(gs), round(w, 6))
    return out


def py_key(doc_id, weight, salt="dsir"):
    h = int(hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()[:8], 16)
    u = (h + 0.5) / 2**32
    return round(weight - math.log(-math.log(u)), 6)


@pytest.fixture(scope="module")
def corpora(spark):
    # raw: half "code-flavored", half "prose-flavored"; target: prose
    raw_rows = []
    for i in range(120):
        if i % 2 == 0:
            raw_rows.append((i, f"def func{i % 7} ( x ) : return x + {i % 5}"))
        else:
            raw_rows.append((i, f"the quick brown fox {i % 7} jumps over the lazy dog {i % 5}"))
    target_texts = [f"a lazy dog and the quick fox met {j}" for j in range(10)]
    raw = spark.createDataFrame(raw_rows, "doc_id long, text string")
    target = spark.createDataFrame(
        [(j, t) for j, t in enumerate(target_texts)],
        "doc_id long, text string")
    return raw, target, raw_rows, target_texts


def test_weights_match_python_replay(spark, corpora):
    raw, target, raw_rows, target_texts = corpora
    got = {r["doc_id"]: (r["n_grams"], r["weight"])
           for r in dsir_weights(raw, target, n_buckets=B).collect()}
    exp = py_weights(raw_rows, target_texts)
    assert set(got) == set(exp)
    for i in exp:
        assert got[i][0] == exp[i][0], i
        assert got[i][1] == pytest.approx(exp[i][1], abs=2e-6), i


def test_weights_prefer_target_like_docs(spark, corpora):
    raw, target, raw_rows, _ = corpora
    got = {r["doc_id"]: r["weight"]
           for r in dsir_weights(raw, target, n_buckets=B).collect()}
    prose = [got[i] for i, _ in raw_rows if i % 2 == 1]
    code = [got[i] for i, _ in raw_rows if i % 2 == 0]
    # every prose doc should out-weigh every code doc under a prose target
    assert min(prose) > max(code)


def test_empty_and_missing_docs(spark):
    raw = spark.createDataFrame(
        [(0, "alpha beta"), (1, ""), (2, "   ")],
        "doc_id long, text string")
    target = spark.createDataFrame([(0, "alpha beta")],
                                   "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["weight"])
           for r in dsir_weights(raw, target, n_buckets=B).collect()}
    assert set(got) == {0, 1, 2}
    assert got[1] == (0, 0.0)
    assert got[2] == (0, 0.0)
    assert got[0][0] == 3  # alpha, beta, "alpha beta"


def test_empty_target_corpus(spark):
    raw = spark.createDataFrame([(0, "alpha beta")],
                                "doc_id long, text string")
    target = spark.createDataFrame([], "doc_id long, text string")
    rows = dsir_weights(raw, target, n_buckets=B).collect()
    # target floor = ln(1/B); raw grams all observed — finite weight
    assert len(rows) == 1 and rows[0]["n_grams"] == 3
    assert math.isfinite(rows[0]["weight"])


def test_sample_matches_gumbel_replay(spark, corpora):
    raw, target, raw_rows, target_texts = corpora
    k = 30
    got = dsir_sample(raw, target, k=k, n_buckets=B).collect()
    exp_w = py_weights(raw_rows, target_texts)
    keyed = sorted(((py_key(i, w), -i) for i, (_, w) in exp_w.items()),
                   reverse=True)
    exp_ids = [-ni for _, ni in keyed[:k]]
    assert [r["doc_id"] for r in got] == exp_ids
    for r in got:
        assert r["key"] == pytest.approx(py_key(r["doc_id"], exp_w[r["doc_id"]][1]),
                                         abs=2e-6)


def test_sample_is_partitioning_invariant(spark, corpora):
    raw, target, _, _ = corpora
    a = dsir_sample(raw, target, k=20, n_buckets=B).collect()
    b = dsir_sample(raw.repartition(7), target, k=20, n_buckets=B).collect()
    assert [r["doc_id"] for r in a] == [r["doc_id"] for r in b]


def test_plan_native_broadcast_only(spark, corpora):
    raw, target, _, _ = corpora
    out = dsir_weights(raw, target, n_buckets=B)
    out.collect()
    plan = out._jdf.queryExecution().executedPlan().toString()
    # model lookups are broadcast; the corpus side never sort-merge-joins;
    # the whole operator is native columns (no Python seam)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "Python" not in plan
