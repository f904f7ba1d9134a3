"""Unigram LM quality scoring (operators/lmquality.py) vs the module's
own pure-Python replay."""

import pytest

from trustgraph_spark.operators.lmquality import (
    py_unigram_scores, token_frequencies, unigram_logprob_score)

DOCS = [
    (0, "the cat sat on the mat the cat slept"),
    (1, "the dog ran to the park and the dog barked"),
    (2, "zyzzyva qwertic flonk blarp"),        # all rare -> low score
    (3, "the the the the"),                     # most common only
    (4, ""),
    (5, "the cat and the dog met at the park"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_token_frequencies_topv(spark, docs_df):
    freq = {r["token"]: r["cnt"]
            for r in token_frequencies(docs_df, vocab_size=3).collect()}
    # 'the' x13 dominates; ties at cnt=3 ('cat','dog') break by token asc
    assert freq == {"the": 13, "cat": 3, "dog": 3}


@pytest.mark.parametrize("vocab_size", [100, 5])
def test_scores_match_python_replay(spark, docs_df, vocab_size):
    got = {r["doc_id"]: (r["n_tokens"], r["n_oov"], r["mean_logprob"])
           for r in unigram_logprob_score(
               docs_df, vocab_size=vocab_size).collect()}
    exp = py_unigram_scores(DOCS, vocab_size=vocab_size)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k][0] == exp[k][0]
        assert got[k][1] == exp[k][1]
        assert got[k][2] == pytest.approx(exp[k][2], abs=2e-6), k


def test_score_ordering_is_sane(spark, docs_df):
    got = {r["doc_id"]: r["mean_logprob"]
           for r in unigram_logprob_score(docs_df).collect()}
    # common-token doc scores higher than the all-rare doc
    assert got[3] > got[0] > got[2]
    assert got[4] == 0.0  # empty doc sentinel


def test_plan_broadcasts_model(spark, docs_df):
    df = unigram_logprob_score(docs_df, vocab_size=10)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    assert "SortMergeJoin" not in plan
