"""Exact-substring span dedup (operators/spandedup.py) vs a Python
replay of the pinned anchor semantics."""

import hashlib

import pytest

from trustgraph_spark.operators.spandedup import exact_substring_dedup

N = 5

SPAN = "one two three four five six seven"        # 7 tokens -> 3 5-grams

DOCS = [
    (0, SPAN + " tail0a tail0b"),
    (1, "head1a head1b " + SPAN),                  # repeats doc 0's span
    (2, "just some completely different words here"),
    (3, SPAN),                                     # another repeat
    (4, "short doc"),                              # < n tokens
    (5, ""),
]


def py_span_dedup(docs, n=N, min_count=2):
    toks = {d: [w for w in t.lower().split() if w] for d, t in docs}
    occ = []
    for d, ws in sorted(toks.items()):
        for i in range(len(ws) - n + 1):
            occ.append((d, i, " ".join(ws[i:i + n])))
    counts, first = {}, {}
    for d, i, g in occ:
        counts[g] = counts.get(g, 0) + 1
        if g not in first or (d, i) < first[g]:
            first[g] = (d, i)
    covered = {}
    for d, i, g in occ:
        if counts[g] >= min_count and first[g] != (d, i):
            for k in range(i, i + n):
                covered.setdefault(d, set()).add(k)
    out = {}
    for d, ws in toks.items():
        keep = [w for i, w in enumerate(ws)
                if i not in covered.get(d, set())]
        out[d] = (" ".join(keep), len(keep), len(ws) - len(keep))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_span_dedup_matches_replay(spark, docs_df):
    got = {r["doc_id"]: (r["text"], r["n_tokens_kept"],
                         r["n_tokens_removed"])
           for r in exact_substring_dedup(docs_df, n=N).collect()}
    assert got == py_span_dedup(DOCS)


def test_span_dedup_keeps_first_copy(spark, docs_df):
    got = {r["doc_id"]: r.asDict()
           for r in exact_substring_dedup(docs_df, n=N).collect()}
    # doc 0 holds the first occurrence: fully intact
    assert got[0]["text"] == SPAN + " tail0a tail0b"
    assert got[0]["n_tokens_removed"] == 0
    # repeats lose the whole 7-token span, keep their unique context
    assert got[1]["text"] == "head1a head1b"
    assert got[1]["n_tokens_removed"] == 7
    assert got[3]["text"] == "" and got[3]["n_tokens_removed"] == 7
    # untouched docs
    assert got[2]["n_tokens_removed"] == 0
    assert got[4]["text"] == "short doc"
    assert got[5] == dict(doc_id=5, text="", n_tokens_kept=0,
                          n_tokens_removed=0)


def test_span_dedup_plan_shape(spark, docs_df):
    df = exact_substring_dedup(docs_df, n=N)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    assert "Python" not in plan
