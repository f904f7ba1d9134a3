"""Corpus-level line dedup (operators/linededup.py) vs a Python replay
of the pinned semantics."""

import pytest

from trustgraph_spark.operators.linededup import (
    corpus_line_dedup, corpus_line_stats)

BANNER = "COOKIE NOTICE please accept our terms"

DOCS = [
    (0, BANNER + "\nunique zero\nfooter A\n" + BANNER),    # in-doc repeat
    (1, BANNER + "\nunique one\nfooter A"),
    (2, BANNER + "\nunique two\nfooter B"),
    (3, "unique three\n   \nfooter B"),                    # blank-key line
    (4, "  " + BANNER + "  \nunique four"),                # trims to banner
    (5, "all alone here"),
    (6, ""),
]


def py_dedup(docs, min_count=2, keep_first=True):
    lines = []
    for doc_id, text in docs:
        for pos, ln in enumerate(text.split("\n")):
            lines.append((doc_id, pos, ln, ln.strip()))
    counts, first = {}, {}
    for doc_id, pos, ln, key in lines:
        if key == "":
            continue
        counts[key] = counts.get(key, 0) + 1
        first.setdefault(key, (doc_id, pos))
    out = {}
    for doc_id, text in docs:
        kept, dropped = [], 0
        for pos, ln in enumerate(text.split("\n")):
            key = ln.strip()
            if key != "" and counts.get(key, 0) >= min_count and not (
                    keep_first and first[key] == (doc_id, pos)):
                dropped += 1
            else:
                kept.append(ln)
        out[doc_id] = ("\n".join(kept), len(kept), dropped)
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("keep_first,min_count", [
    (True, 2), (False, 2), (True, 3)])
def test_line_dedup_matches_python_replay(spark, docs_df,
                                          keep_first, min_count):
    got = {r["doc_id"]: (r["text"], r["n_lines_kept"], r["n_lines_dropped"])
           for r in corpus_line_dedup(
               docs_df, min_count=min_count,
               keep_first=keep_first).collect()}
    exp = py_dedup(DOCS, min_count=min_count, keep_first=keep_first)
    assert got == exp


def test_line_dedup_c4_policy(spark, docs_df):
    got = {r["doc_id"]: r.asDict()
           for r in corpus_line_dedup(docs_df).collect()}
    # banner: first occurrence is (0, 0) — kept there, dropped everywhere
    # else including the in-doc repeat at (0, 3) and the trimmed copy in 4
    assert got[0]["text"] == BANNER + "\nunique zero\nfooter A"
    # footer A's first occurrence is (0, 2), so doc 1's copy drops too
    assert got[1]["text"] == "unique one"
    assert got[4]["text"] == "unique four"
    # blank-key line is structural — never dropped ("footer B" itself
    # drops: its first occurrence is in doc 2)
    assert got[3]["text"] == "unique three\n   "
    # untouched docs
    assert got[5]["text"] == "all alone here" and got[5]["n_lines_dropped"] == 0
    assert got[6]["text"] == "" and got[6]["n_lines_kept"] == 1


def test_line_dedup_drop_all_policy(spark, docs_df):
    got = {r["doc_id"]: r["text"]
           for r in corpus_line_dedup(docs_df, keep_first=False).collect()}
    assert got[0] == "unique zero"          # both banner copies + footer A gone
    assert got[1] == "unique one"
    assert got[2] == "unique two"


def test_line_dedup_plan_shape(spark, docs_df):
    df = corpus_line_dedup(docs_df)
    df.collect()  # let AQE finalize the join strategy
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in plan
    # the duplicated-key build side is count-filtered and broadcast
    assert "BroadcastHashJoin" in plan
    assert "Python" not in plan


def test_corpus_line_stats(spark, docs_df):
    stats = {r["line_key"]: r.asDict()
             for r in corpus_line_stats(docs_df).collect()}
    assert set(stats) == {BANNER, "footer A", "footer B"}
    assert stats[BANNER]["n_occurrences"] == 5
    assert (stats[BANNER]["first_doc_id"], stats[BANNER]["first_line_pos"]) \
        == (0, 0)
    assert stats["footer A"]["n_occurrences"] == 2
    assert stats["footer B"]["first_doc_id"] == 2
