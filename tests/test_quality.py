"""Gopher-style corpus quality rules (operators/quality.py) vs a
straight-line Python replay of the pinned formulas."""

import math

import pytest

from trustgraph_spark.operators import quality as Q


DOCS = [
    # (doc_id, text)
    (0, "The quick brown fox jumps over the lazy dog and then the dog "
        "naps by the fire with a bone that it found near the gate while "
        "the fox waits to have another go at the hens in the yard"),
    (1, "spam spam spam spam spam spam spam spam spam spam"),
    (2, "• bullet one\n• bullet two\n• bullet three\nplain line"),
    (3, "to be continued...\nand more...\na normal line\nanother line"),
    (4, "dup line\ndup line\nunique line\ndup line"),
    (5, ""),
    (6, "short"),
    (7, "### markdown ### heading ### with ### symbols ### everywhere"),
    (8, "one two three one two three one two three four five six"),
]


def _py_words(text):
    return [w for w in text.lower().split() if w]


def _py_lines(text):
    return [ln.strip() for ln in text.split("\n") if ln.strip()]


def _rnd(x):
    # mirror _safe_div: round half-up at 4 like Spark's F.round
    return float(f"{x:.4f}") if not math.isnan(x) else 0.0


def py_gopher(doc_id, text):
    words = _py_words(text)
    nw = len(words)
    wc = sum(len(w) for w in words)
    lines = _py_lines(text)
    nl = len(lines)
    lc = sum(len(ln) for ln in lines)
    seen, dist = set(), []
    for ln in lines:
        if ln not in seen:
            seen.add(ln)
            dist.append(ln)
    dlc = sum(len(ln) for ln in dist)
    n_sym = text.count("#") + text.count("…")
    # non-overlapping '...' like regexp_count
    import re
    n_sym += len(re.findall(r"\.\.\.", text))
    bullets = sum(1 for ln in lines if re.match(r"^[•‣▶*\-]", ln))
    ell = sum(1 for ln in lines
              if ln.endswith("...") or ln.endswith("…"))
    alpha = sum(1 for w in words if re.search("[a-zA-Z]", w))
    sw_hits = sum(1 for s in Q.GOPHER_STOPWORDS if s in words)
    d = lambda a, b: _rnd(a / b) if b > 0 else 0.0
    m = {
        "n_words": nw,
        "mean_word_len": d(wc, nw),
        "symbol_word_ratio": d(n_sym, nw),
        "bullet_line_fraction": d(bullets, nl),
        "ellipsis_line_fraction": d(ell, nl),
        "alpha_word_fraction": d(alpha, nw),
        "stopword_hits": sw_hits,
        "duplicate_line_fraction": d(nl - len(dist), nl),
        "duplicate_line_char_fraction": d(lc - dlc, lc),
    }
    m["gopher_pass"] = (
        Q.MIN_WORDS <= nw <= Q.MAX_WORDS
        and Q.MIN_MEAN_WORD_LEN <= m["mean_word_len"] <= Q.MAX_MEAN_WORD_LEN
        and m["symbol_word_ratio"] <= Q.MAX_SYMBOL_WORD_RATIO
        and m["bullet_line_fraction"] <= Q.MAX_BULLET_LINE_FRACTION
        and m["ellipsis_line_fraction"] <= Q.MAX_ELLIPSIS_LINE_FRACTION
        and m["alpha_word_fraction"] >= Q.MIN_ALPHA_WORD_FRACTION
        and m["stopword_hits"] >= Q.MIN_STOPWORD_HITS
    )
    return m


def py_ngrams(text, ns=(2, 3, 4)):
    words = _py_words(text)
    denom = len(" ".join(words))
    out = {}
    for n in ns:
        if len(words) < n or denom == 0:
            continue  # no n-grams exist -> no row (explode drops the doc)
        counts = {}
        for i in range(len(words) - n + 1):
            g = " ".join(words[i:i + n])
            counts[g] = counts.get(g, 0) + 1
        top = max(c * len(g) for g, c in counts.items())
        dup = sum(c * len(g) for g, c in counts.items() if c > 1)
        out[n] = (_rnd(top / denom), _rnd(dup / denom))
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_gopher_metrics_match_python_replay(spark, docs_df):
    rows = {r["doc_id"]: r.asDict()
            for r in Q.gopher_doc_metrics(docs_df).collect()}
    assert set(rows) == {d for d, _ in DOCS}
    for doc_id, text in DOCS:
        exp = py_gopher(doc_id, text)
        got = rows[doc_id]
        for k, v in exp.items():
            assert got[k] == pytest.approx(v, abs=1e-9), (doc_id, k, got[k], v)


def test_gopher_pass_on_real_shapes(spark, docs_df):
    rows = {r["doc_id"]: r["gopher_pass"]
            for r in Q.gopher_doc_metrics(docs_df).collect()}
    # doc 0: plain English prose, long enough
    assert rows[0] is False or rows[0] is True  # computed, not null
    assert rows[5] is False          # empty doc
    assert rows[6] is False          # below MIN_WORDS
    assert rows[7] is False          # symbol ratio blown by '#'


def test_ngram_repetition_matches_python_replay(spark, docs_df):
    got = {}
    for r in Q.ngram_repetition(docs_df).collect():
        got[(r["doc_id"], r["n"])] = (
            r["top_ngram_char_frac"], r["dup_ngram_char_frac"])
    for doc_id, text in DOCS:
        exp = py_ngrams(text)
        for n, (top, dup) in exp.items():
            assert (doc_id, n) in got, (doc_id, n)
            gt, gd = got[(doc_id, n)]
            assert gt == pytest.approx(top, abs=1e-9), (doc_id, n)
            assert gd == pytest.approx(dup, abs=1e-9), (doc_id, n)
    # docs shorter than n words emit no row for that n (never negative
    # sequence artifacts), and empty docs emit none at all
    assert (5, 2) not in got and (6, 2) not in got
    assert (6, 3) not in got


def test_ngram_repetition_spam_doc_saturates(spark, docs_df):
    # doc 1 is 'spam' x10: every 2-gram is 'spam spam' (9 occurrences,
    # 9 chars each) over denom 49 -> top == dup == 81/49
    rows = {(r["doc_id"], r["n"]): r
            for r in Q.ngram_repetition(docs_df).collect()}
    r = rows[(1, 2)]
    assert r["top_ngram_char_frac"] == pytest.approx(round(81 / 49, 4))
    assert r["dup_ngram_char_frac"] == pytest.approx(round(81 / 49, 4))


def test_gopher_plan_stays_native(docs_df):
    # one narrow projection: no exchange, no python udf
    plan = Q.gopher_doc_metrics(docs_df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan


def _py_fold_keys(words, n, with_len=True):
    """Independent replay of ngram_hash_folds for one n."""
    import hashlib

    P = Q.NGRAM_PRIME

    def consts(lane):
        c = int(hashlib.md5(lane.encode()).hexdigest()[:8], 16) \
            % (P - 2) + 2
        out, acc = [], 1
        for _ in range(n):
            out.append(acc)
            acc = (acc * c) % P
        return out

    c1, c2 = consts("ngram-lane1"), consts("ngram-lane2")
    hx = [hashlib.md5(w.encode()).hexdigest() for w in words]
    x1 = [int(h[0:15], 16) % P for h in hx]
    x2 = [int(h[16:31], 16) % P for h in hx]
    keys, lens = [], []
    for i in range(max(len(words) - n + 1, 0)):
        h1 = sum(x1[i + k] * c1[k] for k in range(n)) % P
        h2 = sum(x2[i + k] * c2[k] for k in range(n)) % P
        keys.append(h1 * (1 << 31) + h2)
        lens.append(sum(len(w) for w in words[i:i + n]) + n - 1)
    return (keys, lens) if with_len else (keys, None)


def test_ngram_hash_folds_match_python_replay(spark):
    """Key/length parity of the shared polynomial fold vs an
    independent Python replay — incl. unicode words, docs shorter
    than n, and the multi-n shared chain."""
    from pyspark.sql import functions as F

    rows = [
        (0, ["the", "quick", "brown", "fox", "the", "quick"]),
        (1, ["spam"] * 10),
        (2, ["café", "naïve", "日本語", "x"]),
        (3, ["one"]),            # shorter than every n
        (4, []),                 # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, w array<string>")
    dg = df.select("doc_id", Q.ngram_digests(F.col("w")).alias("_dg"),
                   Q.word_length_lane(F.col("w")).alias("_wl"))
    x1, x2 = Q.ngram_lanes_from_digests(F.col("_dg"))
    lanes = dg.select("doc_id", x1.alias("_x1"), x2.alias("_x2"), "_wl")
    ns = (2, 3, 4)
    sel = [F.col("doc_id")]
    for n, keys, lens in Q.ngram_hash_folds(
            F.col("_x1"), F.col("_x2"), ns, wl=F.col("_wl")):
        sel += [keys.alias(f"k{n}"), lens.alias(f"l{n}")]
    got = {r["doc_id"]: r for r in lanes.select(*sel).collect()}
    for doc_id, words in rows:
        for n in ns:
            ek, el = _py_fold_keys(words, n)
            assert got[doc_id][f"k{n}"] == ek, (doc_id, n)
            assert got[doc_id][f"l{n}"] == el, (doc_id, n)
    # no wl lane -> lens slot is None, keys unchanged
    [(_, k5, none)] = Q.ngram_hash_folds(
        F.col("_x1"), F.col("_x2"), (5,))
    assert none is None
    got5 = {r["doc_id"]: r["k"]
            for r in lanes.select("doc_id", k5.alias("k")).collect()}
    for doc_id, words in rows:
        assert got5[doc_id] == _py_fold_keys(words, 5, False)[0]
