"""Dedup operators vs independent brute-force Python derivations on a
seeded random corpus — Jaccard values and MinHash-LSH candidate recall."""

import hashlib
import random
import re

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.dedup import (
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
)


def _norm_tokens(text: str) -> list[str]:
    return [t for t in re.sub(r"\s+", " ", text.lower()).strip().split(" ") if t]


def _shingles(text: str, n=3) -> set:
    toks = _norm_tokens(text)
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def _jaccard(a: set, b: set) -> float:
    if not a or not b:
        return 0.0
    return len(a & b) / len(a | b)


@pytest.fixture(scope="module")
def random_docs(spark):
    rng = random.Random(123)
    vocab = [f"w{i}" for i in range(40)]
    rows = []
    for i in range(60):
        n = rng.randint(5, 30)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(n))))
    # plant near-duplicates
    rows.append((100, rows[0][1]))
    toks = rows[1][1].split()
    toks[0] = "CHANGED"
    rows.append((101, " ".join(toks)))
    df = spark.createDataFrame(rows, "doc_id long, text string").cache()
    df.count()
    return df, rows


def test_jaccard_matches_bruteforce(random_docs):
    df, rows = random_docs
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=0.4, max_shingle_freq=10**6).collect()
    }
    sh = {i: _shingles(t) for i, t in rows}
    expected = {}
    ids = sorted(sh)
    for i_idx, a in enumerate(ids):
        for b in ids[i_idx + 1 :]:
            j = _jaccard(sh[a], sh[b])
            if j >= 0.4 and sh[a] and sh[b]:
                expected[(a, b)] = round(j, 6)
    assert set(got) == set(expected)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-6)
    assert (0, 100) in got and got[(0, 100)] == 1.0


def test_minhash_lsh_bruteforce_recall(random_docs):
    df, rows = random_docs
    cands = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(df, num_hashes=16, bands=4).collect()}
    # exact dup always collides
    assert (0, 100) in cands

    # brute-force the same MinHash construction: any shared band -> candidate
    def sig(text):
        s = _shingles(text)
        return [
            min(hashlib.md5(f"{x}#{i}".encode()).hexdigest() for x in s) if s else None
            for i in range(16)
        ]

    sigs = {i: sig(t) for i, t in rows if _shingles(t)}
    expected = set()
    ids = sorted(sigs)
    for i_idx, a in enumerate(ids):
        for b in ids[i_idx + 1 :]:
            for band in range(4):
                if sigs[a][band * 4 : band * 4 + 4] == sigs[b][band * 4 : band * 4 + 4]:
                    expected.add((a, b))
                    break
    assert cands == expected


def test_prefix_filter_equals_exact_path(spark):
    """PPJoin prefix filtering is lossless: same result set as the
    inverted-index exact path on a corpus with planted near-dups, across
    thresholds."""
    from trustgraph_spark.operators.dedup import (
        _ngram_jaccard_pairs_invindex,
        ngram_jaccard_pairs_prefix,
    )
    import random

    rng = random.Random(11)
    words = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(60):
        base = [rng.choice(words) for _ in range(30)]
        docs.append((f"d{i:03d}", " ".join(base)))
        if i % 4 == 0:  # planted near-duplicate: mutate a couple tokens
            mut = list(base)
            for _ in range(2):
                mut[rng.randrange(len(mut))] = rng.choice(words)
            docs.append((f"d{i:03d}x", " ".join(mut)))
    df = spark.createDataFrame(docs, "doc_id string, text string")

    for t in (0.3, 0.6, 0.8):
        exact = {
            (r.id_a, r.id_b, r.jaccard)
            for r in _ngram_jaccard_pairs_invindex(df, threshold=t, max_shingle_freq=50).collect()
        }
        pref = {
            (r.id_a, r.id_b, r.jaccard)
            for r in ngram_jaccard_pairs_prefix(df, threshold=t, max_shingle_freq=50).collect()
        }
        assert pref == exact, f"threshold {t}: prefix {len(pref)} vs exact {len(exact)}"
    assert exact, "planted near-dups must produce pairs at t=0.8"
