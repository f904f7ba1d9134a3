"""Dedup family + text analysis operators."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup_groups,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    shingles,
    simhash,
)
from trustgraph_spark.operators.textstats import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_count,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
        (3, "the quick brown fox leaps over the lazy dog"),  # near dup
        (4, "completely different content about spark engines and shuffles"),
        (5, "der hund läuft durch die stadt und ist nicht allein"),
        (6, "el perro corre por la ciudad y es muy rapido para todos"),
        (7, "short"),
        (8, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup(docs):
    groups = exact_dedup_groups(docs).collect()
    assert len(groups) == 1
    assert groups[0].n_docs == 2
    assert groups[0].representative == 1


def test_shingles_short_doc(docs):
    sh = shingles(docs, n=3)
    assert sh.where(F.col("doc_id") == 7).count() == 0  # < 3 tokens
    assert sh.where(F.col("doc_id") == 8).count() == 0


def test_ngram_jaccard(docs):
    pairs = {(r.id_a, r.id_b): r.jaccard for r in ngram_jaccard_pairs(docs, threshold=0.3).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    # one substituted token out of 9: 4 shared shingles of 7 -> 4/10
    assert (1, 3) in pairs and pairs[(1, 3)] == pytest.approx(0.4)
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_recall(docs):
    # exact dups always collide in every band
    cands = {(r.id_a, r.id_b) for r in minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in cands
    # signature determinism
    s1 = minhash_signatures(docs).where(F.col("doc_id") == 1).collect()[0].sig
    s2 = minhash_signatures(docs).where(F.col("doc_id") == 2).collect()[0].sig
    assert s1 == s2


def test_simhash_similarity(docs):
    fps = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    ham_dup = bin(fps[1] ^ fps[3]).count("1")
    ham_diff = bin(fps[1] ^ fps[4]).count("1")
    assert ham_dup < ham_diff  # near-dup closer than unrelated


def test_embedding_near_dup(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.5] * 16),
        (2, [1.0, 0.01, 0.0, 0.5] * 16),  # near dup of 1
        (3, [-1.0, 1.0, 0.0, -0.5] * 16),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    pairs = {(r.id_a, r.id_b) for r in
             embedding_near_dup_pairs(emb, threshold=0.99, dim=64).collect()}
    assert (1, 2) in pairs
    assert not any(3 in p for p in pairs)


def test_token_count(docs):
    tc = {r.doc_id: r for r in token_count(docs).collect()}
    assert tc[1].n_tokens_ws == 9
    assert tc[7].n_tokens_ws == 1
    assert tc[8].n_tokens_ws == 0


def test_quality_score(docs):
    qs = {r.doc_id: r for r in quality_score(docs).collect()}
    assert qs[1].stopword_ratio > 0.2  # 'the' x2, 'over' -> >= 2/9
    assert qs[8].n_tokens == 0 and qs[8].stopword_ratio == 0.0
    assert 0 <= qs[4].alpha_ratio <= 1


def test_language_id(docs):
    lid = {r.doc_id: r.lang_pred for r in language_id(docs).collect()}
    assert lid[1] == "en"
    assert lid[5] == "de"
    assert lid[6] == "es"
    assert lid[7] == "und"


def test_language_id_cjk(spark):
    df = spark.createDataFrame([(1, "数据处理系统非常快速")], "doc_id long, text string")
    assert language_id(df).collect()[0].lang_pred == "zh"


def test_doc_fingerprint_order_insensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma alpha beta"), (3, "alpha beta delta")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in doc_fingerprint(df).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[3]


def test_incremental_lsh_candidates(spark):
    """Incremental dedup (dedup.incremental_lsh_candidates): a new
    batch probes the persisted archive band index plus itself; exact
    replicas collide on every band; labels distinguish the sides; the
    archive index alone is sufficient — no archive text involved."""
    from trustgraph_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_index,
        minhash_lsh_candidates,
    )

    arch = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta"),
         (2, "one two three four five six seven")],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta"),   # dup of 1
         (11, "alpha beta gamma delta epsilon zeta"),   # dup of 1 + of 10
         (12, "totally different words entirely here")],
        "doc_id long, text string")
    idx = minhash_band_index(arch)
    got = {(r["new_id"], r["match_id"], r["source"]) for r in
           incremental_lsh_candidates(idx, batch).collect()}
    assert (10, 1, "archive") in got and (11, 1, "archive") in got
    assert (10, 11, "batch") in got
    assert not any(n == 12 or m == 12 for n, m, _ in got)
    # union-consistency: running plain LSH over archive+batch finds a
    # superset projection of the same cross pairs
    full = {(a, b) for r in minhash_lsh_candidates(
        arch.unionByName(batch)).collect()
        for a, b in [(r["id_a"], r["id_b"])]}
    assert all((min(n, m), max(n, m)) in full
               for n, m, _ in got)


def test_incremental_lsh_rejects_stale_scheme_index(spark):
    """An archive band index persisted under the pre-affine scheme
    (joined md5 hex band_sigs) would never match any probe — the
    default scheme guard turns that silent missed-dedup into a loud
    ValueError; validate_archive_scheme=False keeps the legacy lazy
    path."""
    import pytest

    from trustgraph_spark.operators.dedup import incremental_lsh_candidates

    stale = spark.createDataFrame(
        [(1, 0, "d41d8cd98f00b204e9800998ecf8427e|"
                "9e107d9d372bb6826bd81d3542a419d6")],
        "doc_id long, band int, band_sig string")
    batch = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta")],
        "doc_id long, text string")
    with pytest.raises(ValueError, match="affine-family scheme"):
        incremental_lsh_candidates(stale, batch)
    # opt-out stays lazy and simply matches nothing vs the archive
    got = incremental_lsh_candidates(
        stale, batch, validate_archive_scheme=False).collect()
    assert not any(r["source"] == "archive" for r in got)
