"""DocumentRAG family vs independent Python derivations of the reference
semantics (retrieval/document_rag/document_rag.py, rerank.py;
query/doc_embeddings + storage/doc_embeddings contracts)."""

import math
import re

import numpy as np
import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.docrag import (
    assemble_context,
    bm25_topk,
    concept_vector_matches,
    document_rag_retrieve,
    keyword_index,
    mmr_select,
    query_chunk_embeddings,
    rrf_fuse,
    store_chunk_embeddings,
)
from trustgraph_spark.operators.embeddings import HashEmbedder


# --- fixtures ---------------------------------------------------------------


CHUNKS = [
    ("c01", "spark shuffle join window aggregate"),
    ("c02", "spark shuffle join window"),
    ("c03", "hash table probe build side"),
    ("c04", "stream watermark late data window"),
    ("c05", "vector cosine similarity search"),
    ("c06", "vector index probe centroid"),
    ("c07", "filter pushdown parquet scan"),
    ("c08", "broadcast join small dimension"),
    ("c09", "broadcast join small dimension table"),
    ("c10", "completely unrelated llama text"),
]


@pytest.fixture(scope="module")
def chunks(spark):
    df = spark.createDataFrame(CHUNKS, "chunk_id string, text string").cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def chunk_store(spark, chunks):
    st = store_chunk_embeddings(chunks, embedder=HashEmbedder(dim=32)).cache()
    st.count()
    return st


def _np_embed(texts, dim=32):
    emb = HashEmbedder(dim=dim)
    import pandas as pd

    return emb.embed(pd.Series(texts))


def _cos(a, b):
    na, nb = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0 or nb == 0:
        return 0.0
    return float(np.dot(a, b) / (na * nb))


# --- store + dense query ----------------------------------------------------


def test_store_drops_empty_chunk_ids(spark):
    df = spark.createDataFrame(
        [("", "dropped"), (None, "dropped"), ("ok", "kept text")],
        "chunk_id string, text string",
    )
    out = store_chunk_embeddings(df, embedder=HashEmbedder(dim=8)).collect()
    assert [r.chunk_id for r in out] == ["ok"]
    assert out[0].collection == "default"
    assert abs(sum(v * v for v in out[0].vector) - 1.0) < 1e-5


def test_query_chunk_embeddings_matches_numpy_topk(spark, chunks, chunk_store):
    qtexts = ["spark join window", "vector search probe"]
    qv = _np_embed(qtexts)
    queries = spark.createDataFrame(
        [(f"q{i}", [float(x) for x in qv[i]]) for i in range(len(qtexts))],
        "query_id string, query_vector array<float>",
    )
    got = {
        (r.query_id, r.rank): (r.chunk_id, round(r.score, 5))
        for r in query_chunk_embeddings(chunk_store, queries, limit=3).collect()
    }
    corpus = _np_embed([t for _, t in CHUNKS])
    for qi in range(len(qtexts)):
        scored = sorted(
            ((-_cos(qv[qi], corpus[ci]), CHUNKS[ci][0]) for ci in range(len(CHUNKS)))
        )
        for rank in range(1, 4):
            exp_id = scored[rank - 1][1]
            exp_sc = round(-scored[rank - 1][0], 5)
            assert got[(f"q{qi}", rank)] == (exp_id, exp_sc)


def test_query_unknown_collection_empty(chunk_store, spark):
    queries = spark.createDataFrame(
        [("q0", [1.0] * 32)], "query_id string, query_vector array<float>"
    )
    out = query_chunk_embeddings(chunk_store, queries, collection="nope")
    assert out.count() == 0


def test_concept_matches_first_seen_dedup(spark, chunk_store):
    """per_concept_limit derivation + first-seen-in-concept-order dedup,
    vs a direct Python replay of the reference's loop."""
    qtexts = {
        "qa": ["spark join window", "broadcast join dimension"],
        "qb": ["vector search probe"],
    }
    rows = []
    for qid, cs in qtexts.items():
        vecs = _np_embed(cs)
        for i, _ in enumerate(cs):
            rows.append((qid, i, [float(x) for x in vecs[i]]))
    cv = spark.createDataFrame(
        rows, "query_id string, concept_idx int, query_vector array<float>"
    )
    fetch_limit = 4
    got = {
        (r.query_id, r.chunk_id): (round(r.score, 5), r.pos)
        for r in concept_vector_matches(
            chunk_store, cv, fetch_limit=fetch_limit
        ).collect()
    }

    corpus = _np_embed([t for _, t in CHUNKS])
    ids = [cid for cid, _ in CHUNKS]
    expected = {}
    for qid, cs in qtexts.items():
        per_concept = max(1, fetch_limit // len(cs))
        seen = {}
        pos = 0
        for vec in _np_embed(cs):
            ranked = sorted(
                range(len(ids)), key=lambda ci: (-_cos(vec, corpus[ci]), ids[ci])
            )[:per_concept]
            for ci in ranked:
                if ids[ci] not in seen:
                    pos += 1
                    seen[ids[ci]] = (round(_cos(vec, corpus[ci]), 5), pos)
        for cid, v in seen.items():
            expected[(qid, cid)] = v
    assert got == expected


# --- BM25 -------------------------------------------------------------------


def _py_bm25(query, k1=1.2, b=0.75):
    tok = lambda s: [t for t in re.split(r"[^a-z0-9_]+", s.lower()) if t]
    docs = {cid: tok(t) for cid, t in CHUNKS}
    N = len(docs)
    avgdl = sum(len(v) for v in docs.values()) / N
    scores = {}
    for term in set(tok(query)):
        df = sum(1 for v in docs.values() if term in v)
        if df == 0:
            continue
        idf = math.log(1 + (N - df + 0.5) / (df + 0.5))
        for cid, toks in docs.items():
            tf = toks.count(term)
            if tf == 0:
                continue
            scores[cid] = scores.get(cid, 0.0) + idf * tf * (k1 + 1) / (
                tf + k1 * (1 - b + b * len(toks) / avgdl)
            )
    return scores


def test_bm25_matches_python(spark, chunks):
    postings = keyword_index(chunks)
    queries = spark.createDataFrame(
        [("q0", "spark join window"), ("q1", "vector probe")],
        "query_id string, query string",
    )
    got = {
        (r.query_id, r.chunk_id): round(r.score, 6)
        for r in bm25_topk(postings, queries, limit=100).collect()
    }
    for qid, qtext in [("q0", "spark join window"), ("q1", "vector probe")]:
        exp = {k: round(v, 6) for k, v in _py_bm25(qtext).items()}
        got_q = {cid: s for (q, cid), s in got.items() if q == qid}
        assert got_q == exp, qid


def test_bm25_rank_and_limit(spark, chunks):
    postings = keyword_index(chunks)
    queries = spark.createDataFrame(
        [("q0", "broadcast join dimension")], "query_id string, query string"
    )
    out = bm25_topk(postings, queries, limit=2).collect()
    assert len(out) == 2
    assert [r.rank for r in sorted(out, key=lambda r: r.rank)] == [1, 2]
    # c08 shorter than c09 with same terms -> higher length-normalized score
    assert sorted(r.chunk_id for r in out) == ["c08", "c09"]


# --- RRF fusion -------------------------------------------------------------


def test_rrf_fuse_matches_reference_formula(spark):
    a = spark.createDataFrame(
        [("q", "x", 1), ("q", "y", 2), ("q", "z", 3)],
        "query_id string, chunk_id string, rank int",
    )
    b = spark.createDataFrame(
        [("q", "y", 1), ("q", "w", 2)],
        "query_id string, chunk_id string, rank int",
    )
    out = {
        r.chunk_id: (round(r.score, 8), r.rank)
        for r in rrf_fuse([a, b], [1.0, 0.5], limit=10).collect()
    }
    exp_scores = {
        "x": 1.0 / 61,
        "y": 1.0 / 62 + 0.5 / 61,
        "z": 1.0 / 63,
        "w": 0.5 / 62,
    }
    order = sorted(exp_scores, key=lambda c: (-exp_scores[c], c))
    for i, cid in enumerate(order, start=1):
        assert out[cid] == (round(exp_scores[cid], 8), i)


# --- MMR --------------------------------------------------------------------


def _py_mmr(cands, limit, lam=0.7, tow=1.0):
    """Independent replay of reference rerank.py mmr_select semantics."""
    tok = lambda s: set(t.lower() for t in re.findall(r"[A-Za-z0-9_]+", s or ""))
    jac = lambda a, b: len(a & b) / len(a | b) if a and b else 0.0
    scores = [c[2] for c in cands]
    lo, hi = min(scores), max(scores)
    norm = [0.5] * len(cands) if hi == lo else [(s - lo) / (hi - lo) for s in scores]
    toks = [tok(c[1]) for c in cands]
    remaining = list(range(len(cands)))
    sel = []
    while remaining and len(sel) < limit:
        best_i, best = 0, None
        for pos, idx in enumerate(remaining):
            pen = (
                max(min(1.0, tow * jac(toks[idx], toks[s])) for s in sel)
                if sel
                else 0.0
            )
            v = lam * norm[idx] - (1 - lam) * pen
            if best is None or v > best:
                best, best_i = v, pos
        sel.append(remaining.pop(best_i))
    return [cands[i][0] for i in sel]


def test_mmr_select_matches_python(spark):
    cands = [
        ("c1", "spark shuffle join window", 0.95),
        ("c2", "spark shuffle join window aggregate", 0.93),  # near-dup of c1
        ("c3", "vector cosine search", 0.80),
        ("c4", "stream watermark", 0.75),
        ("c5", "spark shuffle join", 0.90),  # near-dup again
    ]
    # candidates sorted by (score desc, chunk_id asc) == input order here
    df = spark.createDataFrame(
        [("q", cid, sc, txt) for cid, txt, sc in cands],
        "query_id string, chunk_id string, score double, text string",
    )
    out = mmr_select(df, limit=3, lambda_mult=0.4).orderBy("mmr_rank").collect()
    ordered = sorted(cands, key=lambda c: (-c[2], c[0]))
    exp = _py_mmr([(c[0], c[1], c[2]) for c in ordered], 3, lam=0.4)
    assert [r.chunk_id for r in out] == exp
    # diversity must kick in: not simply the 3 highest scores
    assert exp != [c[0] for c in ordered[:3]]
    assert [r.mmr_rank for r in out] == [1, 2, 3]


def test_mmr_all_equal_scores_normalize_half(spark):
    df = spark.createDataFrame(
        [("q", f"c{i}", 1.0, t) for i, t in enumerate(["a b", "a b", "x y"])],
        "query_id string, chunk_id string, score double, text string",
    )
    out = mmr_select(df, limit=2).orderBy("mmr_rank").collect()
    # first pick c0 (tie -> chunk_id order); second pick must be the
    # diverse "x y" chunk, not the duplicate "a b"
    assert [r.chunk_id for r in out] == ["c0", "c2"]


# --- the full loop ----------------------------------------------------------


def test_retrieve_vector_mode_end_to_end(spark, chunks, chunk_store):
    queries = spark.createDataFrame(
        [("q0", "spark join window")], "query_id string, query string"
    )
    out = document_rag_retrieve(
        queries, chunk_store, chunks, doc_limit=3, embedder=HashEmbedder(dim=32)
    ).collect()
    assert len(out) == 3
    got_ids = {r.chunk_id for r in out}
    qv = _np_embed(["spark join window"])[0]
    corpus = _np_embed([t for _, t in CHUNKS])
    exp = {
        CHUNKS[i][0]
        for i in sorted(
            range(len(CHUNKS)), key=lambda ci: (-_cos(qv, corpus[ci]), CHUNKS[ci][0])
        )[:3]
    }
    assert got_ids == exp
    assert all(r.text for r in out)


def test_retrieve_fetch_count_derivation(spark, chunks, chunk_store):
    from trustgraph_spark.operators.admin import OverlapReranker

    queries = spark.createDataFrame(
        [("q0", "spark join window")], "query_id string, query string"
    )
    # no reranker -> fetch exactly doc_limit
    plain = document_rag_retrieve(
        queries, chunk_store, chunks, doc_limit=2, embedder=HashEmbedder(dim=32)
    )
    assert plain.count() == 2
    # reranker wired -> pool is OVERFETCH_FACTOR*doc_limit, output doc_limit
    rr = document_rag_retrieve(
        queries, chunk_store, chunks, doc_limit=2, reranker=OverlapReranker(),
        embedder=HashEmbedder(dim=32),
    )
    assert rr.count() == 2


def test_retrieve_keyword_and_hybrid(spark, chunks, chunk_store):
    postings = keyword_index(chunks)
    queries = spark.createDataFrame(
        [("q0", "broadcast join dimension")], "query_id string, query string"
    )
    kw = document_rag_retrieve(
        queries, chunk_store, chunks, doc_limit=2, mode="keyword",
        postings=postings,
    ).collect()
    assert {r.chunk_id for r in kw} == {"c08", "c09"}

    hy = document_rag_retrieve(
        queries, chunk_store, chunks, doc_limit=4, mode="hybrid",
        postings=postings, fetch_limit=6, embedder=HashEmbedder(dim=32),
    ).collect()
    assert len(hy) == 4
    assert {"c08", "c09"} <= {r.chunk_id for r in hy}

    with pytest.raises(ValueError):
        document_rag_retrieve(
            queries, chunk_store, chunks, doc_limit=2, mode="keyword"
        )


def test_retrieve_missing_chunk_text_drops(spark, chunks, chunk_store):
    """fetch_chunk-failure analog: a chunk in the store but absent from the
    text table silently drops out (reference document_rag.py:199-206)."""
    some = chunks.where(F.col("chunk_id") != "c01")
    queries = spark.createDataFrame(
        [("q0", "spark shuffle join window aggregate")],
        "query_id string, query string",
    )
    out = document_rag_retrieve(
        queries, chunk_store, some, doc_limit=10, embedder=HashEmbedder(dim=32)
    ).collect()
    assert "c01" not in {r.chunk_id for r in out}


def test_assemble_context_order(spark):
    sel = spark.createDataFrame(
        [("q", "b", 0.5, 2, "second"), ("q", "a", 0.9, 1, "first")],
        "query_id string, chunk_id string, score double, final_rank int, text string",
    )
    out = assemble_context(sel).collect()[0]
    assert out.chunk_ids == ["a", "b"]
    assert out.context == "first\n\nsecond"
    assert out.n_chunks == 2


def test_retrieve_mmr_diversity(spark):
    """Near-duplicate top chunks: MMR selection must skip the duplicate
    that plain top-k would keep."""
    rows = [
        ("d1", "alpha beta gamma delta"),
        ("d2", "alpha beta gamma delta epsilon"),
        ("d3", "zeta eta theta"),
        ("d4", "iota kappa lambda"),
    ]
    chunks = spark.createDataFrame(rows, "chunk_id string, text string")
    store = store_chunk_embeddings(chunks, embedder=HashEmbedder(dim=16))
    queries = spark.createDataFrame(
        [("q", "alpha beta gamma")], "query_id string, query string"
    )
    plain = document_rag_retrieve(
        queries, store, chunks, doc_limit=2, fetch_limit=4,
        embedder=HashEmbedder(dim=16),
    ).collect()
    assert {r.chunk_id for r in plain} == {"d1", "d2"}
    mmr = document_rag_retrieve(
        queries, store, chunks, doc_limit=2, fetch_limit=4,
        diversity="mmr", diversity_lambda=0.5, embedder=HashEmbedder(dim=16),
    ).collect()
    ids = {r.chunk_id for r in mmr}
    assert len(ids) == 2 and not ({"d1", "d2"} <= ids)


def test_chunk_ann_index_recall(spark, chunks, chunk_store, tmp_path):
    """IVF chunk index: top-k through the partitioned index with full
    probing equals the exact brute-force top-k; fewer probes trade
    recall."""
    from trustgraph_spark.operators.docrag import (
        build_chunk_ann_index,
        query_chunk_embeddings_ivf,
    )

    path = str(tmp_path / "chunk_ivf")
    assigned, centroids = build_chunk_ann_index(chunk_store, path, n_lists=4)
    assert "list_id" in assigned.columns

    qv = _np_embed(["spark join window"])
    queries = spark.createDataFrame(
        [("q0", [float(x) for x in qv[0]])],
        "query_id string, query_vector array<float>",
    )
    exact = {
        (r.chunk_id, round(r.score, 5))
        for r in query_chunk_embeddings(chunk_store, queries, limit=3).collect()
    }
    full_probe = {
        (r.chunk_id, round(r.score, 5))
        for r in query_chunk_embeddings_ivf(
            assigned, centroids, queries, limit=3, nprobe=4
        ).collect()
    }
    assert full_probe == exact


def test_retrieve_rerank_same_query_text_distinct_ids(spark, chunks, chunk_store):
    """Two query_ids with IDENTICAL query text must keep independent
    rerank cap/limit windows (partition on query_id, not the text)."""
    from trustgraph_spark.operators.admin import OverlapReranker

    queries = spark.createDataFrame(
        [("qa", "spark join window"), ("qb", "spark join window")],
        "query_id string, query string",
    )
    out = document_rag_retrieve(
        queries, chunk_store, chunks, doc_limit=2,
        reranker=OverlapReranker(), embedder=HashEmbedder(dim=32),
    ).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, set()).add(r.chunk_id)
    assert per_q["qa"] == per_q["qb"]
    assert len(per_q["qa"]) == 2


def test_duplicate_store_rows_fill_one_topk_slot(spark, chunks):
    """Streaming re-ingest appends duplicate chunk rows; the dense query
    dedups per chunk_id before ranking (review r3)."""
    st = store_chunk_embeddings(chunks, embedder=HashEmbedder(dim=32))
    doubled = st.unionByName(st.where(F.col("chunk_id") == "c02"))
    qv = _np_embed(["spark join window"])
    queries = spark.createDataFrame(
        [("q0", [float(x) for x in qv[0]])],
        "query_id string, query_vector array<float>",
    )
    top2 = [r.chunk_id for r in query_chunk_embeddings(doubled, queries, limit=2)
            .orderBy("rank").collect()]
    assert top2 == ["c02", "c01"]  # not c02 twice
