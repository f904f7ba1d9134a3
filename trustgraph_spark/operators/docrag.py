"""DocumentRAG family: chunk-embeddings store, doc-embeddings top-k query,
keyword (BM25) index/query, weighted-RRF hybrid fusion, MMR diversity
selection, and the batched retrieve loop (seed chunks -> rerank -> context
assembly).

Reference behavior reproduced (not code):
- storage/doc_embeddings/qdrant/write.py:86-115 — store one point per
  chunk (chunk_id payload, vector), skipping empty chunk_ids and empty
  vectors; collection-scoped.
- query/doc_embeddings/qdrant/service.py:42-80 — vector in, top-``limit``
  (chunk_id, cosine score) out; unknown collection -> empty.
- retrieval/document_rag/document_rag.py — Query.get_vector_matches
  (per-concept top-k with per_concept_limit = max(1, fetch_limit //
  n_concepts), then first-seen dedup by chunk_id in concept order),
  rrf_fuse:40-59 (weighted Reciprocal Rank Fusion, RRF_K=60, first-seen
  object per chunk), OVERFETCH_FACTOR=3 fetch-count derivation
  (document_rag.py:325-331), retrieval modes vector/keyword/hybrid
  (get_docs:160-215; keyword failure degrades hybrid to vector-only).
- retrieval/document_rag/rerank.py — min-max score normalization
  (ties -> 0.5) and greedy MMR with token-Jaccard diversity penalty.

Spark-first design: the unit of parallelism is the query BATCH.  The
reference processes one request at a time against a vector-store service;
here every stage is a DataFrame op keyed by (query_id, ...), so thousands
of RAG queries execute as ONE job against a 100-TB chunk store — the
corpus is scanned once per stage regardless of batch size, per-query
work is a window/groupBy partition, and the small per-query candidate
pools (<= fetch_limit rows) make the inherently sequential MMR step a
grouped applyInPandas over each query's own candidates (bounded memory,
fully parallel across queries).

The sparse path replaces the reference's keyword-index service
(storage/kw_index/fts5/service.py — SQLite FTS5 BM25 over chunk text,
single local file) with a DataFrame-native BM25 (Okapi, k1=1.2 b=0.75)
posting-list index: term df / corpus stats are precomputed at index build
so query time is one semi-join on query terms plus a per-chunk agg, and
the index shards with the cluster instead of living in one SQLite file.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .embeddings import _cosine_expr, embed_texts

#: candidate-pool multiple fetched ahead of reranking when the caller does
#: not pass fetch_limit (document_rag.py:32 OVERFETCH_FACTOR)
OVERFETCH_FACTOR = 3
#: Reciprocal Rank Fusion constant (Cormack et al., SIGIR 2009;
#: document_rag.py:36)
RRF_K = 60


# ---------------------------------------------------------------------------
# chunk-embeddings store + dense query
# ---------------------------------------------------------------------------


def store_chunk_embeddings(
    chunks: DataFrame,
    embedder=None,
    id_col: str = "chunk_id",
    text_col: str = "text",
    collection: str = "default",
) -> DataFrame:
    """Chunk texts -> the doc-embeddings store table
    (collection, chunk_id, vector).  Embedding runs through the sanctioned
    mapInPandas seam (embed_texts); empty chunk_ids and empty texts are
    dropped exactly as the reference store skips them
    (write.py:88-94).  Persist with Warehouse.write(...,
    partition_by=["collection"]) so per-collection queries prune."""
    kept = chunks.where(
        F.col(id_col).isNotNull() & (F.col(id_col) != "")
    )
    emb = embed_texts(kept, text_col=text_col, out_col="vector", embedder=embedder)
    return emb.where(F.size("vector") > 0).select(
        F.lit(collection).alias("collection"),
        F.col(id_col).alias("chunk_id"),
        "vector",
    )


def query_chunk_embeddings(
    store: DataFrame,
    queries: DataFrame,
    limit: int = 10,
    collection: str | None = "default",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """Dense top-k over the chunk store: per query vector, the ``limit``
    highest-cosine chunks (service.py:61-77).  The (small) query batch is
    broadcast against the corpus — one store scan for the whole batch, no
    corpus shuffle; per-query ranking is a window with deterministic
    (score desc, chunk_id asc) tie-break.  Returns
    (query_id, chunk_id, score, rank)."""
    src = store
    if collection is not None and "collection" in store.columns:
        src = store.where(F.col("collection") == collection)
    joined = src.alias("v").join(
        F.broadcast(queries.select(query_id_col, query_vec_col).alias("q"))
    )
    scored = joined.select(
        F.col(f"q.{query_id_col}").alias("query_id"),
        F.col("v.chunk_id").alias("chunk_id"),
        _cosine_expr(F.col("v.vector"), F.col(f"q.{query_vec_col}")).alias("score"),
    )
    # per-chunk dedup BEFORE ranking: the streaming ingest appends a second
    # copy on re-ingest (deduplicated at query time, streaming.py) — without
    # this a duplicate would fill two top-k slots
    best = scored.groupBy("query_id", "chunk_id").agg(F.max("score").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("chunk_id"))
    return (
        best.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= limit)
    )


def build_chunk_ann_index(
    store: DataFrame,
    path: str,
    n_lists: int = 16,
    collection: str | None = "default",
):
    """The 100-TB dense path for the chunk store: train an IVF quantizer
    (distributed Lloyd's on a bounded sample — operators/embeddings
    ivf_kmeans), assign every chunk vector to its nearest list, and write
    the index partitioned by list_id so queries dynamic-partition-prune
    to their probed lists.  Returns (assigned_df_read_back, centroids).
    The brute-force query_chunk_embeddings stays the exact baseline; this
    is its sublinear-scan drop-in for corpora where scanning every vector
    per query batch stops being acceptable."""
    from .embeddings import ivf_assign, ivf_kmeans, ivf_write

    src = store
    if collection is not None and "collection" in store.columns:
        src = store.where(F.col("collection") == collection)
    centroids = ivf_kmeans(src, n_lists=n_lists, id_col="chunk_id", vec_col="vector")
    assigned = ivf_assign(src, centroids, vec_col="vector")
    ivf_write(assigned, path)
    spark = store.sparkSession
    return spark.read.parquet(path), centroids


def query_chunk_embeddings_ivf(
    assigned: DataFrame,
    centroids,
    queries: DataFrame,
    limit: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """IVF variant of query_chunk_embeddings: probe the nprobe nearest
    lists per query and rerank exactly inside them (same output schema —
    query_id, chunk_id, score, rank).  Recall/latency knob is nprobe."""
    from .embeddings import ivf_topk

    return ivf_topk(
        assigned,
        centroids,
        queries,
        k=limit,
        nprobe=nprobe,
        id_col="chunk_id",
        vec_col="vector",
    )


def concept_vector_matches(
    store: DataFrame,
    concept_vecs: DataFrame,
    fetch_limit: int = 20,
    collection: str | None = "default",
) -> DataFrame:
    """The dense retrieval stage of the RAG loop
    (document_rag.py:113-146): ``concept_vecs`` carries one row per
    (query_id, concept_idx, query_vector); each concept fetches its own
    top per_concept_limit = max(1, fetch_limit // n_concepts(query)), then
    matches are deduped by chunk_id keeping the FIRST-SEEN occurrence in
    (concept order, rank order) — the score a chunk keeps is from the
    first concept that surfaced it, byte-matching the reference's dedup.

    Returns (query_id, chunk_id, score, pos) where pos is the chunk's
    position in the reference's concatenated first-seen candidate list —
    downstream RRF fusion ranks on it."""
    n_per_q = concept_vecs.groupBy("query_id").agg(
        F.count("*").alias("_n_concepts")
    )
    cv = concept_vecs.join(F.broadcast(n_per_q), "query_id").withColumn(
        "_pcl",
        F.greatest(F.lit(1), (F.lit(fetch_limit) / F.col("_n_concepts")).cast("int")),
    )

    src = store
    if collection is not None and "collection" in store.columns:
        src = store.where(F.col("collection") == collection)

    joined = src.alias("v").join(
        F.broadcast(cv.select("query_id", "concept_idx", "query_vector", "_pcl").alias("q"))
    )
    scored = joined.select(
        F.col("q.query_id").alias("query_id"),
        F.col("q.concept_idx").alias("concept_idx"),
        F.col("q._pcl").alias("_pcl"),
        F.col("v.chunk_id").alias("chunk_id"),
        _cosine_expr(F.col("v.vector"), F.col("q.query_vector")).alias("score"),
    )
    # duplicate store rows (streaming re-ingest) collapse before ranking
    scored = scored.groupBy("query_id", "concept_idx", "_pcl", "chunk_id").agg(
        F.max("score").alias("score")
    )
    w_c = Window.partitionBy("query_id", "concept_idx").orderBy(
        F.desc("score"), F.asc("chunk_id")
    )
    per_concept = scored.withColumn("crank", F.row_number().over(w_c)).where(
        F.col("crank") <= F.col("_pcl")
    )
    # first-seen dedup across concepts: order by (concept_idx, crank)
    w_d = Window.partitionBy("query_id", "chunk_id").orderBy(
        "concept_idx", "crank"
    )
    deduped = per_concept.withColumn("_rn", F.row_number().over(w_d)).where(
        F.col("_rn") == 1
    )
    w_pos = Window.partitionBy("query_id").orderBy("concept_idx", "crank")
    return deduped.withColumn("pos", F.row_number().over(w_pos)).select(
        "query_id", "chunk_id", "score", "pos"
    )


# ---------------------------------------------------------------------------
# sparse path: BM25 keyword index
# ---------------------------------------------------------------------------


def _terms(col):
    """lower + tokenize to maximal [a-z0-9_]+ runs; the reference
    tokenizer regex [A-Za-z0-9_]+ (rerank.py:22), shared by index and
    MMR diversity.  Extracting the token runs directly is exactly the
    complement-class split-and-drop-empties, and regexp_extract_all
    avoids java.util.String.split's per-call matcher/boxing overhead on
    a class regex — measured 22x (1.8s -> 0.08s over 2.7M tokens at
    sf1.0; literal-delimiter splits hit a fast path, class regexes do
    not)."""
    return F.regexp_extract_all(F.lower(col), F.lit(r"[a-z0-9_]+"), 0)


def keyword_index(
    chunks: DataFrame, id_col: str = "chunk_id", text_col: str = "text"
) -> DataFrame:
    """BM25 posting lists as a DataFrame: one row per (term, chunk_id)
    with term frequency, chunk length, per-term document frequency and
    corpus stats (n_docs, avgdl) denormalized onto every posting at index
    build — query-time scoring is then a single semi-join on query terms
    plus one per-chunk aggregation, no corpus-wide stats pass.  At 100 TB
    the index is partitioned by term hash (write with
    Warehouse.write_bucketed on ``term``) so a query touches only its
    terms' buckets."""
    # tf and dl are PER-CHUNK facts: compute them inside the row (sort
    # the term array, emit one (term, tf) struct per run boundary;
    # dl = array size) so the posting build never shuffles the exploded
    # token stream.  The earlier shape exploded 2.7M tokens into a
    # (chunk, term) groupBy, a dl groupBy, and joined both back — three
    # full-posting shuffles + two joins, 7.5s of the 7.8s bm25 query at
    # sf1.0.  Only the cross-chunk facts shuffle now: df is one
    # map-side-combinable count over the already-unique (chunk, term)
    # rows, broadcast back onto the postings (term vocabulary is the
    # small side at any corpus size that fits a broadcast; swap to a
    # shuffled join via session threshold when it does not).
    srt = F.array_sort(_terms(F.col(text_col)))
    n = F.size(F.col("_ts"))
    # run boundaries of the per-row sorted term array (guard: Spark
    # sequence(1, 0) counts DOWN — empty chunks need an empty list)
    bounds = F.when(n > 0, F.filter(
        F.sequence(F.lit(1), n),
        lambda i: (i == F.lit(1))
        | (F.element_at(F.col("_ts"), i)
           != F.element_at(F.col("_ts"), i - F.lit(1))),
    )).otherwise(F.array().cast("array<int>"))
    # boundary pairs -> (term, tf) structs; tf = next boundary - this one
    pairs = F.zip_with(
        F.col("_b"),
        F.concat(F.slice(F.col("_b"), 2,
                         F.greatest(F.size(F.col("_b")) - 1, F.lit(0))),
                 F.array(F.col("dl") + 1)),
        lambda s, e: F.struct(
            F.element_at(F.col("_ts"), s).alias("term"),
            (e - s).cast("bigint").alias("tf")),
    )
    tf = (
        chunks.select(F.col(id_col).alias("chunk_id"), srt.alias("_ts"))
        .select("chunk_id", F.size(F.col("_ts")).cast("bigint").alias("dl"),
                bounds.alias("_b"), "_ts")
        .select("chunk_id", "dl", F.explode_outer(pairs).alias("p"))
        .where(F.col("p").isNotNull())
        .select("chunk_id", "dl", F.col("p.term").alias("term"),
                F.col("p.tf").alias("tf")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    stats = tf.groupBy("chunk_id").agg(F.first("dl").alias("_dl")).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("_dl").alias("avgdl")
    )
    return (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .select("term", "chunk_id", "tf", "dl", "df", "n_docs", "avgdl")
    )


def bm25_topk(
    postings: DataFrame,
    queries: DataFrame,
    limit: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    query_id_col: str = "query_id",
    query_col: str = "query",
) -> DataFrame:
    """Okapi BM25 over the keyword_index postings for a batch of queries:
    idf = ln(1 + (N - df + .5)/(df + .5)), tf saturation with length
    normalization.  Query terms are exploded and broadcast; the postings
    join is an equi-join on term (bucket-pruned when the index is stored
    bucketed by term).  Returns (query_id, chunk_id, score, rank) with
    deterministic tie-break."""
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(F.array_distinct(_terms(F.col(query_col)))).alias("term"),
        )
    )
    hit = postings.join(F.broadcast(qterms), "term")
    contrib = hit.select(
        "query_id",
        "chunk_id",
        (
            F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
            * (F.col("tf") * (k1 + 1))
            / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
        ).alias("part"),
    )
    scored = contrib.groupBy("query_id", "chunk_id").agg(
        F.sum("part").alias("score")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("chunk_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= limit)
    )


# ---------------------------------------------------------------------------
# hybrid fusion
# ---------------------------------------------------------------------------


def rrf_fuse(
    ranked: list[DataFrame],
    weights: list[float],
    limit: int,
    k: int = RRF_K,
) -> DataFrame:
    """Weighted Reciprocal Rank Fusion of per-query ranked match lists
    (document_rag.py rrf_fuse:40-59): score(chunk) = sum over lists of
    weight / (k + rank).  Each input needs (query_id, chunk_id, rank).
    Fusion needs only each list's ORDERING, never its native score scale —
    BM25 and cosine are incomparable.  Pure column program: union the
    lists with their weights, one groupBy, one window.  Ties broken by
    chunk_id for determinism (the reference's dict ordering is insertion
    order — ties are unspecified there)."""
    parts = []
    for i, (df, wgt) in enumerate(zip(ranked, weights)):
        parts.append(
            df.select(
                "query_id",
                "chunk_id",
                (F.lit(float(wgt)) / (F.lit(k) + F.col("rank"))).alias("part"),
            )
        )
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    fused = u.groupBy("query_id", "chunk_id").agg(F.sum("part").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("chunk_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= limit)
    )


# ---------------------------------------------------------------------------
# MMR diversity selection
# ---------------------------------------------------------------------------


def mmr_select(
    candidates: DataFrame,
    limit: int,
    lambda_mult: float = 0.7,
    token_overlap_weight: float = 1.0,
    score_col: str = "score",
    text_col: str = "text",
) -> DataFrame:
    """Greedy Maximal-Marginal-Relevance selection per query
    (rerank.py mmr_select:92-141): min-max normalize scores within each
    query's candidate set (all-equal -> 0.5), then iteratively pick
    argmax of lambda*relevance - (1-lambda)*max token-Jaccard overlap
    with the already-selected set.

    MMR is inherently sequential WITHIN a query but the pool is bounded
    (<= fetch_limit rows), so this runs as applyInPandas: one small pandas
    group per query, fully parallel across the batch.  Ties broken by
    input order (score desc, chunk_id asc — pre-sorted below), matching
    the reference's stable argmax over its candidate list.

    Returns the selected rows with mmr_rank (1-based selection order)."""
    import pandas as pd

    lam = max(0.0, min(1.0, lambda_mult))
    tow = max(0.0, token_overlap_weight)

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in candidates.schema.fields
    ) + ", mmr_rank int"

    def _tokens(text: str) -> set:
        import re

        return set(t.lower() for t in re.findall(r"[A-Za-z0-9_]+", text or ""))

    def _jac(a: set, b: set) -> float:
        if not a or not b:
            return 0.0
        return len(a & b) / len(a | b)

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [score_col, "chunk_id"], ascending=[False, True]
        ).reset_index(drop=True)
        scores = pdf[score_col].astype(float)
        lo, hi = scores.min(), scores.max()
        if hi == lo:
            norm = [0.5] * len(pdf)
        else:
            norm = [(s - lo) / (hi - lo) for s in scores]
        toks = [_tokens(t) for t in pdf[text_col]]
        remaining = list(range(len(pdf)))
        selected: list[int] = []
        while remaining and len(selected) < limit:
            best_i, best_score = 0, None
            for pos, idx in enumerate(remaining):
                rel = norm[idx]
                if selected:
                    pen = max(
                        min(1.0, tow * _jac(toks[idx], toks[s])) for s in selected
                    )
                else:
                    pen = 0.0
                mmr = lam * rel - (1.0 - lam) * pen
                if best_score is None or mmr > best_score:
                    best_score, best_i = mmr, pos
            selected.append(remaining.pop(best_i))
        out = pdf.iloc[selected].copy()
        out["mmr_rank"] = range(1, len(out) + 1)
        return out

    return candidates.groupBy("query_id").applyInPandas(fn, schema=schema)


# ---------------------------------------------------------------------------
# the batched retrieve loop
# ---------------------------------------------------------------------------


def document_rag_candidates(
    queries: DataFrame,
    store: DataFrame,
    chunks: DataFrame,
    fetch_count: int,
    mode: str = "vector",
    postings: DataFrame | None = None,
    vector_weight: float = 1.0,
    keyword_weight: float = 1.0,
    embedder=None,
    collection: str | None = "default",
    chunk_id_col: str = "chunk_id",
    chunk_text_col: str = "text",
) -> DataFrame:
    """The candidate-fetch prefix of the retrieve loop (the reference's
    Query.get_docs up to fetch_chunk): dense per-concept matches / BM25 /
    RRF-fused hybrid, then the chunk-text join.  Shared by
    ``document_rag_retrieve`` and the MMR pool inspection path — both see
    byte-identical candidates.  Returns (query_id, chunk_id, score, rank,
    text)."""

    def dense() -> DataFrame:
        if "concept_vecs" in queries.columns:
            cv = queries.select(
                "query_id", F.explode("concept_vecs").alias("c")
            ).select(
                "query_id",
                F.col("c.concept_idx").alias("concept_idx"),
                F.col("c.query_vector").alias("query_vector"),
            )
        else:
            concepts = (
                queries.select("query_id", F.col("concepts").alias("cs"))
                if "concepts" in queries.columns
                else queries.select(
                    "query_id", F.array(F.col("query")).alias("cs")
                )
            )
            exploded = concepts.select(
                "query_id",
                F.posexplode("cs").alias("concept_idx", "concept_text"),
            )
            cv = embed_texts(
                exploded, text_col="concept_text", out_col="query_vector",
                embedder=embedder,
            ).select("query_id", "concept_idx", "query_vector")
        m = concept_vector_matches(
            store, cv, fetch_limit=fetch_count, collection=collection
        )
        # rank for fusion = position in the first-seen candidate list
        return m.select("query_id", "chunk_id", "score", F.col("pos").alias("rank"))

    if mode == "vector":
        cand = dense()
    elif mode == "keyword":
        cand = bm25_topk(postings, queries, limit=fetch_count)
    else:
        cand = rrf_fuse(
            [dense(), bm25_topk(postings, queries, limit=fetch_count)],
            [vector_weight, keyword_weight],
            limit=fetch_count,
        )

    return cand.join(
        chunks.select(
            F.col(chunk_id_col).alias("chunk_id"),
            F.col(chunk_text_col).alias("text"),
        ),
        "chunk_id",
    )


def mmr_normalized_pool(
    candidates: DataFrame, score_col: str = "score"
) -> DataFrame:
    """The SQL-expressible prefix of the MMR stage: per-query min-max
    score normalization (rerank.py:99-106; all-equal -> 0.5) as pure
    window columns.  The greedy selection itself stays in ``mmr_select``
    (inherently iterative — the sanctioned no-oracle exception); this
    exposes the pool+relevance inputs it consumes so they CAN be oracled.
    Adds ``norm_score`` to the candidate rows."""
    w = Window.partitionBy("query_id")
    lo = F.min(score_col).over(w)
    hi = F.max(score_col).over(w)
    norm = F.when(hi == lo, F.lit(0.5)).otherwise(
        (F.col(score_col) - lo) / (hi - lo)
    )
    return candidates.withColumn("norm_score", norm)


def document_rag_retrieve(
    queries: DataFrame,
    store: DataFrame,
    chunks: DataFrame,
    doc_limit: int = 5,
    fetch_limit: int = 0,
    mode: str = "vector",
    postings: DataFrame | None = None,
    vector_weight: float = 1.0,
    keyword_weight: float = 1.0,
    reranker=None,
    embedder=None,  # concept-embedding model; MUST match the store's
    diversity: str = "none",
    diversity_lambda: float = 0.7,
    collection: str | None = "default",
    chunk_id_col: str = "chunk_id",
    chunk_text_col: str = "text",
) -> DataFrame:
    """The full DocumentRAG retrieval loop as one DataFrame program over a
    BATCH of queries (document_rag.py Query.get_docs + DocumentRag.query).

    queries: (query_id, query) plus, for dense modes, pre-embedded concept
    vectors in a ``concept_vecs`` array<struct<concept_idx int,
    query_vector array<float>>> column OR a ``concepts`` array<string>
    column to embed through the seam (concept EXTRACTION is the LLM
    boundary — callers default to [query], the reference's fallback).

    Stages: candidate fetch (dense per-concept top-k with first-seen
    dedup / sparse BM25 / RRF-fused hybrid) -> chunk-text join (the
    fetch_chunk analog; chunks missing from the text table drop out
    silently, matching the reference's fetch failure path) -> optional
    cross-encoder rerank seam -> optional MMR diversity -> final
    doc_limit selection.  fetch-count derivation matches the reference
    (document_rag.py:390-399): with a reranker (or MMR, which here can
    run without one — an extension), fetch_limit or
    OVERFETCH_FACTOR*doc_limit (never below doc_limit); without, exactly
    doc_limit — fetch_limit is IGNORED, as in the reference.  In the
    no-reranker/no-MMR path the reference hands the ENTIRE deduped
    candidate list to synthesis with no final cut, so when
    n_concepts > doc_limit (per-concept limit floors at 1) more than
    doc_limit chunks come back; we reproduce that, including the
    untruncated tail.

    Returns one row per selected chunk: (query_id, chunk_id, score,
    final_rank, text).  Feed to assemble_context for the per-query prompt
    context."""
    if reranker is not None or diversity == "mmr":
        fetch_count = max(fetch_limit or OVERFETCH_FACTOR * doc_limit, doc_limit)
    else:
        # reference: fetch_count = doc_limit, byte-identical pre-reranker
        # behaviour (document_rag.py:398-399) — an explicit fetch_limit is
        # not consulted on this path
        fetch_count = doc_limit

    if mode not in ("vector", "keyword", "hybrid"):
        raise ValueError(f"unknown retrieval mode {mode!r}")
    if mode in ("keyword", "hybrid") and postings is None:
        raise ValueError(f"retrieval_mode={mode!r} requires a keyword index")

    withtext = document_rag_candidates(
        queries, store, chunks, fetch_count,
        mode=mode, postings=postings,
        vector_weight=vector_weight, keyword_weight=keyword_weight,
        embedder=embedder, collection=collection,
        chunk_id_col=chunk_id_col, chunk_text_col=chunk_text_col,
    )

    if reranker is not None:
        from .admin import rerank

        qtext = queries.select("query_id", F.col("query").alias("_q"))
        pairs = withtext.join(F.broadcast(qtext), "query_id")
        # the reference reranks the WHOLE fetched pool (document_rag.py:436
        # scores every doc; the 350-cap is a GraphRAG-only behaviour), so no
        # max_input cap here — the pool is already bounded by fetch_count
        # upstream except the n_concepts > fetch_count edge, where truncating
        # before scoring would diverge
        reranked = rerank(
            pairs.drop("score", "rank"),
            scorer=reranker,
            query_col="_q",
            text_col="text",
            limit=fetch_count,
            max_input=None,
            partition_col="query_id",  # distinct queries may share text
        ).drop("_q")
        # rerank already partitions on query_id (partition_col above) but
        # breaks score ties on TEXT, which distinct chunks can share; the
        # re-window below re-ranks with the deterministic chunk_id
        # tiebreak the retrieve contract promises
        scored = reranked.select("query_id", "chunk_id", "score", "text")
        w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("chunk_id"))
        withtext = scored.withColumn("rank", F.row_number().over(w))

    if diversity == "mmr":
        sel = mmr_select(
            withtext.select("query_id", "chunk_id", "score", "text"),
            limit=doc_limit,
            lambda_mult=diversity_lambda,
        )
        return sel.select(
            "query_id", "chunk_id", "score",
            F.col("mmr_rank").alias("final_rank"), "text",
        )

    if reranker is not None:
        # rerank path without diversity: the reference asks the reranker for
        # exactly doc_limit results (document_rag.py:430 rerank_limit)
        withtext = withtext.where(F.col("rank") <= doc_limit)
    # no-reranker path: ALL deduped candidates flow to synthesis untruncated
    # (document_rag.py get_docs returns the full list; the only bound is
    # fetch_count, already applied per arm)
    return withtext.select(
        "query_id", "chunk_id", "score",
        F.col("rank").alias("final_rank"), "text",
    )


def assemble_context(selected: DataFrame, sep: str = "\n\n") -> DataFrame:
    """Per-query prompt context from the selected chunks, in final-rank
    order: (query_id, chunk_ids array, context string, n_chunks) — the
    input the reference hands to its synthesis prompt (the LLM boundary)."""
    return (
        selected.groupBy("query_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("final_rank", "chunk_id", "text"))
            ).alias("ordered")
        )
        .select(
            "query_id",
            F.transform("ordered", lambda s: s["chunk_id"]).alias("chunk_ids"),
            F.array_join(
                F.transform("ordered", lambda s: s["text"]), sep
            ).alias("context"),
            F.size("ordered").cast("long").alias("n_chunks"),
        )
    )
