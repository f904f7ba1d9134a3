"""Embedding + vector similarity operators (V1-V3, SURVEY.md §2.3).

Reference: fastembed text embedder (embeddings/fastembed/processor.py:20-99,
all-MiniLM-L6-v2, 384-d), graph-embeddings mapper
(embeddings/graph_embeddings/embeddings.py:56-96), and Qdrant cosine top-k
entity match with over-fetch + dedup
(query/graph_embeddings/qdrant/service.py:48-102).

Spark design:
- the embedder is a ``mapInPandas`` iterator-of-batches seam with a
  per-executor cached model (sanctioned seam #2). The model libs aren't in
  this container, so the default is a deterministic hash-based
  pseudo-embedder (same shape/contract, unit-normalized) — the real model
  plugs into the same seam;
- similarity search is a DataFrame program: brute-force cosine top-k as the
  exact baseline (broadcast the query side, window top-k), and an
  LSH-bucketed variant (random hyperplane signatures, bucket equi-join)
  as the 10^12-scale candidate-generation path.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# V1/V2: embedding seam
# ---------------------------------------------------------------------------


class HashEmbedder:
    """Deterministic pseudo-embedder: token hashing into ``dim`` buckets,
    L2-normalized. Same vectorized contract as a real sentence-transformer
    (pd.Series[str] -> np.ndarray[n, dim]); deterministic for tests."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def embed(self, texts: pd.Series) -> np.ndarray:
        import zlib

        out = np.zeros((len(texts), self.dim), dtype=np.float32)
        for i, t in enumerate(texts.fillna("")):
            for tok in t.lower().split():
                # crc32: deterministic across processes (unlike hash())
                h = zlib.crc32(tok.encode("utf-8"))
                out[i, h % self.dim] += 1.0 + (h >> 16) % 7 / 7.0
        norms = np.linalg.norm(out, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return out / norms


class FastEmbedEmbedder:
    """Real-model adapter for the reference's fastembed text embedder
    (embeddings/fastembed/processor.py:18-58: MiniLM-L6-v2 by default,
    model cached per process).  Same vectorized ``embed`` contract as
    HashEmbedder, so it drops into embed_texts unchanged.

    Lazy: only the model NAME pickles into Spark tasks; the TextEmbedding
    model loads on the first embed() call on each executor and is cached
    on the instance — the per-executor reuse embed_texts already provides.
    Requires the ``fastembed`` package (absent from this image — the
    adapter raises ImportError at first use, and test_real_models skips
    unless it is importable)."""

    #: processor.py:18 default_model
    DEFAULT_MODEL = "sentence-transformers/all-MiniLM-L6-v2"
    #: MiniLM-L6-v2 output width — the contract the store schema assumes
    DIM = 384

    def __init__(self, model_name: str = DEFAULT_MODEL):
        self.model_name = model_name
        self._model = None

    def __getstate__(self):
        return {"model_name": self.model_name}

    def __setstate__(self, state):
        self.model_name = state["model_name"]
        self._model = None

    def embed(self, texts: pd.Series) -> np.ndarray:
        if self._model is None:
            from fastembed import TextEmbedding

            self._model = TextEmbedding(model_name=self.model_name)
        vecs = list(self._model.embed(list(texts.fillna(""))))
        return np.asarray(vecs, dtype=np.float32)


def embed_texts(
    df: DataFrame,
    text_col: str = "context",
    out_col: str = "vector",
    embedder=None,
    batch_size: int = 1024,
) -> DataFrame:
    """mapInPandas embedding with per-executor model reuse (the
    iterator-of-batches pattern): the embedder is constructed/cached once
    per python worker, then applied per Arrow batch — the Spark analog of
    the reference's batch embedding spec
    (docs/tech-specs/embeddings-batch-processing.md)."""
    from pyspark.sql import types as T

    emb = embedder or HashEmbedder()
    schema = T.StructType(
        list(df.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.FloatType()), False)]
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        model = emb  # per-worker instance (unpickled once per task)
        for pdf in batches:
            for start in range(0, len(pdf), batch_size):
                part = pdf.iloc[start : start + batch_size].copy()
                vecs = model.embed(part[text_col])
                part[out_col] = list(vecs)
                yield part

    return df.mapInPandas(gen, schema=schema)


def embed_entity_contexts(entity_contexts: DataFrame, embedder=None) -> DataFrame:
    """EntityContexts -> GraphEmbeddings (V2,
    embeddings/graph_embeddings/embeddings.py:56-96): one vector per
    context row, entity/chunk metadata carried through."""
    return embed_texts(entity_contexts, "context", "vector", embedder).select(
        "collection", "entity_uri", "vector", "chunk_id"
    )


# ---------------------------------------------------------------------------
# V3: cosine top-k
# ---------------------------------------------------------------------------


def _cosine_expr(a, b):
    """Cosine similarity of two array<float/double> columns, JVM-side:
    zip_with product + aggregate sum; inputs cast to double."""
    ad = a.cast("array<double>")
    bd = b.cast("array<double>")
    dot = F.aggregate(F.zip_with(ad, bd, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)
    na = F.sqrt(F.aggregate(ad, F.lit(0.0), lambda s, x: s + x * x))
    nb = F.sqrt(F.aggregate(bd, F.lit(0.0), lambda s, x: s + x * x))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "entity_uri",
    vec_col: str = "vector",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """Exact brute-force cosine top-k per query: broadcast the (small) query
    side against the corpus — a single scan of the vector table, no corpus
    shuffle — then per-query window top-k with deterministic tie-break.
    The reference's over-fetch×2-then-dedup (service.py:66-74) is
    unnecessary: dedup-first then rank."""
    joined = vectors.alias("v").join(
        F.broadcast(queries.alias("q"))
    )  # cartesian with broadcast side: one pass over corpus per batch of queries
    scored = joined.select(
        F.col(f"q.{query_id_col}").alias(query_id_col),
        F.col(f"v.{id_col}").alias(id_col),
        _cosine_expr(F.col(f"v.{vec_col}"), F.col(f"q.{query_vec_col}")).alias("score"),
    )
    # dedupe duplicate ids keeping the best score (reference dedupes entities
    # keeping first/highest, service.py:76-98)
    best = scored.groupBy(query_id_col, id_col).agg(F.max("score").alias("score"))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("score"), F.asc(id_col)
    )
    return (
        best.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed approximate variant (the 10^12-scale path)
# ---------------------------------------------------------------------------


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    rng = np.random.RandomState(seed)
    return rng.randn(n_planes, dim).astype(float).tolist()


def lsh_signature_col(vec_col, planes: list[list[float]]):
    """Sign-random-projection signature as a bit string column (pure
    column expressions; no UDF)."""
    bits = [
        F.when(
            F.aggregate(
                F.zip_with(
                    vec_col.cast("array<double>"),
                    F.array(*[F.lit(float(x)) for x in p]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda s, x: s + x,
            )
            >= 0,
            F.lit("1"),
        ).otherwise(F.lit("0"))
        for p in planes
    ]
    return F.concat(*bits)


def ivf_centroids(
    vectors: DataFrame, n_lists: int = 16, id_col: str = "entity_uri",
    vec_col: str = "vector",
) -> list[list[float]]:
    """Deterministic IVF seed centroids: n_lists vectors by hash-ordered
    sampling (reproducible k-means++-style spread-free seeding; refine with
    ivf_kmeans). Returned as plain Python data — NEVER embedded as plan
    literals (256 lists x 64 dims as literals blows up the Catalyst plan;
    centroids travel as a closure numpy array or a small DataFrame)."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_lists)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def centroids_table(spark, centroids: list[list[float]]) -> DataFrame:
    """(list_id, centroid) dimension — the join/broadcast form of the
    coarse quantizer (replacing plan-literal centroids)."""
    return spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "list_id int, centroid array<double>",
    )


def ivf_assign(
    vectors: DataFrame, centroids: list[list[float]],
    vec_col: str = "vector",
) -> DataFrame:
    """Assign each vector to its nearest centroid list (argmax cosine).

    Arrow-batched numpy matmul over normalized centroids (the sanctioned
    similarity-scoring seam): zero shuffle, zero plan growth — each batch
    is one (batch x dim) @ (dim x n_lists) GEMM. This is the index-build
    path; at scale the output is written partitioned by list_id
    (ivf_write) so probes prune partitions."""
    import pandas as pd

    cent = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(cent, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    cent_t = (cent / norms).T  # dim x n_lists

    from pyspark.sql import types as T

    fields = vectors.schema.fieldNames()
    # build a NEW StructType — StructType.add mutates in place and would
    # corrupt the cached input schema
    out_schema = T.StructType(
        list(vectors.schema.fields) + [T.StructField("list_id", T.IntegerType())]
    )

    dim = cent.shape[1]

    def gen(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            # null vectors become zero vectors (list 0 by argmax tie-break)
            # instead of crashing the whole task on np.stack; a DIMENSION
            # mismatch stays a loud error — silently zeroing it would
            # produce a degenerate single-list index that looks successful
            def to_vec(v):
                if v is None:
                    return np.zeros(dim)
                if len(v) != dim:
                    raise ValueError(
                        f"embedding dim {len(v)} != centroid dim {dim}"
                    )
                return np.asarray(v, dtype=np.float64)

            m = np.stack(pdf[vec_col].map(to_vec))
            vn = np.linalg.norm(m, axis=1, keepdims=True)
            vn[vn == 0] = 1.0
            scores = (m / vn) @ cent_t
            pdf = pdf.copy()
            pdf["list_id"] = scores.argmax(axis=1).astype("int32")
            yield pdf[fields + ["list_id"]]

    return vectors.mapInPandas(gen, schema=out_schema)


def ivf_kmeans(
    vectors: DataFrame,
    n_lists: int = 64,
    iters: int = 4,
    id_col: str = "entity_uri",
    vec_col: str = "vector",
    train_sample: int = 100_000,
) -> list[list[float]]:
    """Lloyd's k-means refinement of the IVF coarse quantizer, distributed:
    per iteration one assignment pass (Arrow GEMM, no shuffle) + one
    centroid recompute (posexplode -> groupBy(list_id, pos) avg — a single
    map-side-combinable shuffle of (sample x dim) scalars). Training runs
    on a hash-deterministic sample (faiss-style), so iteration cost is
    bounded regardless of corpus size. Returns refined centroids."""
    n = vectors.count()
    train = vectors
    if n > train_sample:
        train = vectors.orderBy(F.xxhash64(F.col(id_col))).limit(train_sample)
    train = train.select(id_col, vec_col).localCheckpoint()

    cents = ivf_centroids(train, n_lists, id_col, vec_col)
    # fewer training rows than requested lists: degrade to the lists we
    # actually have (ivf_centroids returns min(n_lists, n_rows) seeds)
    n_lists = len(cents)
    for _ in range(iters):
        assigned = ivf_assign(train, cents, vec_col)
        means = (
            assigned.select("list_id", F.posexplode(F.col(vec_col)).alias("pos", "x"))
            .groupBy("list_id", "pos")
            .agg(F.avg("x").alias("m"))
            .groupBy("list_id")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("centroid")
            )
            .collect()
        )
        new = {r.list_id: [float(x) for x in r.centroid] for r in means}
        # empty lists keep their previous centroid
        cents = [new.get(i, cents[i]) for i in range(n_lists)]
    return cents


def ivf_write(assigned: DataFrame, path: str) -> None:
    """Persist the IVF index partitioned by list_id: a probe that filters
    on list_id reads only the probed partitions (PartitionFilters /
    dynamic partition pruning — asserted in test_plans)."""
    assigned.write.mode("overwrite").partitionBy("list_id").parquet(path)


def ivf_probe_lists(
    queries: DataFrame,
    centroids: list[list[float]] | DataFrame,
    nprobe: int = 4,
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """Per query, the nprobe nearest centroid lists: query x broadcast
    centroid-table join + per-query top-n window. Returns the query rows
    replicated per probed list (query cols + list_id)."""
    if not isinstance(centroids, DataFrame):
        centroids = centroids_table(queries.sparkSession, centroids)
    scored = queries.crossJoin(F.broadcast(centroids)).withColumn(
        "_cscore",
        _cosine_expr(F.col(query_vec_col), F.col("centroid")),
    )
    w = Window.partitionBy(query_id_col).orderBy(F.desc("_cscore"), F.asc("list_id"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= nprobe)
        .drop("_rn", "_cscore", "centroid")
    )


def default_nprobe(
    n_vectors: int,
    n_lists: int,
    target_rows: int = 2048,
    floor: int = 4,
) -> int:
    """Probe-count rule that keeps recall sane across corpus sizes: probe
    enough lists that the EXPECTED probed-row count reaches
    ``target_rows`` (clamped to [floor, n_lists]). At tiny N this
    degrades gracefully toward a full probe — equivalent to the exact
    scan, which is the right answer when the whole corpus fits in one
    rerank batch (IVF only pays off once N outgrows target_rows); at
    large N the floor keeps the probe fraction ~sqrt(N)-sub-linear.
    Added for the r4-verdict nit: fixed nprobe=4 under-probed at sf0.1
    (n_lists=44, recall@10 0.41-0.48 measured) while fine at sf1."""
    avg_list = max(1.0, n_vectors / max(1, n_lists))
    return max(floor, min(n_lists, math.ceil(target_rows / avg_list)))


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]] | DataFrame,
    queries: DataFrame,
    k: int = 10,
    nprobe: int | None = 4,
    id_col: str = "entity_uri",
    vec_col: str = "vector",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """IVF search: per query, probe the nprobe nearest lists and rerank
    exactly inside them. Probe selection is a centroid-TABLE join (no plan
    literals); the corpus join on list_id against the broadcast probe set
    triggers dynamic partition pruning when `assigned` is a
    list_id-partitioned parquet read — only probed lists are scanned.

    ``nprobe=None`` selects :func:`default_nprobe` from the index shape
    (costs one count() of ``assigned`` — callers on hot paths should
    precompute and pass an explicit value)."""
    if nprobe is None:
        n_lists = (
            centroids.count()
            if isinstance(centroids, DataFrame)
            else len(centroids)
        )
        nprobe = default_nprobe(assigned.count(), n_lists)
    probed = ivf_probe_lists(
        queries, centroids, nprobe, query_id_col, query_vec_col
    )
    joined = assigned.alias("v").join(
        F.broadcast(probed.alias("q")), "list_id"
    )
    scored = joined.select(
        F.col(f"q.{query_id_col}").alias(query_id_col),
        F.col(f"v.{id_col}").alias(id_col),
        _cosine_expr(F.col(f"v.{vec_col}"), F.col(f"q.{query_vec_col}")).alias("score"),
    )
    best = scored.groupBy(query_id_col, id_col).agg(F.max("score").alias("score"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        best.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "entity_uri",
    vec_col: str = "vector",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """Approximate top-k: bucket corpus and queries by hyperplane signature,
    equi-join on the bucket (shuffle bounded by bucket sizes, never a full
    cross product), exact rerank inside buckets. Recall improves with more
    bands; this single-band variant is the scale skeleton."""
    planes = random_hyperplanes(dim, n_planes)
    v = vectors.withColumn("bucket", lsh_signature_col(F.col(vec_col), planes))
    q = queries.withColumn("bucket", lsh_signature_col(F.col(query_vec_col), planes))
    joined = v.alias("v").join(F.broadcast(q.alias("q")), "bucket")
    scored = joined.select(
        F.col(f"q.{query_id_col}").alias(query_id_col),
        F.col(f"v.{id_col}").alias(id_col),
        _cosine_expr(F.col(f"v.{vec_col}"), F.col(f"q.{query_vec_col}")).alias("score"),
    )
    best = scored.groupBy(query_id_col, id_col).agg(F.max("score").alias("score"))
    w = Window.partitionBy(query_id_col).orderBy(F.desc("score"), F.asc(id_col))
    return (
        best.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "score", "rank")
    )
