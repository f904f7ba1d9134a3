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


def _centroid_scores(vec_col, centroids: list[list[float]]):
    """array<double> of cosine scores of vec against each centroid (pure
    column expressions over a literal centroid array)."""
    return F.array(
        *[
            _cosine_expr(vec_col, F.array(*[F.lit(float(x)) for x in c]))
            for c in centroids
        ]
    )


def ivf_centroids(
    vectors: DataFrame, n_lists: int = 16, id_col: str = "entity_uri",
    vec_col: str = "vector",
) -> list[list[float]]:
    """Deterministic IVF coarse quantizer: pick n_lists centroid vectors by
    hash-ordered sampling (cheap, reproducible; k-means iterations can
    refine later — list assignment logic is identical). The centroid set is
    tiny and broadcast into the plan as literals."""
    rows = (
        vectors.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col)))
        .limit(n_lists)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def ivf_assign(
    vectors: DataFrame, centroids: list[list[float]],
    vec_col: str = "vector",
) -> DataFrame:
    """Assign each vector to its nearest centroid list (argmax cosine) —
    one narrow pass; at scale the assigned table is written partitioned by
    list_id so probes prune partitions."""
    scores = _centroid_scores(F.col(vec_col).cast("array<double>"), centroids)
    best = F.array_position(scores, F.array_max(scores)).cast("int") - 1
    return vectors.withColumn("list_id", best)


def ivf_topk(
    assigned: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "entity_uri",
    vec_col: str = "vector",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vector",
) -> DataFrame:
    """IVF search: per query, probe the nprobe nearest lists and rerank
    exactly inside them. The corpus side is touched only on the probed
    lists (partition-pruned at scale); the query side is broadcast."""
    qs = F.array(
        *[
            F.struct(
                _cosine_expr(
                    F.col(query_vec_col).cast("array<double>"),
                    F.array(*[F.lit(float(x)) for x in c]),
                ).alias("score"),
                F.lit(i).alias("list_id"),
            )
            for i, c in enumerate(centroids)
        ]
    )
    probed = queries.withColumn(
        "list_id",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(qs)), 1, nprobe),
                lambda s: s["list_id"],
            )
        ),
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
