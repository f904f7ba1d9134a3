"""Collection management (M3), knowledge-core export/import (S7/S9),
provenance trace (G5), and the reranker seam (V4).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import (
    GRAPH_SOURCE,
    PROV_WAS_DERIVED_FROM,
    RDF_TYPE,
    TG_CONTAINS,
)


# --- M3: collection management ------------------------------------------------


def delete_collection(df: DataFrame, collection: str) -> DataFrame:
    """Reference deletes a collection's partition
    (storage/triples/cassandra/write.py:193-221); on Iceberg this is a
    row-level DELETE, on parquet a filtered rewrite. Returns the retained
    rows (caller rewrites the table)."""
    return df.where(F.col("collection") != collection)


def list_collections(df: DataFrame) -> DataFrame:
    return df.select("collection").distinct()


# --- S7/S9: knowledge cores -----------------------------------------------


def export_knowledge_core(
    edges: DataFrame,
    entity_embeddings: DataFrame | None,
    path: str,
    collection: str,
    root_id: str | None = None,
) -> None:
    """Persist a (collection[, root document]) slice of triples (+ graph
    embeddings) as a self-contained parquet bundle — the reference's
    'knowledge core' (storage/knowledge/store.py:19-87, keyed by
    (workspace, document_id))."""
    t = edges.where(F.col("collection") == collection)
    t.write.mode("overwrite").parquet(f"{path}/triples")
    if entity_embeddings is not None:
        e = entity_embeddings.where(F.col("collection") == collection)
        e.write.mode("overwrite").parquet(f"{path}/graph_embeddings")


def import_knowledge_core(spark, path: str) -> dict[str, DataFrame]:
    import os

    out = {"triples": spark.read.parquet(f"{path}/triples")}
    ge = f"{path}/graph_embeddings"
    if os.path.exists(ge):
        out["graph_embeddings"] = spark.read.parquet(ge)
    return out


# --- G5: provenance trace ------------------------------------------------------


def trace_provenance(
    edges: DataFrame,
    s: str,
    p: str,
    o: str,
    max_hops: int = 4,
) -> DataFrame:
    """Selected edge -> containing subgraph via the RDF-star tg:contains row
    in urn:graph:source, then walk prov:wasDerivedFrom up to max_hops
    (graph_rag.py:493-613). Returns (hop, node) derivation chain rows."""
    src = edges.where(F.col("g") == GRAPH_SOURCE)
    # exact quoted-triple match: parse the RDF-star JSON o column JVM-side
    # (stays codegen'd; a raw substring contains() would false-positive when
    # one entity's URI appears in another field of the JSON)
    qt_schema = (
        "s struct<type:string,iri:string,value:string>, "
        "p struct<type:string,iri:string,value:string>, "
        "o struct<type:string,iri:string,value:string>"
    )
    qt = F.from_json(F.col("o"), qt_schema)
    contains = src.where(
        (F.col("p") == TG_CONTAINS)
        & (qt["s"]["iri"] == s)
        & (qt["p"]["iri"] == p)
        & (F.coalesce(qt["o"]["iri"], qt["o"]["value"]) == o)
    ).select(F.col("s").alias("node")).distinct()

    derived = src.where(F.col("p") == PROV_WAS_DERIVED_FROM).select(
        F.col("s").alias("node"), F.col("o").alias("parent")
    )

    frontier = contains.withColumn("hop", F.lit(0))
    out = frontier
    for hop in range(1, max_hops + 1):
        nxt = (
            derivation_step(derived, frontier)
            .withColumn("hop", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        out = out.unionByName(nxt)
        frontier = nxt
    return out


def derivation_step(derived: DataFrame, frontier: DataFrame) -> DataFrame:
    """One prov:wasDerivedFrom expansion. The frontier (a handful of
    subgraph URIs) is the broadcast side; `derived` is corpus-sized (one
    row per chunk) and must never be broadcast — plan asserted in
    test_plans."""
    return (
        derived.join(F.broadcast(frontier.select("node")), "node")
        .select(F.col("parent").alias("node"))
        .distinct()
    )


# --- V4: reranker seam -----------------------------------------------------------


class OverlapReranker:
    """Deterministic stand-in for the flashrank cross-encoder
    (reranker/flashrank/processor.py:18-71): token-overlap score between
    query and candidate text. A real cross-encoder plugs into the same
    vectorized (query, text) -> score contract."""

    def score(self, queries: pd.Series, texts: pd.Series) -> pd.Series:
        def sc(q, t):
            qs = set((q or "").lower().split())
            ts = set((t or "").lower().split())
            if not qs or not ts:
                return 0.0
            return len(qs & ts) / len(qs | ts)

        return pd.Series([sc(q, t) for q, t in zip(queries, texts)], index=queries.index)


class FlashRankReranker:
    """Real-model adapter for the reference's flashrank cross-encoder
    (reranker/flashrank/processor.py:18-58: ms-marco-MiniLM-L-12-v2 by
    default, Ranker cached per process).  Same vectorized ``score``
    contract as OverlapReranker, so it drops into rerank() unchanged:
    pairs are grouped by query and scored through one RerankRequest per
    query, as the reference's on_rerank does per request.

    Lazy: only the model NAME pickles into Spark tasks; the Ranker loads
    on first score() on each executor.  Requires ``flashrank`` (absent
    from this image — raises ImportError at first use; test_real_models
    skips unless importable)."""

    #: processor.py:19 default_model
    DEFAULT_MODEL = "ms-marco-MiniLM-L-12-v2"

    def __init__(self, model_name: str = DEFAULT_MODEL):
        self.model_name = model_name
        self._ranker = None

    def __getstate__(self):
        return {"model_name": self.model_name}

    def __setstate__(self, state):
        self.model_name = state["model_name"]
        self._ranker = None

    def score(self, queries: pd.Series, texts: pd.Series) -> pd.Series:
        if self._ranker is None:
            from flashrank import Ranker

            self._ranker = Ranker(model_name=self.model_name)
        from flashrank import RerankRequest

        out = pd.Series(0.0, index=queries.index)
        df = pd.DataFrame({"q": queries.fillna(""), "t": texts.fillna("")})
        for q, grp in df.groupby("q", sort=False):
            req = RerankRequest(
                query=q,
                passages=[
                    {"id": int(i), "text": t}
                    for i, t in zip(grp.index, grp["t"])
                ],
            )
            for r in self._ranker.rerank(req):
                out.loc[int(r["id"])] = float(r["score"])
        return out


def rerank(
    candidates: DataFrame,
    scorer=None,
    query_col: str = "query",
    text_col: str = "text",
    limit: int = 25,
    max_input: int | None = 350,
    partition_col: str | None = None,
) -> DataFrame:
    """Score (query, text) pairs with the pluggable cross-encoder seam and
    keep the top `limit` per query (reference caps reranker input at 350
    and returns edge_limit 25 — graph_rag.py:442-450).  max_input=None
    scores the whole pool uncapped — DocumentRAG's contract, where the
    candidate pool is already bounded upstream (document_rag.py reranks
    every fetched doc).

    partition_col: the per-query identity for the cap/limit windows
    (defaults to query_col).  Pass a query-ID column when two distinct
    queries can carry the SAME query text — partitioning on the text
    alone would pool their candidates under one cap."""
    scorer = scorer or OverlapReranker()
    part = partition_col or query_col

    if max_input is None:
        capped = candidates
    else:
        w_in = Window.partitionBy(part).orderBy(F.asc(text_col))
        capped = (
            candidates.withColumn("_rn", F.row_number().over(w_in))
            .where(F.col("_rn") <= max_input)
            .drop("_rn")
        )

    @F.pandas_udf(T.DoubleType())
    def score_udf(q: pd.Series, t: pd.Series) -> pd.Series:
        return scorer.score(q, t)

    scored = capped.withColumn("score", score_udf(F.col(query_col), F.col(text_col)))
    w = Window.partitionBy(part).orderBy(F.desc("score"), F.asc(text_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= limit)
    )
