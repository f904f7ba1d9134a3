"""Real-model seam smoke tests — SKIPPED in this image (fastembed /
flashrank are not installed); they run wherever the packages exist, so
the seams are proven against real models the first time an environment
has them (r03 verdict ask #4).

Contracts pinned:
- FastEmbedEmbedder through embed_texts: MiniLM-L6-v2's 384-dim output
  (the dimension the reference's doc-embeddings store assumes,
  embeddings/fastembed/processor.py:18), finite values, determinism.
- FlashRankReranker through rerank(): real cross-encoder scores rank an
  on-topic passage above an off-topic one (reranker/flashrank/processor.py).
"""

import numpy as np
import pandas as pd
import pytest

from pyspark.sql import functions as F


def test_fastembed_384_dim_contract(spark):
    pytest.importorskip("fastembed")
    from trustgraph_spark.operators.embeddings import (
        FastEmbedEmbedder,
        embed_texts,
    )

    emb = FastEmbedEmbedder()
    # direct contract: pd.Series[str] -> np.ndarray[n, 384]
    vecs = emb.embed(pd.Series(["hello world", "spark shuffles data"]))
    assert vecs.shape == (2, FastEmbedEmbedder.DIM) == (2, 384)
    assert np.isfinite(vecs).all()
    # deterministic across calls
    again = emb.embed(pd.Series(["hello world", "spark shuffles data"]))
    assert np.allclose(vecs, again)

    # through the Spark seam (pickled to executors, lazy model load)
    df = spark.createDataFrame(
        [("a", "hello world"), ("b", "spark shuffles data")],
        "id string, text string",
    )
    out = embed_texts(df, text_col="text", out_col="vector",
                      embedder=FastEmbedEmbedder()).collect()
    assert all(len(r.vector) == 384 for r in out)
    by_id = {r.id: np.asarray(r.vector) for r in out}
    assert np.allclose(by_id["a"], vecs[0], atol=1e-5)


def test_flashrank_cross_encoder_contract(spark):
    pytest.importorskip("flashrank")
    from trustgraph_spark.operators.admin import FlashRankReranker, rerank

    scorer = FlashRankReranker()
    # direct contract: vectorized (query, text) -> float scores
    q = pd.Series(["how do spark shuffles work"] * 2)
    t = pd.Series([
        "Shuffle exchanges data between Spark stages by key.",
        "The recipe calls for two eggs and a cup of flour.",
    ])
    scores = scorer.score(q, t)
    assert len(scores) == 2 and scores.dtype.kind == "f"
    assert scores.iloc[0] > scores.iloc[1]  # on-topic beats off-topic

    # through the Spark rerank seam
    cand = spark.createDataFrame(
        [
            ("how do spark shuffles work",
             "Shuffle exchanges data between Spark stages by key."),
            ("how do spark shuffles work",
             "The recipe calls for two eggs and a cup of flour."),
        ],
        "query string, text string",
    )
    out = rerank(cand, scorer=FlashRankReranker(), limit=2).orderBy("rank")
    rows = out.collect()
    assert rows[0].text.startswith("Shuffle exchanges")
    assert rows[0].score > rows[1].score
