"""SemDedup — semantic deduplication by embedding clustering (Abbas
et al. 2023, arXiv:2303.09540): k-means-cluster the corpus embeddings,
then inside each cluster drop every item that is near-identical
(cosine >= eps) to an item ranked before it.  The published
web-corpus recipe (LAION / C4 experiments) for removing *semantic*
duplicates that exact/MinHash dedup (operators/dedup.py) cannot see.

Semantics (pinned, mirrored by the DuckDB oracle — this is the
reference implementation's upper-triangular rule, NOT transitive
closure):

* each vector is assigned to its nearest centroid by cosine (argmax;
  ties by lowest centroid id).  Centroids come from the caller —
  ``embeddings.ivf_kmeans`` refines them at scale; tests pin seeded
  literals so the oracle can embed the same numbers.
* within a cluster, items are ranked by similarity-to-centroid —
  ``keep="far"`` ranks ASCENDING (the paper's choice: keep the LOW
  centroid-similarity extreme of each duplicate group), ``keep="near"``
  descending.  The rank key is rounded to 6dp with a doc-id tie-break
  so float last-ulp differences between engines cannot reorder it.
* an item is DROPPED iff some item ranked before it in the same
  cluster has pairwise cosine >= eps with it — exactly the paper
  implementation's "max similarity to earlier-sorted items" test
  (it does not re-check whether the earlier item itself survived).

Scale shape: assignment is the Arrow-GEMM seam (ivf_assign — zero
shuffle); the centroid-similarity pass is a broadcast join against the
(n_clusters x dim) table; ranking is a window partitioned by cluster;
the pair test is one per-cluster blocked Gram matrix through the same
sanctioned similarity-scoring GEMM seam the paper's implementation
uses — quadratic only WITHIN a cluster, which is the operator's
published cost model: choose n_clusters proportional to N so expected
cluster size stays constant, and the pass stays linear overall.  (An
earlier native formulation evaluated the 3-HOF cosine expression per
joined pair inside a rank-inequality equi-join — interpreted lambdas,
norms recomputed per pair; the GEMM computes each cluster's pairwise
block in one BLAS call and was measured ~5x faster at sf0.1.)  No
global sort, no cartesian (plan-gated in test_plans).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from trustgraph_spark.operators.embeddings import (
    _cosine_expr, centroids_table, ivf_assign,
)


def semdedup(embeddings: DataFrame, centroids: list[list[float]],
             eps: float = 0.95, keep: str = "far",
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Per-item semantic-dedup verdict: (id, cluster_id, centroid_sim,
    csim_rank, kept).  ``kept=false`` rows are the semantic duplicates
    to discard; survivors are the dedup'd corpus."""
    if keep not in ("far", "near"):
        raise ValueError(f"keep must be 'far' or 'near', got {keep!r}")

    spark = embeddings.sparkSession
    assigned = ivf_assign(
        embeddings.select(F.col(id_col).alias("vec_id"),
                          F.col(vec_col).alias("v")),
        centroids, vec_col="v",
    ).withColumnRenamed("list_id", "cluster_id")

    cents = centroids_table(spark, centroids) \
        .withColumnRenamed("list_id", "cluster_id")
    sim = (assigned
           .join(F.broadcast(cents), "cluster_id")
           .select("vec_id", "cluster_id", "v",
                   F.round(_cosine_expr(F.col("v"), F.col("centroid")), 6)
                   .alias("centroid_sim")))

    order = (F.col("centroid_sim").asc() if keep == "far"
             else F.col("centroid_sim").desc())
    from pyspark.sql.window import Window
    ranked = sim.withColumn(
        "csim_rank",
        F.row_number().over(
            Window.partitionBy("cluster_id")
            .orderBy(order, F.col("vec_id").asc()))
        .cast("long"))

    # Pair test at the sanctioned similarity-scoring seam (CLAUDE.md):
    # one blocked Gram matrix per cluster — the exact shape of the paper
    # implementation's per-cluster "max similarity to earlier-sorted
    # items" pass.  Row blocks bound peak memory at O(block x cluster);
    # cluster size itself is bounded by the n_clusters ∝ N contract.
    from pyspark.sql import types as T

    out_schema = T.StructType(
        [f for f in ranked.schema.fields if f.name != "v"]
        + [T.StructField("kept", T.BooleanType())])
    cols = [f.name for f in out_schema.fields if f.name != "kept"]

    def _verdicts(pdf):
        pdf = pdf.sort_values("csim_rank").reset_index(drop=True)
        V = np.stack([np.asarray(x, dtype=np.float64) for x in pdf["v"]])
        n = np.linalg.norm(V, axis=1)
        k = len(pdf)
        kept = np.ones(k, dtype=bool)
        block = 1024
        for i0 in range(1, k, block):
            i1 = min(i0 + block, k)
            sims = V[i0:i1] @ V[:i1].T
            denom = np.outer(n[i0:i1], n[:i1])
            sims = np.where(denom > 0, sims / np.where(denom > 0, denom, 1.0),
                            0.0)
            rows = np.arange(i0, i1)[:, None]
            earlier = np.arange(i1)[None, :] < rows
            kept[i0:i1] = ~((sims >= eps) & earlier).any(axis=1)
        out = pdf[cols].copy()
        out["kept"] = kept
        return out

    return (ranked.groupBy("cluster_id").applyInPandas(_verdicts, out_schema)
            .select(
                F.col("vec_id").alias(id_col),
                "cluster_id", "centroid_sim", "csim_rank", "kept"))
