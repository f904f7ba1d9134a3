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
the pair test is a cluster-key equi-join with a rank inequality —
quadratic only WITHIN a cluster, which is the operator's published
cost model: choose n_clusters proportional to N so expected cluster
size stays constant, and the join stays linear overall.  No global
sort, no cartesian (plan-gated in test_plans).
"""

from __future__ import annotations

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
            .orderBy(order, F.col("vec_id").asc())))

    earlier = ranked.select(
        F.col("cluster_id"),
        F.col("vec_id").alias("e_id"),
        F.col("csim_rank").alias("e_rank"),
        F.col("v").alias("e_v"))
    dropped = (ranked.alias("r")
               .join(earlier.alias("e"),
                     (F.col("r.cluster_id") == F.col("e.cluster_id"))
                     & (F.col("e.e_rank") < F.col("r.csim_rank"))
                     & (_cosine_expr(F.col("r.v"), F.col("e.e_v"))
                        >= F.lit(float(eps))))
               .select(F.col("r.vec_id").alias("vec_id"))
               .distinct())

    return (ranked
            .join(dropped.withColumn("is_dup", F.lit(True)),
                  "vec_id", "left")
            .select(
                F.col("vec_id").alias(id_col),
                "cluster_id", "centroid_sim",
                F.col("csim_rank").cast("long").alias("csim_rank"),
                F.coalesce(~F.col("is_dup"), F.lit(True)).alias("kept")))
