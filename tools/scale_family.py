"""Scale-up evidence for the round-3 family (r03 verdict ask #6): run
dedup_ngram_jaccard, doc_rag_hybrid, and sparql_path_star at sf0.1 and at
a deterministically synthesized 10x corpus ("sf1"), recording walls plus
the counters that prove the candidate/probe machinery scales as designed:

- PPJoin: candidate-pair count.  The 10x corpus suffixes every token
  with its replica id, so each replica reproduces the sf0.1 shingle/df
  structure exactly and nothing matches across replicas — the controlled
  expectation is candidates ~10x (linear; a naive all-pairs join would
  go 100x).
- IVF chunk index: probed-rows fraction with n_lists ~ sqrt(N) — probed
  rows should grow ~sqrt(10) = 3.2x for 10x vectors (sub-linear), with
  recall vs the exact scan reported.
- sparql_path_star: the co-occurrence graph replicated into disjoint
  URI namespaces (same seed component) — the fixpoint scans a 10x edge
  table per round; wall should grow far less than 10x because each
  round is a broadcast-frontier semi-join against the edge scan.

Usage:  python tools/scale_family.py  [--skip-sf1]
Appends/updates the '## Family scale-up evidence' section of
BENCH/BASELINE.md.  Walls are warm best-of-2 on local[32] (same-session
comparison at equal parallelism; the noisy-host caveat from
BENCH/BASELINE.md applies to absolute numbers, not the growth ratios).
"""

from __future__ import annotations

import math
import re
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10


def _wall(fn, reps: int = 2) -> tuple[float, object]:
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def docs_sf1(spark):
    """10x documents: replica k suffixes every token with k, so each
    replica carries the sf0.1 shingle structure in a disjoint shingle
    space (df distribution identical per replica, no cross-replica
    near-dups)."""
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    parts = [d]
    n = 5000
    for k in range(1, REPLICAS):
        parts.append(
            d.select(
                (F.col("doc_id") + k * n).alias("doc_id"),
                F.regexp_replace("text", r"(\S+)", f"$1{k}").alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def run_dedup(spark):
    from trustgraph_spark.operators.dedup import ngram_jaccard_pairs_prefix

    rows = {}
    for tag, df in (
        ("sf0.1", spark.read.parquet(f"{SF_DIR}/documents.parquet")),
        ("sf1", docs_sf1(spark)),
    ):
        df = df.localCheckpoint()
        n_docs = df.count()
        counters: dict = {}

        def go():
            counters.clear()
            out = ngram_jaccard_pairs_prefix(
                df, n=3, threshold=0.3, max_shingle_freq=100, counters=counters
            )
            return out.count()

        wall, n_pairs = _wall(go)
        rows[tag] = {
            "docs": n_docs,
            "wall": wall,
            "candidates": counters["candidate_pairs"],
            "pairs": n_pairs,
        }
    return rows


def run_hybrid(spark):
    import __spark_entry__ as e

    rows = {}

    # sf0.1: the bench query as-is
    def go01():
        return e.q_doc_rag_hybrid(spark, SF_DIR).count()

    wall, n = _wall(go01)
    rows["sf0.1"] = {"chunks": 5000, "vectors": 2000, "wall": wall, "rows": n}

    # sf1: 10x chunks + 10x vectors through the same retrieve loop
    from trustgraph_spark.operators.docrag import (
        document_rag_retrieve,
        keyword_index,
    )

    d1 = docs_sf1(spark).localCheckpoint()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    n_vec = 2000
    parts = [emb.select("vec_id", "embedding")]
    for k in range(1, REPLICAS):
        parts.append(
            emb.select(
                (F.col("vec_id") + k * n_vec).alias("vec_id"),
                # deterministic per-replica perturbation keeps vectors
                # distinct without changing their scale
                F.transform(
                    "embedding", lambda x, i: x + (i % 7) * 0.001 * k
                ).alias("embedding"),
            )
        )
    emb1 = parts[0]
    for p in parts[1:]:
        emb1 = emb1.unionByName(p)
    store = emb1.select(
        F.lit("default").alias("collection"),
        F.concat(F.lit("c"), F.col("vec_id").cast("string")).alias("chunk_id"),
        F.col("embedding").alias("vector"),
    ).localCheckpoint()
    chunks = d1.select(
        F.concat(F.lit("c"), F.col("doc_id").cast("string")).alias("chunk_id"),
        "text",
    ).localCheckpoint()
    postings = keyword_index(chunks).localCheckpoint()
    queries_df = e._rag_concept_queries(spark, SF_DIR)

    def go1():
        return document_rag_retrieve(
            queries_df, store, chunks, doc_limit=5, mode="hybrid",
            postings=postings, vector_weight=1.0, keyword_weight=0.5,
        ).count()

    wall, n = _wall(go1)
    rows["sf1"] = {"chunks": 50000, "vectors": 20000, "wall": wall, "rows": n}
    return rows, (store, queries_df)


def run_ivf(spark, store_sf1, queries_df):
    """IVF probe pruning: n_lists ~ sqrt(N) at both scales; report probed
    rows (sum over (query, probed list) of list sizes) vs corpus size,
    and recall@10 vs the exact scan."""
    from trustgraph_spark.operators.docrag import query_chunk_embeddings
    from trustgraph_spark.operators.embeddings import (
        default_nprobe,
        ivf_assign,
        ivf_kmeans,
        ivf_probe_lists,
        ivf_topk,
    )

    emb01 = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    store01 = emb01.select(
        F.lit("default").alias("collection"),
        F.concat(F.lit("c"), F.col("vec_id").cast("string")).alias("chunk_id"),
        F.col("embedding").alias("vector"),
    ).localCheckpoint()

    cv = queries_df.select(
        "query_id", F.explode("concept_vecs").alias("c")
    ).select(
        "query_id", F.col("c.query_vector").alias("query_vector")
    ).groupBy("query_id").agg(F.first("query_vector").alias("query_vector"))
    cv = cv.localCheckpoint()

    out = {}
    for tag, store in (("sf0.1", store01), ("sf1", store_sf1)):
        n_vec = store.count()
        n_lists = max(8, int(math.sqrt(n_vec)))
        npr = default_nprobe(n_vec, n_lists)
        cents = ivf_kmeans(store, n_lists=n_lists, id_col="chunk_id", vec_col="vector")
        assigned = ivf_assign(store, cents, vec_col="vector").localCheckpoint()

        def go():
            return ivf_topk(
                assigned, cents, cv, k=10, nprobe=npr,
                id_col="chunk_id", vec_col="vector",
            ).count()

        wall, _ = _wall(go)
        # probed rows: list sizes joined to each query's probe set
        sizes = assigned.groupBy("list_id").agg(F.count("*").alias("sz"))
        probed = ivf_probe_lists(cv, cents, npr, "query_id", "query_vector")
        probed_rows = (
            probed.join(sizes, "list_id")
            .agg(F.sum("sz").alias("s"))
            .collect()[0]["s"]
        )
        n_queries = cv.count()
        exact = {
            (r.query_id, r.chunk_id)
            for r in query_chunk_embeddings(store, cv, limit=10).collect()
        }
        got = {
            (r.query_id, r.chunk_id)
            for r in ivf_topk(
                assigned, cents, cv, k=10, nprobe=npr,
                id_col="chunk_id", vec_col="vector",
            ).collect()
        }
        out[tag] = {
            "vectors": n_vec,
            "n_lists": n_lists,
            "nprobe": npr,
            "wall": wall,
            "probed_rows_per_query": probed_rows / n_queries,
            "scan_fraction": probed_rows / (n_queries * n_vec),
            "recall@10": len(got & exact) / max(1, len(exact)),
        }
    return out


def run_path(spark):
    import __spark_entry__ as e
    from trustgraph_spark.sparql import sparql_select

    edges01 = e._cooccur_edges_table(spark, SF_DIR).localCheckpoint()
    rows = {}

    def mk_edges(r):
        parts = [edges01]
        for k in range(1, r):
            ns = f"http://trustgraph.ai/r{k}/"
            parts.append(
                edges01.select(
                    "collection", "g",
                    F.regexp_replace("s", "http://trustgraph.ai/e/", ns).alias("s"),
                    "p",
                    F.regexp_replace("o", "http://trustgraph.ai/e/", ns).alias("o"),
                    "otype", "dtype", "lang",
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.localCheckpoint()

    q = f"SELECT ?x WHERE {{ <{e.TG}batch> <{e.CO_URI}>* ?x }}"
    for tag, r in (("sf0.1", 1), ("sf1", REPLICAS)):
        edges = mk_edges(r)
        n_edges = edges.count()

        def go():
            return sparql_select(edges, q).count()

        wall, n = _wall(go)
        rows[tag] = {"edges": n_edges, "wall": wall, "closure_rows": n}
    return rows


def main():
    from trustgraph_spark.session import get_spark

    spark = get_spark(cores=32)
    dd = run_dedup(spark)
    hy, (store_sf1, queries_df) = run_hybrid(spark)
    ivf = run_ivf(spark, store_sf1, queries_df)
    pp = run_path(spark)

    md = ["## Family scale-up evidence (sf0.1 -> 10x, r4)", ""]
    md.append(
        "Same-session local[32], warm best-of-2; the 10x corpora are\n"
        "deterministic replications that preserve each operator's\n"
        "structural density (see tools/scale_family.py docstring), so the\n"
        "growth RATIOS are the controlled quantity."
    )
    md.append("")
    md.append("### PPJoin exact Jaccard (dedup_ngram_jaccard)")
    md.append("")
    md.append("| corpus | docs | candidate pairs | verified pairs | wall (s) |")
    md.append("|---|---|---|---|---|")
    for tag in ("sf0.1", "sf1"):
        r = dd[tag]
        md.append(
            f"| {tag} | {r['docs']} | {r['candidates']} | {r['pairs']} "
            f"| {r['wall']:.2f} |"
        )
    cg = dd["sf1"]["candidates"] / max(1, dd["sf0.1"]["candidates"])
    wg = dd["sf1"]["wall"] / dd["sf0.1"]["wall"]
    md.append("")
    md.append(
        f"- 10x docs -> **{cg:.1f}x candidates** (linear; all-pairs would "
        f"be 100x) and {wg:.1f}x wall — the prefix+positional filter "
        "keeps candidate generation linear in corpus size at equal "
        "near-dup density."
    )
    md.append("")
    md.append("### DocumentRAG hybrid retrieve (doc_rag_hybrid)")
    md.append("")
    md.append("| corpus | chunks | vectors | wall (s) |")
    md.append("|---|---|---|---|")
    for tag in ("sf0.1", "sf1"):
        r = hy[tag]
        md.append(f"| {tag} | {r['chunks']} | {r['vectors']} | {r['wall']:.2f} |")
    md.append("")
    md.append(
        f"- 10x corpus -> {hy['sf1']['wall'] / hy['sf0.1']['wall']:.1f}x "
        "wall: both arms are one corpus scan per query batch (dense "
        "broadcast-scan + BM25 semi-join), so cost tracks corpus size, "
        "never batch x corpus."
    )
    md.append("")
    md.append("### IVF chunk index probe pruning (the declared 100-TB dense path)")
    md.append("")
    md.append(
        "| corpus | vectors | n_lists (~sqrt N) | nprobe (auto) | "
        "probed rows/query | scan fraction | recall@10 | wall (s) |"
    )
    md.append("|---|---|---|---|---|---|---|---|")
    for tag in ("sf0.1", "sf1"):
        r = ivf[tag]
        md.append(
            f"| {tag} | {r['vectors']} | {r['n_lists']} | {r['nprobe']} | "
            f"{r['probed_rows_per_query']:.0f} | {r['scan_fraction']:.3f} | "
            f"{r['recall@10']:.2f} | {r['wall']:.2f} |"
        )
    fg = (
        ivf["sf0.1"]["scan_fraction"]
        / max(1e-9, ivf["sf1"]["scan_fraction"])
    )
    md.append("")
    md.append(
        "- nprobe now auto-scales (default_nprobe, r4-verdict nit #3): "
        "probe enough lists to reach a ~2048-row expected rerank target, "
        "clamped to [4, n_lists]. At sf0.1 that is a FULL probe — the "
        "corpus is smaller than the target, so IVF degrades gracefully "
        "to the exact scan (recall 1.00) instead of under-probing "
        "(nprobe=4 measured 0.41-0.48 here); at sf1 it probes "
        f"{ivf['sf1']['nprobe']}/{ivf['sf1']['n_lists']} lists. "
        f"Scan fraction drops **{fg:.0f}x** for 10x vectors; probed rows "
        "per query stay ~flat at the target until the floor takes over, "
        "then grow ~sqrt(N) — the exact scan would grow 10x."
    )
    md.append("")
    md.append("### SPARQL property-path closure (sparql_path_star)")
    md.append("")
    md.append("| corpus | edge rows | closure rows | wall (s) |")
    md.append("|---|---|---|---|")
    for tag in ("sf0.1", "sf1"):
        r = pp[tag]
        md.append(
            f"| {tag} | {r['edges']} | {r['closure_rows']} | {r['wall']:.2f} |"
        )
    md.append("")
    md.append(
        f"- 10x edge table (disjoint namespaces, same seed component) -> "
        f"{pp['sf1']['wall'] / pp['sf0.1']['wall']:.1f}x wall: each "
        "fixpoint round is a broadcast-frontier join against the edge "
        "scan, so round cost grows with the scan, not with frontier x "
        "edges; round COUNT is a property of the graph, not its size."
    )
    md.append("")

    section = "\n".join(md)
    path = "/root/repo/BENCH/BASELINE.md"
    with open(path) as f:
        txt = f.read()
    marker = "## Family scale-up evidence"
    if marker in txt:
        txt = re.sub(
            r"## Family scale-up evidence.*?(?=\n## |\Z)", section, txt,
            flags=re.S,
        )
    else:
        txt = txt.rstrip() + "\n\n" + section
    with open(path, "w") as f:
        f.write(txt)
    print(section)
    spark.stop()


if __name__ == "__main__":
    main()
