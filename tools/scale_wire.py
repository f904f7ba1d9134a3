"""10x scale evidence for the round-5 session-2 operators: wire-format
batched dispatch and the extraction-hierarchy reader.

Same discipline as tools/scale_family.py: the 10x corpora are
deterministic doc_id-offset replications preserving the planted mod
structure, so per-request match density and hierarchy shape are
constant and the growth RATIOS are the controlled quantity. Fixed
request batch / fixed root — the claim under test is that cost tracks
CORPUS size (one scan per mask; bounded BFS joins), never requests x
corpus or nodes x store-queries.
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
REPLICAS = 10


def _wall(fn, reps=2):
    best, out = float("inf"), None
    for _ in range(reps):
        t0 = time.monotonic()
        out = fn()
        best = min(best, time.monotonic() - t0)
    return best, out


def _docs(spark, mult):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    n = 5000
    parts = [d]
    for k in range(1, mult):
        parts.append(d.select((F.col("doc_id") + k * n).alias("doc_id")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _wire_store(base):
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    a = base.select(
        F.lit("default").alias("collection"),
        F.when(d % 5 == 0, "urn:g:1").otherwise("").alias("g"),
        F.concat(F.lit("http://t/e/"), s(d % 11)).alias("s"),
        F.concat(F.lit("http://t/p/"), s(d % 3)).alias("p"),
        F.concat(F.lit("http://t/e/"), s(d % 7)).alias("o"),
        F.lit("u").alias("otype"),
        F.lit("").alias("dtype"), F.lit("").alias("lang"))
    b = base.where(d % 4 == 0).select(
        F.lit("default").alias("collection"), F.lit("").alias("g"),
        F.concat(F.lit("http://t/e/"), s(d % 11)).alias("s"),
        F.concat(F.lit("http://t/p/"), s(d % 3)).alias("p"),
        F.concat(F.lit("lit "), s(d % 13)).alias("o"),
        F.lit("l").alias("otype"), F.lit("").alias("dtype"),
        F.when((d % 13) % 2 == 0, "en").otherwise("").alias("lang"))
    return a.unionByName(b)


def run_wire(spark):
    import json

    from trustgraph_spark.operators.wire import (
        decode_triples_requests,
        execute_triples_requests,
    )

    reqs = spark.createDataFrame(
        [(f"r{i}", json.dumps(r)) for i, r in enumerate(
            [{"s": {"t": "i", "i": f"http://t/e/{i % 11}"}}
             for i in range(8)]
            + [{"p": {"t": "i", "i": f"http://t/p/{i % 3}"},
                "limit": 500} for i in range(8)]
            + [{"g": "urn:g:1", "limit": 500} for _ in range(4)]
            + [{} for _ in range(4)])],
        "req_id string, request string")
    dec = decode_triples_requests(reqs)
    rows = {}
    for tag, mult in (("sf0.1", 1), ("sf1", REPLICAS)):
        store = _wire_store(_docs(spark, mult)).localCheckpoint()
        n_store = store.count()

        def go():
            return execute_triples_requests(dec, store).count()

        wall, n_out = _wall(go)
        rows[tag] = {"store": n_store, "out": n_out, "wall": wall}
    return rows


def _hier_store(spark, base):
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rdfs_label = "http://www.w3.org/2000/01/rdf-schema#label"
    wdf = "http://www.w3.org/ns/prov#wasDerivedFrom"
    tg = "https://trustgraph.ai/ns/"
    page = F.concat(F.lit("urn:page:"), s(d % 10))
    chunk = F.concat(F.lit("urn:chunk:"), s(d))

    def t(sc, p, oc, otype="u"):
        return F.struct(sc.alias("s"), F.lit(p).alias("p"),
                        oc.alias("o"), F.lit(otype).alias("otype"))

    def emit(rows):
        return rows.select(F.explode("tr").alias("tr")).select(
            F.lit("default").alias("collection"),
            F.lit("urn:graph:source").alias("g"),
            F.col("tr.s").alias("s"), F.col("tr.p").alias("p"),
            F.col("tr.o").alias("o"), F.col("tr.otype").alias("otype"),
            F.lit("").alias("dtype"), F.lit("").alias("lang"))

    root = emit(base.limit(1).select(F.array(
        t(F.lit("urn:doc:root"), rdf_type, F.lit(tg + "Document")),
    ).alias("tr")))
    per_doc = emit(base.select(F.array(
        t(page, wdf, F.lit("urn:doc:root")),
        t(page, rdf_type, F.lit(tg + "Page")),
        t(page, rdfs_label, F.concat(F.lit("Page "), s(d % 10)), "l"),
        t(chunk, wdf, page),
        t(chunk, rdf_type, F.lit(tg + "Chunk")),
    ).alias("tr")))
    return root.unionByName(per_doc)


def run_hier(spark):
    from trustgraph_spark.operators.explain import extraction_hierarchy

    rows = {}
    for tag, mult in (("sf0.1", 1), ("sf1", REPLICAS)):
        store = _hier_store(spark, _docs(spark, mult)).localCheckpoint()
        n_store = store.count()

        def go():
            return extraction_hierarchy(store, "urn:doc:root").count()

        wall, n_out = _wall(go)
        rows[tag] = {"store": n_store, "nodes": n_out, "wall": wall}
    return rows


def main():
    from trustgraph_spark.session import get_spark

    spark = get_spark(cores=32)
    w = run_wire(spark)
    h = run_hier(spark)
    print("### wire dispatch (fixed 24-request batch)")
    print("| corpus | store rows | result rows | wall (s) |")
    for tag in ("sf0.1", "sf1"):
        r = w[tag]
        print(f"| {tag} | {r['store']} | {r['out']} | {r['wall']:.2f} |")
    print(f"wall growth: {w['sf1']['wall'] / w['sf0.1']['wall']:.1f}x; "
          f"out growth: {w['sf1']['out'] / max(1, w['sf0.1']['out']):.1f}x")
    print("### extraction hierarchy (fixed root)")
    print("| corpus | store rows | hierarchy rows | wall (s) |")
    for tag in ("sf0.1", "sf1"):
        r = h[tag]
        print(f"| {tag} | {r['store']} | {r['nodes']} | {r['wall']:.2f} |")
    print(f"wall growth: {h['sf1']['wall'] / h['sf0.1']['wall']:.1f}x; "
          f"node growth: {h['sf1']['nodes'] / max(1, h['sf0.1']['nodes']):.1f}x")
    spark.stop()


if __name__ == "__main__":
    main()
