"""Duplicate resolution (dedup.resolve_duplicates) vs a union-find
replay, including chain transitivity the pair list never states."""

import pytest

from trustgraph_spark.operators.dedup import resolve_duplicates


def py_resolve(doc_ids, pairs):
    parent = {i: i for i in doc_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {i: find(i) for i in doc_ids}
    sizes = {}
    for i in doc_ids:
        sizes[comp[i]] = sizes.get(comp[i], 0) + 1
    return {i: (comp[i], sizes[comp[i]], i == comp[i]) for i in doc_ids}


@pytest.mark.parametrize("pairs", [
    # chain a~b~c~d (transitivity), one 2-cluster, singletons
    [(1, 2), (2, 3), (3, 4), (10, 11)],
    # pair list order/direction must not matter
    [(4, 3), (2, 1), (3, 2), (11, 10)],
    # star + bridge merging two stars
    [(20, 21), (20, 22), (30, 31), (30, 32), (22, 32)],
])
def test_resolve_matches_union_find(spark, pairs):
    doc_ids = list(range(40))
    docs = spark.createDataFrame([(i,) for i in doc_ids], "doc_id long")
    pdf = spark.createDataFrame(pairs, "a long, b long")
    got = {r["doc_id"]: (r["canonical_id"], r["cluster_size"],
                         r["is_canonical"])
           for r in resolve_duplicates(docs, pdf).collect()}
    assert got == py_resolve(doc_ids, pairs)


def test_resolve_stale_pair_ids_never_elected(spark):
    # pair ids 100/7 link docs but 100 is absent from documents (stale
    # candidate over a filtered corpus): the cluster canonical must be
    # the minimum PRESENT doc, and... id 0 < 5 links through 100
    docs = spark.createDataFrame([(5,), (7,), (9,)], "doc_id long")
    pdf = spark.createDataFrame([(100, 5), (100, 7)], "a long, b long")
    got = {r["doc_id"]: r.asDict()
           for r in resolve_duplicates(docs, pdf).collect()}
    assert got[5]["canonical_id"] == 5 and got[5]["is_canonical"] is True
    assert got[7]["canonical_id"] == 5 and got[7]["is_canonical"] is False
    assert got[5]["cluster_size"] == 2          # only present docs count
    assert got[9]["is_canonical"] is True       # untouched singleton
    # every cluster keeps exactly one canonical survivor
    assert sum(1 for r in got.values() if r["is_canonical"]) == 2


def test_resolve_canonical_corpus(spark):
    docs = spark.createDataFrame([(i,) for i in range(10)], "doc_id long")
    pdf = spark.createDataFrame([(0, 5), (5, 9), (2, 3)], "a long, b long")
    out = resolve_duplicates(docs, pdf)
    kept = sorted(r["doc_id"] for r in out.where("is_canonical").collect())
    # {0,5,9} -> 0; {2,3} -> 2; rest singletons
    assert kept == [0, 1, 2, 4, 6, 7, 8]
