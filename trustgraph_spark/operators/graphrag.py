"""GraphRAG query-time dataflow as batch DataFrame programs (G2-G5,
SURVEY.md §2.7).

Reference: retrieval/graph_rag/graph_rag.py. The per-query async loop
(embed concepts -> vector match -> hop-and-filter BFS with label resolution
and rerank -> provenance trace) becomes a set of joins over the
materialized tables; the LRU label cache (:94-133) becomes a broadcast of
the labels dimension; the per-entity triple RPCs become one join per hop.

Reference defaults (graph_rag.py:139-151): entity_limit 50, triple_limit 30,
edge_limit 25, max_path_length 2, reranker cap 350.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import RDF_LABEL, RDF_TYPE

# schema predicates skipped during traversal except rdf:type
# (graph_rag.py:45-52)
_SKIP_PREFIXES = (
    "http://www.w3.org/2000/01/rdf-schema#",
    "http://www.w3.org/2002/07/owl#",
)

#: salt fan-out for the hop_bfs hot-node pre-cap: a source with degree D
#: sorts in partitions of ~D/256 rows instead of one D-row partition
_PRECAP_SALTS = 256


def labels_dimension(edges: DataFrame) -> DataFrame:
    """(entity, label) dimension from rdfs:label edges — the broadcast
    replacement for the reference's LRU+TTL label cache (G4)."""
    return (
        edges.where(F.col("p") == RDF_LABEL)
        .groupBy(F.col("s").alias("entity"))
        .agg(F.min("o").alias("label"))
    )


def traversal_edges(edges: DataFrame) -> DataFrame:
    """Default-graph edges eligible for BFS traversal: schema predicates
    (rdfs:/owl:) are skipped except rdf:type (graph_rag.py:45-52)."""
    keep = (~F.col("p").startswith(_SKIP_PREFIXES[0])) & (
        ~F.col("p").startswith(_SKIP_PREFIXES[1])
    ) | (F.col("p") == RDF_TYPE)
    return edges.where((F.col("g") == "") & keep)


def hop_bfs(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 2,
    per_hop_limit: int = 30,
    seed_col: str = "entity",
    group_col: str | None = None,
) -> DataFrame:
    """Hop-and-filter BFS (G3): frontier joins the traversal edges on
    either endpoint per hop, dedupes seen edges, caps expansion per source
    entity (the reference's per-entity triple_limit), and feeds targets
    into the next frontier minus visited.

    When ``group_col`` is given (e.g. query_id), the BFS runs per group:
    every frontier node carries the group of the seed that discovered it,
    so hop-N edges are attributed to the query whose traversal reached
    them (the reference accumulates triples per query, graph_rag.py
    hop_and_filter) — not just edges incident to the seed itself.

    Iterative DataFrame loop — the frontier is small (seed top-k), so each
    hop is a broadcast join against the (large) edge table; no edge-table
    shuffle. Returns distinct selected edges with the hop number (and the
    group column when requested)."""
    trav = traversal_edges(edges).select("s", "p", "o", "otype")

    grp = group_col or "_grp"
    if group_col is None:
        seeds = seeds.withColumn(grp, F.lit(""))
    frontier = seeds.select(F.col(grp), F.col(seed_col).alias("node")).distinct()
    visited_nodes = frontier
    seen_edges = None
    out = None
    edge_key = [grp, "s", "p", "o"]

    for hop in range(1, max_hops + 1):
        fb = F.broadcast(frontier)
        fwd = trav.join(fb, trav.s == F.col("node"), "inner").drop("node")
        rev = trav.join(fb, trav.o == F.col("node"), "inner").drop("node")
        hop_edges = fwd.unionByName(rev).distinct()
        if seen_edges is not None:
            hop_edges = hop_edges.join(seen_edges, edge_key, "left_anti")
        # per-(group, source) expansion cap (reference per-entity limit 30).
        # Hot-node guard: the exact window alone would sort EVERY
        # frontier-incident edge of a celebrity source in ONE partition —
        # a skew stall at web-scale degrees. A salted partial top-k first
        # bounds any single sort partition to ~degree/_PRECAP_SALTS rows;
        # the exact cap then sees at most _PRECAP_SALTS * per_hop_limit
        # rows per source. The global (p, o) top-k is contained in the
        # union of per-salt top-ks, so results are identical (asserted
        # against the unsalted window in test_embeddings_graphrag).
        w_pre = Window.partitionBy(grp, "s", "_salt").orderBy("p", "o")
        w = Window.partitionBy(grp, "s").orderBy("p", "o")
        hop_edges = (
            hop_edges.withColumn(
                "_salt", F.pmod(F.xxhash64("p", "o"), F.lit(_PRECAP_SALTS))
            )
            .withColumn("rn", F.row_number().over(w_pre))
            .where(F.col("rn") <= per_hop_limit)
            .drop("rn", "_salt")
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= per_hop_limit)
            .drop("rn")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint()
        )
        out = hop_edges if out is None else out.unionByName(hop_edges)
        seen_edges = (
            hop_edges.select(*edge_key)
            if seen_edges is None
            else seen_edges.union(hop_edges.select(*edge_key)).distinct()
        )
        # next frontier: both endpoints that are URIs, minus visited
        nxt = (
            hop_edges.select(F.col(grp), F.col("o").alias("node"))
            .where(F.col("node").startswith("http"))
            .union(hop_edges.select(F.col(grp), F.col("s").alias("node")))
            .distinct()
            .join(visited_nodes, [grp, "node"], "left_anti")
            .localCheckpoint()
        )
        visited_nodes = visited_nodes.union(nxt).distinct()
        frontier = nxt
        if frontier.isEmpty():
            break
    if out is None:
        out = (
            trav.limit(0)
            .withColumn(grp, F.lit(""))
            .withColumn("hop", F.lit(0))
        )
    return out.drop(grp) if group_col is None else out


def resolve_labels(selected: DataFrame, labels: DataFrame) -> DataFrame:
    """Attach s/p/o labels (G4). The labels dimension is corpus-sized (one
    row per labeled entity) — never broadcast it. Instead semi-join-reduce
    it by the BFS-bounded key set of `selected` (a broadcast semi join: the
    tiny side is the keys), then broadcast the reduced dimension into the
    three left joins. The labels scan never shuffles; the broadcast is
    bounded by |selected| keys, replacing the reference's LRU label cache."""
    keys = (
        selected.select(F.col("s").alias("entity"))
        .union(selected.select(F.col("p").alias("entity")))
        .union(selected.select(F.col("o").alias("entity")))
        .distinct()
    )
    lab = F.broadcast(labels.join(F.broadcast(keys), "entity", "left_semi"))
    return (
        selected.join(
            lab.select(F.col("entity").alias("s"), F.col("label").alias("s_label")),
            "s", "left",
        )
        .join(
            lab.select(F.col("entity").alias("p"), F.col("label").alias("p_label")),
            "p", "left",
        )
        .join(
            lab.select(F.col("entity").alias("o"), F.col("label").alias("o_label")),
            "o", "left",
        )
    )


def retrieval_provenance_triples(
    selected: DataFrame,
    query_id_col: str = "query_id",
    collection: str = "default",
) -> DataFrame:
    """G7 explainability emission: per query, a retrieval PROV entity in
    urn:graph:retrieval with one tg:selectedEdge RDF-star row per selected
    edge (reference graph_rag.py:667-868, provenance/triples.py:372-833).
    Deterministic retrieval URIs keyed on the query id."""
    from ..constants import GRAPH_RETRIEVAL, OTYPE_TRIPLE, OTYPE_URI, PROV_ENTITY, RDF_TYPE, TG
    from .provenance import quoted_triple_json

    base = selected.withColumn(
        "_ret_uri",
        F.concat(F.lit("urn:trustgraph:retrieval:"), F.sha2(F.col(query_id_col), 256)),
    )
    sel_rows = base.select(
        F.lit(collection).alias("collection"),
        F.lit(GRAPH_RETRIEVAL).alias("g"),
        F.col("_ret_uri").alias("s"),
        F.lit(TG + "selectedEdge").alias("p"),
        quoted_triple_json(F.col("s"), F.col("p"), F.col("o"), F.col("otype")).alias("o"),
        F.lit(OTYPE_TRIPLE).alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )
    typed = base.select("_ret_uri").distinct().select(
        F.lit(collection).alias("collection"),
        F.lit(GRAPH_RETRIEVAL).alias("g"),
        F.col("_ret_uri").alias("s"),
        F.lit(RDF_TYPE).alias("p"),
        F.lit(PROV_ENTITY).alias("o"),
        F.lit(OTYPE_URI).alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )
    return sel_rows.unionByName(typed)


def graph_rag_retrieve(
    edges: DataFrame,
    entity_embeddings: DataFrame,
    query_vectors: DataFrame,
    entity_limit: int = 50,
    max_hops: int = 2,
    per_hop_limit: int = 30,
    edge_limit: int = 25,
) -> DataFrame:
    """Full G2->G4 retrieval: seed entities by vector match, BFS expand,
    label-resolve, score and cap at edge_limit per query (the cross-encoder
    rerank seam (V4) reduces to a deterministic hop/degree score here;
    a real reranker plugs in as a pandas UDF on the labeled edges)."""
    from .embeddings import cosine_topk

    seeds = cosine_topk(
        entity_embeddings, query_vectors, k=entity_limit
    ).select(F.col("query_id"), F.col("entity_uri").alias("entity"), "score")

    # group-aware BFS: each hop edge carries the query whose frontier
    # discovered it, so hop-2 edges (subjects are hop-1 nodes) and reverse
    # edges (seed as object) are attributed correctly — not just s==seed
    selected = hop_bfs(
        edges, seeds, max_hops=max_hops, per_hop_limit=per_hop_limit,
        group_col="query_id",
    )
    labeled = resolve_labels(selected, labels_dimension(edges))

    w = Window.partitionBy("query_id").orderBy(F.asc("hop"), F.asc("s"), F.asc("p"), F.asc("o"))
    return (
        labeled.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= edge_limit)
        .drop("rn")
    )
