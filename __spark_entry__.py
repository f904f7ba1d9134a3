"""Driver contract for the spark-graft builder (PySpark target).

entry(spark): flagship documents-KG pipeline at sf0.001.
queries(): implemented operators from SURVEY.md §2 + the training-data
pipeline family (dedup / similarity / text analysis), each paired with a
DuckDB-runnable ANSI-SQL oracle in oracle_sql().
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF0001 = "/root/testdata/sf0.001"

VOCAB = [
    "spark", "hash", "merge", "join", "table", "scan",
    "window", "batch", "stream", "vector", "query", "filter",
]
_VOCAB_SQL = ", ".join(f"'{w}'" for w in VOCAB)

TG = "http://trustgraph.ai/e/"
RDF_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
CO_URI = TG + "co_occurs_with"


def _spread(df: DataFrame) -> DataFrame:
    """Scale-adaptive scan widening (optimization guide §2.5, input
    skew).  The test fixtures are ONE parquet file with ONE row group,
    so the scan is a single task and every expression above the first
    exchange — the md5/n-gram folds, the mapInPandas seams, the masked
    store passes — runs on one core no matter how many the session has
    (measured: the whole hygiene family scaled ~linearly with SF
    instead of flat, 2.8s -> 22.7s for ngram_repetition at sf0.1 ->
    sf1.0 on local[32]).  Round-robin repartition to the session
    parallelism; the shuffle moves a few MB once.  Conditional on the
    scan actually being narrower than the session: a real multi-file
    corpus (the 100 TB case) already scans wide and must NOT pay a
    pointless full-corpus shuffle, so this is a no-op there."""
    spark = df.sparkSession
    n = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n:
        return df.repartition(n)
    return df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NOT spread: the events queries shuffle on session/window keys
    # immediately with only cheap projections above the exchange, so the
    # widening shuffle is pure overhead (measured +1.3s at sf1.0 across
    # the two events queries, no compute to parallelize)
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _spread(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the full KG-construction core over sf0.001 — planted
    chunks -> mapInPandas extraction (E2+E3) -> triple construction with
    to_uri minting -> provenance envelope (E11) -> entity linking/CC ->
    deduped edges manifest. Exercises the correctness-critical extraction
    path end-to-end (VERDICT r1: the old flagship bypassed E2/E3)."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_all,
        relationships_to_triples,
        split_extractions,
    )
    from trustgraph_spark.operators.linking import (
        canonical_mapping,
        canonicalize_triples,
    )
    from trustgraph_spark.operators.materialize import materialize_edges
    from trustgraph_spark.operators.provenance import subgraph_provenance_triples
    from trustgraph_spark.planted import planted_def_chunks, planted_rel_chunks

    docs = _docs(spark, SF0001)
    chunks = planted_def_chunks(docs).unionByName(
        planted_rel_chunks(docs).select(
            F.concat(F.col("chunk_id"), F.lit(":r")).alias("chunk_id"),
            "root_id", "collection", "text",
        )
    )
    defs, rels = split_extractions(extract_all(chunks, RuleExtractor()))
    content = definitions_to_triples(defs).unionByName(relationships_to_triples(rels))
    triples = content.unionByName(
        subgraph_provenance_triples(content, "kg-extract")
    )
    mapping = canonical_mapping(content, threshold=0.95)
    return materialize_edges(canonicalize_triples(triples, mapping))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_kg_mentions(spark, sf_dir):
    from trustgraph_spark.docskg import doc_mentions

    return doc_mentions(_docs(spark, sf_dir), VOCAB)


def q_kg_label_triples(spark, sf_dir):
    from trustgraph_spark.docskg import doc_mentions, mention_label_triples

    t = mention_label_triples(doc_mentions(_docs(spark, sf_dir), VOCAB))
    return t.select("s", "p", "o", "otype")


def q_kg_cooccur_edges(spark, sf_dir):
    from trustgraph_spark.docskg import cooccurrence_edges, doc_mentions

    return cooccurrence_edges(doc_mentions(_docs(spark, sf_dir), VOCAB)).select(
        "s", "p", "o", F.col("n_docs").cast("long").alias("n_docs")
    )


def q_kg_quads_by_entity(spark, sf_dir):
    from trustgraph_spark.docskg import cooccurrence_triples, doc_mentions
    from trustgraph_spark.operators.materialize import (
        materialize_edges,
        materialize_quads_by_entity,
    )

    edges = materialize_edges(
        cooccurrence_triples(doc_mentions(_docs(spark, sf_dir), VOCAB))
    )
    return materialize_quads_by_entity(edges).select("entity", "role", "s", "p", "o")


def q_kg_nodes_degree(spark, sf_dir):
    from trustgraph_spark.docskg import cooccurrence_triples, doc_mentions
    from trustgraph_spark.operators.materialize import (
        materialize_edges,
        materialize_nodes,
    )

    edges = materialize_edges(
        cooccurrence_triples(doc_mentions(_docs(spark, sf_dir), VOCAB))
    )
    return materialize_nodes(edges).select(
        "entity", "label", F.col("degree").cast("long").alias("degree")
    )


def q_kg_pattern_po(spark, sf_dir):
    from trustgraph_spark.docskg import cooccurrence_triples, doc_mentions
    from trustgraph_spark.operators.materialize import materialize_edges
    from trustgraph_spark.operators.triples_query import match_triples

    edges = materialize_edges(
        cooccurrence_triples(doc_mentions(_docs(spark, sf_dir), VOCAB))
    )
    return match_triples(edges, p=CO_URI, o=TG + "spark", g="").select("s")


def q_kg_def_triples(spark, sf_dir):
    """E2: definitions extraction -> 2 triples per valid object, through the
    real mapInPandas extractor and the to_uri_udf percent-encoding seam
    (incl. non-ASCII 'café' -> %C3%A9 and '&' -> %26 entities)."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.planted import planted_def_chunks

    chunks = planted_def_chunks(_docs(spark, sf_dir))
    return definitions_to_triples(
        extract_definitions(chunks, RuleExtractor())
    ).select("s", "p", "o", "otype")


def q_kg_entity_contexts(spark, sf_dir):
    """E2 side-channel: 2 EntityContexts (name + definition) per valid
    definition, with chunk provenance."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_entity_contexts,
        extract_definitions,
    )
    from trustgraph_spark.planted import planted_def_chunks

    chunks = planted_def_chunks(_docs(spark, sf_dir))
    return definitions_entity_contexts(extract_definitions(chunks, RuleExtractor()))


def q_kg_rel_triples(spark, sf_dir):
    """E3: relationships extraction -> rel triple + s/p labels + o URI/label
    iff object-entity; literal object for the 'produces value' dialect."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        extract_relationships,
        relationships_to_triples,
    )
    from trustgraph_spark.planted import planted_rel_chunks

    chunks = planted_rel_chunks(_docs(spark, sf_dir))
    return relationships_to_triples(
        extract_relationships(chunks, RuleExtractor())
    ).select("s", "p", "o", "otype")


def q_kg_prov_triples(spark, sf_dir):
    """E11: per-chunk provenance envelope + tg:contains RDF-star rows in
    urn:graph:source, deterministic hash URIs, byte-exact JSON quoting."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.operators.provenance import subgraph_provenance_triples
    from trustgraph_spark.planted import planted_def_chunks

    chunks = planted_def_chunks(_docs(spark, sf_dir))
    content = definitions_to_triples(extract_definitions(chunks, RuleExtractor()))
    return subgraph_provenance_triples(content, "kg-extract").select(
        "g", "s", "p", "o", "otype"
    )


def q_kg_linking_cc(spark, sf_dir):
    """Entity linking: blocking -> trigram-Jaccard -> connected components
    (alternating star) -> canonical-min mapping, over planted near-duplicate
    mention labels ('entity N' / 'entity Ns')."""
    from trustgraph_spark.operators.linking import canonical_mapping
    from trustgraph_spark.planted import planted_mention_triples

    triples = planted_mention_triples(_docs(spark, sf_dir))
    return canonical_mapping(triples, threshold=0.65)


def q_dedup_exact_groups(spark, sf_dir):
    from trustgraph_spark.operators.dedup import normalize_text_col

    return (
        _docs(spark, sf_dir)
        .select(F.md5(normalize_text_col(F.col("text"))).alias("text_hash"), "doc_id")
        .groupBy("text_hash")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.min("doc_id").alias("representative"),
        )
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    """PPJoin prefix-filtered exact Jaccard (lossless vs the inverted-index
    path — equality asserted in tests; the oracle checks the result set)."""
    from trustgraph_spark.operators.dedup import ngram_jaccard_pairs_prefix

    return ngram_jaccard_pairs_prefix(
        _docs(spark, sf_dir), n=3, threshold=0.3, max_shingle_freq=100
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    from trustgraph_spark.operators.dedup import minhash_lsh_candidates

    return minhash_lsh_candidates(
        _docs(spark, sf_dir), n=3, num_hashes=16, bands=4
    )


def q_doc_fingerprint(spark, sf_dir):
    from trustgraph_spark.operators.textstats import doc_fingerprint

    return doc_fingerprint(_docs(spark, sf_dir))


def q_token_count(spark, sf_dir):
    from trustgraph_spark.operators.textstats import token_count

    df = token_count(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_tokens_ws").cast("long").alias("n_tokens_ws"),
        F.col("n_tokens_bpeish").cast("long").alias("n_tokens_bpeish"),
        F.col("n_chars").cast("long").alias("n_chars"),
    )


def q_quality_score(spark, sf_dir):
    from trustgraph_spark.operators.textstats import quality_score

    df = quality_score(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_chars").cast("long").alias("n_chars"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        "mean_token_len",
        "stopword_ratio",
        "punct_ratio",
        "alpha_ratio",
    )


def q_language_id(spark, sf_dir):
    from trustgraph_spark.operators.textstats import language_id

    return language_id(_docs(spark, sf_dir))


def q_ann_cosine_topk(spark, sf_dir):
    from trustgraph_spark.operators.embeddings import cosine_topk

    emb = _emb(spark, sf_dir)
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vector")
    )
    out = cosine_topk(
        emb, queries, k=5, id_col="vec_id", vec_col="embedding"
    )
    return out.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.round("score", 4).alias("score"),
    )


def q_events_sessionize(spark, sf_dir):
    from pyspark.sql import Window

    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    sess = (
        ev.withColumn(
            "new_s",
            F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn("session_idx", F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ))
    )
    return sess.groupBy("user_id", "session_idx").agg(
        F.count("*").cast("long").alias("n_events"),
        F.unix_timestamp(F.min("ts")).alias("session_start"),
        F.round(F.sum("value"), 2).alias("total_value"),
    ).select(
        "user_id",
        F.col("session_idx").cast("long").alias("session_idx"),
        "n_events", "session_start", "total_value",
    )


def q_events_window_agg(spark, sf_dir):
    ev = _events(spark, sf_dir)
    return ev.groupBy(
        F.unix_timestamp(F.date_trunc("hour", F.col("ts"))).alias("hour_start"),
        "event_type",
    ).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


def q_pricing_summary(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count("*").cast("long").alias("count_order"),
        )
    )


def q_kg_bgp_two_hop(spark, sf_dir):
    """SPARQL-algebra BGP over the co-occurrence graph: ?x co ?y . ?y co ?z."""
    from trustgraph_spark.docskg import cooccurrence_triples, doc_mentions
    from trustgraph_spark.operators.algebra import Var, bgp
    from trustgraph_spark.operators.materialize import materialize_edges

    edges = materialize_edges(
        cooccurrence_triples(doc_mentions(_docs(spark, sf_dir), VOCAB))
    )
    sol = bgp(edges, [(Var("x"), CO_URI, Var("y")), (Var("y"), CO_URI, Var("z"))])
    return sol.select(
        F.col("x.value").alias("x"),
        F.col("y.value").alias("y"),
        F.col("z.value").alias("z"),
    )


def _cooccur_edges_table(spark, sf_dir):
    from trustgraph_spark.docskg import cooccurrence_triples, doc_mentions
    from trustgraph_spark.operators.materialize import materialize_edges

    return materialize_edges(
        cooccurrence_triples(doc_mentions(_docs(spark, sf_dir), VOCAB))
    )


def q_sparql_two_hop(spark, sf_dir):
    """SPARQL string front-end: parse a SELECT with a 2-pattern BGP +
    FILTER and evaluate through the algebra combinators."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    return sparql_select(
        edges,
        f"SELECT ?x ?z WHERE {{ ?x <{CO_URI}> ?y . ?y <{CO_URI}> ?z "
        f"FILTER (?x != ?z) }}",
    )


def q_sparql_group_count(spark, sf_dir):
    """SPARQL GROUP BY + COUNT through the string front-end."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    out = sparql_select(
        edges,
        f"SELECT ?x (COUNT(?y) AS ?n) WHERE {{ ?x <{CO_URI}> ?y }} GROUP BY ?x",
    )
    return out.select("x", F.col("n").cast("long").alias("n"))


def q_simhash16(spark, sf_dir):
    from trustgraph_spark.operators.dedup import simhash

    return simhash(_docs(spark, sf_dir), bits=16).select(
        "doc_id", F.col("simhash").cast("long").alias("simhash")
    )


def q_minhash_sig4(spark, sf_dir):
    from trustgraph_spark.operators.dedup import minhash_signatures

    sig = minhash_signatures(_docs(spark, sf_dir), n=3, num_hashes=4)
    return sig.select(
        "doc_id",
        *[F.col("sig").getItem(i).alias(f"h{i}") for i in range(4)],
    )


def q_revenue_by_nation(spark, sf_dir):
    """Multi-join rollup: customer x orders x lineitem x nation; dims
    broadcast, fact side never shuffles until the final agg."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


def q_top_parts_by_size(spark, sf_dir):
    """Window top-k per group: 3 most expensive parts per p_size."""
    from pyspark.sql import Window

    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    w = Window.partitionBy("p_size").orderBy(
        F.desc("p_retailprice"), F.asc("p_partkey")
    )
    return (
        part.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("p_size", "p_partkey", "p_retailprice",
                F.col("rn").cast("long").alias("rn"))
    )


def q_chunk_recursive(spark, sf_dir):
    """S2: fixed-size overlapping character chunker (pure column
    expressions; 120/20 so the sf docs split into several chunks)."""
    from trustgraph_spark.operators.chunking import recursive_chunker

    out = recursive_chunker(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        chunk_size=120, chunk_overlap=20,
    )
    return out.select(
        "chunk_id", "root_id", F.col("turn_idx").cast("long").alias("chunk_index"),
        "text",
    )


def q_chunk_token(spark, sf_dir):
    """S3: whitespace-token chunker, 40-token chunks with 5-token overlap."""
    from trustgraph_spark.operators.chunking import token_chunker

    out = token_chunker(
        _docs(spark, sf_dir), id_col="doc_id", text_col="text",
        tokens_per_chunk=40, token_overlap=5,
    )
    return out.select(
        "chunk_id", "root_id", F.col("turn_idx").cast("long").alias("chunk_index"),
        "text",
    )


def q_graphrag_hop2(spark, sf_dir):
    """G3+G4: 2-hop hop-and-filter BFS from a seed entity over the
    co-occurrence graph (frontier broadcast, per-source expansion cap,
    seen-edge dedup), then label resolution via the semi-join-reduced
    labels dimension."""
    from trustgraph_spark.operators.graphrag import (
        hop_bfs,
        labels_dimension,
        resolve_labels,
    )

    # materialize the derived fixture once: in deployment the BFS scans a
    # stored edge table, not the mention->cooccur derivation pipeline
    # (which would otherwise recompute on every per-hop job)
    edges = _cooccur_edges_table(spark, sf_dir).localCheckpoint()
    seeds = spark.createDataFrame([(TG + "spark",)], "entity string")
    sel = hop_bfs(edges, seeds, max_hops=2, per_hop_limit=30)
    out = resolve_labels(sel, labels_dimension(edges))
    return out.select(
        "s", "p", "o", F.col("hop").cast("long").alias("hop"),
        "s_label", "o_label",
    )


def q_sparql_optional(spark, sf_dir):
    """A3 OPTIONAL through the string front-end: left-joined second hop."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    return sparql_select(
        edges,
        f"SELECT ?x ?y ?z WHERE {{ ?x <{CO_URI}> ?y "
        f"OPTIONAL {{ ?y <{CO_URI}> ?z }} }}",
    )


def q_sparql_union_bind(spark, sf_dir):
    """A5 UNION + BIND: forward and reverse neighbors of a seed, tagged."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    seed = TG + "spark"
    return sparql_select(
        edges,
        f"SELECT ?a ?dir WHERE {{ "
        f"{{ <{seed}> <{CO_URI}> ?a . BIND(\"fwd\" AS ?dir) }} UNION "
        f"{{ ?a <{CO_URI}> <{seed}> . BIND(\"rev\" AS ?dir) }} }}",
    )


def q_sparql_minus_values(spark, sf_dir):
    """A4 MINUS + A13 VALUES: edges from an inline seed set, minus
    solutions whose subject also links to a specific node."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    vals = " ".join(f"<{TG}{w}>" for w in ("hash", "join", "spark"))
    return sparql_select(
        edges,
        f"SELECT ?x ?y WHERE {{ VALUES ?x {{ {vals} }} ?x <{CO_URI}> ?y "
        f'MINUS {{ ?x <{RDF_LABEL}> "spark" }} }}',
    )


def q_sparql_builtins(spark, sf_dir):
    """A15 scalar builtins through the front-end: STR/STRAFTER/STRBEFORE
    (absent-delimiter -> ''), STRLEN, UCASE, CONTAINS, IF."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    out = sparql_select(
        edges,
        f"SELECT ?o ?name ?n ?up ?pre WHERE {{ ?x <{RDF_LABEL}> ?o . "
        f'BIND(STRAFTER(STR(?x), "/e/") AS ?name) '
        f"BIND(STRLEN(?o) AS ?n) BIND(UCASE(?o) AS ?up) "
        f'BIND(IF(CONTAINS(?o, "a"), STRBEFORE(?o, "a"), "-") AS ?pre) }}',
    )
    return out.select(
        "o", "name", F.col("n").cast("long").alias("n"), "up", "pre"
    )


def q_sparql_having_ask(spark, sf_dir):
    """GROUP BY + HAVING through the front-end, unioned with two ASK
    results (true and false) encoded as count rows so one gated query
    covers both forms."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    hv = sparql_select(
        edges,
        f"SELECT ?x (COUNT(?y) AS ?n) WHERE {{ ?x <{CO_URI}> ?y }} "
        f"GROUP BY ?x HAVING (COUNT(?y) >= 3)",
    ).select("x", F.col("n").cast("long").alias("n"))
    ask_t = sparql_select(edges, f"ASK {{ <{TG}spark> <{CO_URI}> ?y }}")
    ask_f = sparql_select(edges, f"ASK {{ <{TG}spark> <{TG}never> ?y }}")
    asks = ask_t.unionByName(ask_f).select(
        F.concat(F.lit("ask:"), F.col("ask").cast("string")).alias("x"),
        F.lit(-1).cast("long").alias("n"),
    )
    return hv.unionByName(asks)


def q_sparql_construct(spark, sf_dir):
    """CONSTRUCT evaluation: template instantiation per solution + graph
    dedup; constant objects typed literal, var objects keep their term
    type."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    return sparql_select(
        edges,
        f"CONSTRUCT {{ ?x <{TG}linked2> ?z . ?x <{RDF_LABEL}> \"hub\" }} "
        f"WHERE {{ ?x <{CO_URI}> ?y . ?y <{CO_URI}> ?z }}",
    )


def q_sparql_describe(spark, sf_dir):
    """DESCRIBE evaluation: concise bounded description of a constant IRI
    plus WHERE-bound resources."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    return sparql_select(
        edges,
        f"DESCRIBE <{TG}spark> ?x WHERE {{ ?x <{RDF_LABEL}> \"hash\" }}",
    )


def q_sparql_graph_clause(spark, sf_dir):
    """A14 GRAPH <iri>: pattern scoped to the named provenance graph
    (urn:graph:source) — derivation edges only, not default-graph
    content."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.operators.provenance import subgraph_provenance_triples
    from trustgraph_spark.planted import planted_def_chunks
    from trustgraph_spark.sparql import sparql_select

    chunks = planted_def_chunks(_docs(spark, sf_dir))
    content = definitions_to_triples(extract_definitions(chunks, RuleExtractor()))
    edges = content.unionByName(
        subgraph_provenance_triples(content, "kg-extract"),
        allowMissingColumns=True,
    )
    return sparql_select(
        edges,
        "SELECT ?sg ?chunk WHERE { GRAPH <urn:graph:source> "
        "{ ?sg <http://www.w3.org/ns/prov#wasDerivedFrom> ?chunk } }",
    )


def q_agent_triples(spark, sf_dir):
    """E4: combined type-discriminated agent extraction (single JSONL with
    'definition'/'relationship' objects, fences + invalid lines skipped,
    object-entity defaulting True) minted with the agent URI dialect
    (quote only — no lowercase/hyphenation)."""
    from trustgraph_spark.operators.extract_extras import (
        AgentExtractor,
        agent_extractions_to_triples,
        extract_agent,
    )
    from trustgraph_spark.planted import (
        planted_agent_jsonl,
        planted_def_chunks,
        planted_rel_chunks,
    )

    docs = _docs(spark, sf_dir)
    chunks = planted_def_chunks(docs).unionByName(planted_rel_chunks(docs))
    # checkpoint: the def and rel triple branches both read the
    # extraction output — unmaterialized, the mapInPandas seam would run
    # twice (2 MapInPandas nodes in the plan, measured 2x the seam cost)
    ex = extract_agent(chunks, AgentExtractor(planted_agent_jsonl)).localCheckpoint()
    return agent_extractions_to_triples(ex).select("s", "p", "o", "otype")


def q_topic_triples(spark, sf_dir):
    """E7: kg-extract-topics post-processing — label + skos:definition per
    valid topic, E1 URI dialect; null/empty topics filtered."""
    from trustgraph_spark.operators.extract_extras import topics_to_triples
    from trustgraph_spark.planted import planted_topics

    return topics_to_triples(planted_topics(_docs(spark, sf_dir))).select(
        "s", "p", "o", "otype"
    )


def q_rows_validate(spark, sf_dir):
    """E8: schema-directed row validation — primary-field presence and enum
    membership over planted JSON objects."""
    from trustgraph_spark.operators.extract_extras import validate_rows
    from trustgraph_spark.planted import planted_row_objects

    fields = [
        {"name": "name", "type": "string", "primary": True},
        {"name": "city", "type": "string", "enum_values": ["a", "b"]},
        {"name": "age", "type": "string"},
    ]
    out = validate_rows(planted_row_objects(_docs(spark, sf_dir)), fields)
    return out.select("doc_id", "name", "city", "age", F.col("_valid").alias("valid"))


def _two_collection_triples(spark, sf_dir):
    from trustgraph_spark.planted import planted_mention_triples

    t = planted_mention_triples(_docs(spark, sf_dir))
    # labels ending in 's' (the %3 planted variants) go to a second
    # collection so the admin/export ops have something to slice
    return t.withColumn(
        "collection",
        F.when(F.col("s").endswith("s"), F.lit("colb")).otherwise(F.lit("default")),
    )


def q_onto_select(spark, sf_dir):
    """E5: OntoRAG per-chunk ontology-subset selection through the real
    embedding + broadcast cosine path. Single-token element texts with
    distinct hash buckets (verified at fixture-build time) make the
    selection exact: each chunk matches exactly its element at cosine 1.0;
    the 0.3 threshold drops every non-match, so no tie-break enters."""
    from trustgraph_spark.operators.ontology import select_ontology_subset

    elements = spark.createDataFrame(
        [("kb", "class", f"onto{i}", None, None, None, None, None, None)
         for i in range(6)],
        "ontology_id string, element_type string, element_id string, "
        "label string, comment string, subclass_of string, domain string, "
        "range string, inverse_of string",
    )
    chunks = _docs(spark, sf_dir).select(
        F.concat(F.lit("urn:chunk:"), F.col("doc_id").cast("string")).alias("chunk_id"),
        F.concat(F.lit("onto"), (F.col("doc_id") % 6).cast("string")).alias("text"),
    )
    out = select_ontology_subset(chunks, elements, top_k=3,
                                 similarity_threshold=0.3)
    return out.select(
        "chunk_id", "ontology_id", "element_type", "element_id",
        F.round("score", 4).alias("score"),
    )


def q_jsonl_parse(spark, sf_dir):
    """E9: resilient JSONL parsing — markdown fences stripped, invalid
    lines and non-object JSON skipped, surviving objects re-serialized
    canonically (sorted keys)."""
    from trustgraph_spark.operators.extract_extras import parse_jsonl_udf

    n = (F.col("doc_id") % 50).cast("string")
    raw = F.concat(
        F.lit('```json\nthis is not json {\n{"b": 1, "a": "x '),
        n,
        F.lit('"}\n["an", "array"]\n{"type": "topic", "name": "t '),
        n,
        F.lit('"}\n```'),
    )
    d = _docs(spark, sf_dir).select("doc_id", raw.alias("raw"))
    return d.select(
        "doc_id", F.explode(parse_jsonl_udf(F.col("raw"))).alias("obj")
    )


def q_term_reconstruct(spark, sf_dir):
    """Q3: term reconstruction heuristics over planted values — otype
    drives the tag; null-otype http(s) strings fall back to IRI; struct
    flattened to columns for the gate."""
    from trustgraph_spark.operators.triples_query import reconstruct_term

    d = F.col("doc_id")
    value = (
        F.when(d % 5 == 0, F.concat(F.lit("http://e/x"), d.cast("string")))
        .when(d % 5 == 1, F.concat(F.lit("plain text "), d.cast("string")))
        .when(d % 5 == 2, F.lit('{"s": {}}'))
        .when(d % 5 == 3, F.concat(F.lit("https://bare/"), d.cast("string")))
        .otherwise(F.concat(F.lit("not a uri "), d.cast("string")))
    )
    otype = (
        F.when(d % 5 == 0, F.lit("u"))
        .when(d % 5 == 1, F.lit("l"))
        .when(d % 5 == 2, F.lit("t"))
        .otherwise(F.lit(None).cast("string"))
    )
    lang = F.when(d % 5 == 1, F.lit("en")).otherwise(F.lit(""))
    t = _docs(spark, sf_dir).select(
        "doc_id",
        reconstruct_term(value, otype, F.lit(""), lang).alias("t"),
    )
    return t.select(
        "doc_id",
        F.col("t.type").alias("ttype"),
        F.col("t.value").alias("tvalue"),
        F.col("t.language").alias("tlang"),
    )


def q_graph_embed_map(spark, sf_dir):
    """V2/S6: EntityContexts -> GraphEmbeddings through the real
    embed_entity_contexts mapInPandas path; single-token contexts make the
    bucket observable exactly as in text_embed_bucket."""
    from trustgraph_spark.operators.embeddings import embed_entity_contexts

    ctx = _docs(spark, sf_dir).select(
        F.lit("default").alias("collection"),
        F.concat(F.lit(TG), F.lit("e"), F.col("doc_id").cast("string")).alias("entity_uri"),
        F.concat(F.lit("ctx"), (F.col("doc_id") % 250).cast("string")).alias("context"),
        F.concat(F.lit("urn:chunk:"), F.col("doc_id").cast("string")).alias("chunk_id"),
    )
    emb = embed_entity_contexts(ctx)
    return emb.select(
        "collection", "entity_uri", "chunk_id",
        F.array_position(F.col("vector"), F.array_max("vector"))
        .cast("long").alias("bucket1"),
    )


def q_text_embed_bucket(spark, sf_dir):
    """V1/V2: the text-embedding seam driven through the gate. Single-token
    contexts go through the REAL mapInPandas embedder (per-worker model,
    Arrow batches); a single token makes the unit-normalized output exactly
    one 1.0 at bucket crc32(token) % 64 — the oracle recomputes crc32 with
    a table-driven fold in SQL, so the hashing path is verified bit-exact
    while float32 normalization noise cannot enter."""
    from trustgraph_spark.operators.embeddings import embed_texts

    docs = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("tok"), (F.col("doc_id") % 250).cast("string")).alias("context"),
    )
    emb = embed_texts(docs, "context", "vector")
    return emb.select(
        "doc_id", "context",
        F.array_position(F.col("vector"), F.array_max("vector"))
        .cast("long").alias("bucket1"),
        F.round(F.array_max("vector"), 4).alias("vmax"),
    )


def q_entity_normalize(spark, sf_dir):
    """E6: entity-name normalization — lower, whitespace/underscore to
    hyphen, strip non-word (Unicode-aware), trim/collapse hyphens — over
    planted messy names incl. accents, punctuation, and hyphen runs."""
    from trustgraph_spark.uris import normalize_entity_name_col

    d = F.col("doc_id")
    raw = (
        F.when(d % 4 == 0, F.concat(F.lit("  My_Entity  "), d.cast("string")))
        .when(d % 4 == 1, F.concat(F.lit("café!! "), d.cast("string"), F.lit(" (beta)")))
        .when(d % 4 == 2, F.concat(F.lit("--Spaced---name-"), d.cast("string"), F.lit("--")))
        .otherwise(F.concat(F.lit("v1.2_of "), d.cast("string")))
    )
    return _docs(spark, sf_dir).select(
        "doc_id", raw.alias("raw"),
        normalize_entity_name_col(raw).alias("normalized"),
    )


def q_retrieval_prov(spark, sf_dir):
    """G7: retrieval explainability — per-query PROV entity with one
    tg:selectedEdge RDF-star row per selected edge in urn:graph:retrieval,
    deterministic retrieval URIs keyed on the query id."""
    from trustgraph_spark.operators.graphrag import retrieval_provenance_triples

    edges = _cooccur_edges_table(spark, sf_dir)
    selected = edges.where(
        (F.col("s") == TG + "spark") & (F.col("p") == CO_URI)
    ).withColumn("query_id", F.lit("q1"))
    return retrieval_provenance_triples(selected).select("g", "s", "p", "o", "otype")


def q_prov_trace(spark, sf_dir):
    """G5: provenance trace — exact RDF-star quoted-triple match (from_json,
    not substring) finds the containing subgraphs, then walks
    prov:wasDerivedFrom with the frontier broadcast (never the corpus-sized
    derived table). Planted 'term 1' appears in several chunks, so the
    trace returns multiple subgraphs and their source chunks."""
    from trustgraph_spark.operators.admin import trace_provenance
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.operators.provenance import subgraph_provenance_triples
    from trustgraph_spark.planted import planted_def_chunks

    chunks = planted_def_chunks(_docs(spark, sf_dir))
    content = definitions_to_triples(extract_definitions(chunks, RuleExtractor()))
    prov = subgraph_provenance_triples(content, "kg-extract")
    out = trace_provenance(prov, TG + "term-1", RDF_LABEL, "term 1", max_hops=3)
    return out.select(F.col("hop").cast("long").alias("hop"), "node")


def q_media_features(spark, sf_dir):
    """Multimodal plumbing driven through the gate: binary payload ->
    mapInPandas feature extraction (Arrow-batched; deterministic stub
    decode — sha256 of the blob — reproduced byte-for-byte in SQL).
    Features are rescaled to their integer byte values so float32-vs-double
    division noise cannot enter the comparison."""
    from trustgraph_spark.multimodal import extract_media_features, synth_media

    feats = extract_media_features(synth_media(spark, 48))
    return feats.select(
        "media_id", "kind",
        *[
            F.round(F.element_at("feature", i + 1) * 255).cast("long").alias(f"b{i}")
            for i in range(16)
        ],
    )


def q_kg_core_roundtrip(spark, sf_dir):
    """S7/S9: knowledge-core export -> import round trip of one
    collection's slice (self-contained parquet bundle); the round-tripped
    rows must equal the slice, duplicates preserved."""
    import tempfile

    from trustgraph_spark.operators.admin import (
        export_knowledge_core,
        import_knowledge_core,
    )

    t = _two_collection_triples(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="tg_core_")
    export_knowledge_core(t, None, path, "default")
    core = import_knowledge_core(spark, path)
    return core["triples"].select("collection", "s", "p", "o", "otype")


def q_warehouse_roundtrip(spark, sf_dir):
    """S9: warehouse dispatcher round trip — atomic-rename commit of a
    partitioned table and an exact read-back (the parquet stand-in for an
    Iceberg append + snapshot read)."""
    import tempfile

    from trustgraph_spark.pipeline import Warehouse

    wh = Warehouse(spark, tempfile.mkdtemp(prefix="tg_wh_rt_"))
    t = _two_collection_triples(spark, sf_dir)
    wh.write(t, "triples_rt", partition_by=["collection"])
    assert wh.exists("triples_rt")
    return wh.read("triples_rt").select("collection", "s", "p", "o", "otype")


def q_collections_admin(spark, sf_dir):
    """M3: delete_collection + list_collections — per-collection row counts
    after dropping one collection."""
    from trustgraph_spark.operators.admin import (
        delete_collection,
        list_collections,
    )

    t = _two_collection_triples(spark, sf_dir)
    kept = delete_collection(t, "colb")
    counts = kept.groupBy("collection").agg(F.count("*").cast("long").alias("n"))
    return list_collections(kept).join(counts, "collection")


def q_rerank_topk(spark, sf_dir):
    """V4: cross-encoder rerank seam — alphabetical input cap 350, token
    Jaccard scoring (the deterministic scorer stand-in), top-25 per query
    with (score desc, text asc) tie-break."""
    from trustgraph_spark.operators.admin import rerank

    qdf = spark.createDataFrame(
        [("q1", "spark window hash table"), ("q2", "stream filter vector scan")],
        "qid string, query string",
    )
    cand = _docs(spark, sf_dir).select("doc_id", "text").crossJoin(qdf)
    out = rerank(cand, query_col="query", text_col="text")
    return out.select(
        "qid", "doc_id",
        F.round("score", 6).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_emb_near_dup(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs, hyperplane-LSH-bucketed, over
    a corpus with planted perturbed copies (the only pairs >= 0.95)."""
    from trustgraph_spark.operators.dedup import embedding_near_dup_pairs
    from trustgraph_spark.planted import planted_near_dup_embeddings

    emb = planted_near_dup_embeddings(
        _emb(spark, sf_dir)
    )
    out = embedding_near_dup_pairs(emb, threshold=0.95, n_planes=8, dim=64)
    # ids only: one planted pair's cosine sits exactly on a rounding
    # boundary (0.99695) where Spark's fold and DuckDB's dot differ in the
    # last ulp — the pair SET is the semantic output; the threshold filter
    # exercises the cosine on both sides
    return out.select("id_a", "id_b")


def q_doc_rag_rerank(spark, sf_dir):
    """DocumentRAG dense retrieve WITH the cross-encoder rerank seam:
    fetch pool = OVERFETCH_FACTOR x doc_limit (reference fetch-count
    derivation), token-Jaccard scoring (the deterministic scorer), final
    top doc_limit per query by (score desc, chunk_id asc)."""
    from trustgraph_spark.operators.admin import OverlapReranker
    from trustgraph_spark.operators.docrag import document_rag_retrieve

    store, chunks = _rag_chunk_tables(spark, sf_dir)
    queries_df = _rag_concept_queries(spark, sf_dir)
    out = document_rag_retrieve(
        queries_df, store, chunks, doc_limit=5, reranker=OverlapReranker()
    )
    return out.select(
        "query_id",
        "chunk_id",
        F.round("score", 6).alias("score"),
        F.col("final_rank").cast("long").alias("final_rank"),
    )


def q_doc_rag_mmr(spark, sf_dir):
    """DocumentRAG with MMR diversity selection (rerank.py mmr_select):
    min-max normalized scores + greedy token-Jaccard diversity, lambda
    0.5, over the dense candidate pool.  Iterative greedy selection is
    not SQL-expressible - rows-only driver check; exact semantics are
    pytest-verified against an independent Python replay (test_docrag)."""
    from trustgraph_spark.operators.docrag import document_rag_retrieve

    store, chunks = _rag_chunk_tables(spark, sf_dir)
    queries_df = _rag_concept_queries(spark, sf_dir)
    out = document_rag_retrieve(
        queries_df, store, chunks, doc_limit=5, fetch_limit=10,
        diversity="mmr", diversity_lambda=0.5,
    )
    return out.select(
        "query_id", "chunk_id",
        F.col("final_rank").cast("long").alias("final_rank"),
    )


def q_diag_detect_type(spark, sf_dir):
    """Structured-data type diagnosis (retrieval/structured_diag
    type_detector.detect_data_type): planted per-modulus wrappers turn the
    documents corpus into json/xml/csv/empty samples; pure column logic."""
    from trustgraph_spark.operators.diagnose import detect_types

    d = _docs(spark, sf_dir)
    m = F.col("doc_id") % 5
    planted = d.select(
        "doc_id",
        F.when(m == 0, F.concat(F.lit("{"), F.col("text")))
        .when(m == 1, F.concat(F.lit("<?xml version=\"1.0\"?>"), F.col("text")))
        .when(m == 2, F.concat(F.lit("<a>"), F.col("text"), F.lit("</a>")))
        .when(m == 3, F.lit("   "))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return detect_types(planted)


def q_rows_store_query(spark, sf_dir):
    """Structured rows store + query (storage/rows + query/rows): validated
    planted rows -> the unified per-index layout with Cassandra PK upsert
    (last write per (index_value, row_id) by doc_id), then an indexed
    point-partition query with post-filter operators (eq / gte / lt /
    contains) and string-sort by age."""
    from trustgraph_spark.operators.extract_extras import validate_rows
    from trustgraph_spark.operators.rows import rows_query, rows_store
    from trustgraph_spark.planted import planted_row_objects

    fields = [
        {"name": "name", "type": "string", "primary": True},
        {"name": "city", "type": "string", "enum_values": ["a", "b"],
         "indexed": True},
        {"name": "age", "type": "string"},
    ]
    v = validate_rows(planted_row_objects(_docs(spark, sf_dir)), fields)
    store = rows_store(
        v, fields, schema_name="person", upsert_order_col="doc_id"
    )
    out = rows_query(
        store,
        fields,
        "person",
        {"city": "a", "age_gte": 5, "age_lt": 80, "name_contains": "1"},
        limit=1000,
        order_by="age",
    )
    return out.select("name", "city", "age", "source")


def q_sparql_graph_var(spark, sf_dir):
    """GRAPH ?g over named graphs: the graph IRI binds as a variable
    (the reference only parses GRAPH; this evaluates it, variable form
    included)."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.operators.provenance import subgraph_provenance_triples
    from trustgraph_spark.planted import planted_def_chunks
    from trustgraph_spark.sparql import sparql_select

    chunks = planted_def_chunks(_docs(spark, sf_dir))
    content = definitions_to_triples(extract_definitions(chunks, RuleExtractor()))
    edges = content.unionByName(
        subgraph_provenance_triples(content, "kg-extract"),
        allowMissingColumns=True,
    )
    return sparql_select(
        edges,
        "SELECT ?g ?sg ?chunk WHERE { GRAPH ?g "
        "{ ?sg <http://www.w3.org/ns/prov#wasDerivedFrom> ?chunk } }",
    )


def q_sparql_path_nps(spark, sf_dir):
    """Negated property set through the front-end: everything EXCEPT
    rdfs:label out of each minted entity — exactly the skos:definition
    edges (grammar [89], evaluated per SPARQL 1.1 §9.1)."""
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.planted import planted_def_chunks
    from trustgraph_spark.sparql import sparql_select

    chunks = planted_def_chunks(_docs(spark, sf_dir))
    edges = definitions_to_triples(extract_definitions(chunks, RuleExtractor()))
    return sparql_select(
        edges, f"SELECT ?s ?o WHERE {{ ?s !<{RDF_LABEL}> ?o }}"
    )


def q_sparql_subquery(spark, sf_dir):
    """Nested subquery (beyond the reference): aggregate-in-subquery
    joined and filtered in the outer group."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    out = sparql_select(
        edges,
        "SELECT ?x ?n WHERE { { SELECT ?x (COUNT(?y) AS ?n) WHERE "
        f"{{ ?x <{CO_URI}> ?y }} GROUP BY ?x }} FILTER(?n > 3) }}",
    )
    return out.select("x", F.col("n").cast("long").alias("n"))


def q_row_emb_lookup(spark, sf_dir):
    """Row-embeddings semantic index lookup (embeddings/row_embeddings +
    storage/query row_embeddings): one embedding per DISTINCT index text,
    queries are the texts themselves — top-1 through the real embed +
    broadcast-cosine path is the exact match at cosine 1.0."""
    from trustgraph_spark.operators.embeddings import embed_texts
    from trustgraph_spark.operators.extract_extras import validate_rows
    from trustgraph_spark.operators.rows import (
        row_embeddings_query,
        row_embeddings_store,
    )
    from trustgraph_spark.planted import planted_row_objects

    fields = [
        {"name": "name", "type": "string", "primary": True, "indexed": True},
        {"name": "city", "type": "string", "enum_values": ["a", "b"],
         "indexed": True},
        {"name": "age", "type": "string"},
    ]
    v = validate_rows(planted_row_objects(_docs(spark, sf_dir)), fields)
    store = row_embeddings_store(v, fields, "person")
    qtexts = spark.createDataFrame(
        [(f"item {k}",) for k in range(10)], "qtext string"
    )
    queries = embed_texts(qtexts, text_col="qtext", out_col="query_vector").select(
        F.col("qtext").alias("query_id"), "query_vector"
    )
    out = row_embeddings_query(store, queries, limit=1, schema_name="person")
    return out.select(
        "query_id",
        "index_name",
        F.array_join("index_value", "|").alias("index_value"),
        "text",
        F.round("score", 4).alias("score"),
        F.col("rank").cast("long").alias("rank"),
    )


def q_sparql_path_star(spark, sf_dir):
    """SPARQL 1.1 property path through the string front-end: `co+`-style
    transitive closure with zero-length star semantics from a bound seed
    (<tg:batch> co_occurs_with* ?x). BEYOND the reference — its evaluator
    has no path handlers; the closure runs the semi-naive fixpoint loop."""
    from trustgraph_spark.sparql import sparql_select

    edges = _cooccur_edges_table(spark, sf_dir)
    return sparql_select(
        edges, f"SELECT ?x WHERE {{ <{TG}batch> <{CO_URI}>* ?x }}"
    )


def q_graphql_rows(spark, sf_dir):
    """GraphQL query surface (query/graphql): a parsed GraphQL document
    with a variable, nested where-filter objects (eq/gte/lt/endsWith),
    order_by and limit, a fragment spread resolving the selection set,
    compiled to the rows-store query path with typed output columns
    (age: integer -> bigint)."""
    from trustgraph_spark.graphql import graphql_rows_query
    from trustgraph_spark.operators.extract_extras import validate_rows
    from trustgraph_spark.operators.rows import rows_store
    from trustgraph_spark.planted import planted_row_objects

    fields = [
        {"name": "name", "type": "string", "primary": True},
        {"name": "city", "type": "string", "enum_values": ["a", "b"],
         "indexed": True},
        {"name": "age", "type": "integer"},
    ]
    v = validate_rows(planted_row_objects(_docs(spark, sf_dir)), fields)
    store = rows_store(
        v, fields, schema_name="person", upsert_order_col="doc_id"
    )
    out = graphql_rows_query(
        store,
        {"person": fields},
        "query Q($c: String) { person(where: {city: {eq: $c}, "
        'age: {gte: 10, lt: 70}, name: {endsWith: "3"}}, '
        'order_by: "age", limit: 500) { ...cols } } '
        "fragment cols on Person { name city age }",
        variables={"c": "b"},
    )
    return out["person"]


def _rag_chunk_tables(spark, sf_dir):
    """Chunk store (vectors from the embeddings table) + chunk texts (the
    documents table) under a shared chunk_id namespace."""
    emb = _emb(spark, sf_dir)
    store = emb.select(
        F.lit("default").alias("collection"),
        F.concat(F.lit("c"), F.col("vec_id").cast("string")).alias("chunk_id"),
        F.col("embedding").alias("vector"),
    )
    chunks = _docs(spark, sf_dir).select(
        F.concat(F.lit("c"), F.col("doc_id").cast("string")).alias("chunk_id"),
        "text",
    )
    return store, chunks


_RAG_QUERY_TEXTS = [
    ("q0", "spark window hash table"),
    ("q1", "stream filter vector scan"),
    ("q2", "merge join batch query"),
    ("q3", "table scan filter window"),
    ("q4", "vector query stream hash"),
]


def _rag_concept_queries(spark, sf_dir):
    """5 queries x 2 pre-embedded concepts each (vectors = embeddings rows
    0..9; concept extraction is the LLM boundary) plus a query text for
    the sparse path."""
    emb = _emb(spark, sf_dir)
    cv = emb.where(F.col("vec_id") < 10).select(
        F.concat(F.lit("q"), (F.col("vec_id") / 2).cast("int").cast("string")).alias(
            "query_id"
        ),
        (F.col("vec_id") % 2).cast("int").alias("concept_idx"),
        F.col("embedding").alias("query_vector"),
    )
    grouped = cv.groupBy("query_id").agg(
        F.array_sort(
            F.collect_list(F.struct("concept_idx", "query_vector"))
        ).alias("concept_vecs")
    )
    qtext = spark.createDataFrame(_RAG_QUERY_TEXTS, "query_id string, query string")
    return grouped.join(qtext, "query_id")


def q_doc_rag_topk(spark, sf_dir):
    """DocumentRAG dense retrieve loop (retrieval/document_rag): per-concept
    top-k with per_concept_limit = doc_limit // n_concepts (no reranker ->
    fetch_count = doc_limit exactly, document_rag.py:398-399), first-seen
    dedup across concepts, chunk-text join, and the reference's
    UNTRUNCATED candidate list (no final cut without a reranker)."""
    from trustgraph_spark.operators.docrag import document_rag_retrieve

    store, chunks = _rag_chunk_tables(spark, sf_dir)
    queries_df = _rag_concept_queries(spark, sf_dir)
    out = document_rag_retrieve(queries_df, store, chunks, doc_limit=5)
    return out.select(
        "query_id",
        "chunk_id",
        F.round("score", 4).alias("score"),
        F.col("final_rank").cast("long").alias("final_rank"),
    )


def q_doc_rag_bm25(spark, sf_dir):
    """DocumentRAG sparse path: Okapi BM25 (k1=1.2, b=0.75) over the
    keyword_index posting lists — the Spark-native stand-in for the
    reference's external keyword-index service (retrieval mode
    'keyword')."""
    from trustgraph_spark.operators.docrag import (
        document_rag_retrieve,
        keyword_index,
    )

    store, chunks = _rag_chunk_tables(spark, sf_dir)
    postings = keyword_index(chunks)
    queries_df = spark.createDataFrame(
        _RAG_QUERY_TEXTS[:2], "query_id string, query string"
    )
    out = document_rag_retrieve(
        queries_df, store, chunks, doc_limit=10, mode="keyword",
        postings=postings,
    )
    return out.select(
        "query_id",
        "chunk_id",
        F.round("score", 4).alias("score"),
        F.col("final_rank").cast("long").alias("final_rank"),
    )


def q_doc_rag_hybrid(spark, sf_dir):
    """DocumentRAG hybrid retrieval: dense per-concept matches and BM25
    keyword matches fused by weighted Reciprocal Rank Fusion (RRF_K=60,
    weights 1.0/0.5); no reranker -> fetch_count = doc_limit = 5 on both
    arms and the fused top-5 IS the selection (document_rag.py rrf_fuse +
    get_docs hybrid branch, no-reranker fetch derivation)."""
    from trustgraph_spark.operators.docrag import (
        assemble_context,
        document_rag_retrieve,
        keyword_index,
    )

    store, chunks = _rag_chunk_tables(spark, sf_dir)
    postings = keyword_index(chunks)
    queries_df = _rag_concept_queries(spark, sf_dir)
    sel = document_rag_retrieve(
        queries_df, store, chunks, doc_limit=5,
        mode="hybrid", postings=postings, vector_weight=1.0,
        keyword_weight=0.5,
    )
    ctx = assemble_context(sel)
    return ctx.select(
        "query_id",
        F.array_join("chunk_ids", ",").alias("chunk_ids"),
        F.md5("context").alias("context_md5"),
        "n_chunks",
    )


_NLQ_NS = "http://example.org/"


def _nlq_elements(spark):
    """Ontology dimension for the NL-query gated entries — element texts
    tuned (fixture-verified) so the question segments match exactly the
    device class at cosine 1.0 and nothing else crosses the 0.6 query
    threshold."""
    return spark.createDataFrame(
        [
            ("kb", "class", "device", None, None, None, None, None, None),
            ("kb", "class", "sensor", None, None, "device", None, None, None),
            ("kb", "objectProperty", "connects", None, None, None,
             "device", "sensor", "attached"),
            ("kb", "objectProperty", "attached", None, None, None,
             "sensor", "device", "connects"),
            ("kb", "objectProperty", "linkswith", None, None, None,
             "device", "sensor", None),
            ("kb", "datatypeProperty", "sensorcount", None, "meter", None,
             "device", None, None),
        ],
        "ontology_id string, element_type string, element_id string, "
        "label string, comment string, subclass_of string, domain string, "
        "range string, inverse_of string",
    )


def _onto_ex_elements(spark):
    """Ontology dimension for the extraction-conversion gate: a three-level
    class chain (meter < sensor < device) so ancestor-class constraint
    matching is exercised, an object property with domain+range, and two
    datatype properties whose domains force both an ancestor pass and a
    violation skip."""
    return spark.createDataFrame(
        [
            ("kb", "class", "device", None, None, None, None, None, None),
            ("kb", "class", "sensor", None, None, "device", None, None, None),
            ("kb", "class", "meter", None, None, "sensor", None, None, None),
            ("kb", "objectProperty", "connects", None, None, None,
             "device", "sensor", None),
            ("kb", "datatypeProperty", "reading", None, None, None,
             "sensor", None, None),
            ("kb", "datatypeProperty", "serial", None, None, None,
             "device", None, None),
        ],
        "ontology_id string, element_type string, element_id string, "
        "label string, comment string, subclass_of string, domain string, "
        "range string, inverse_of string",
    )


def q_onto_extract_convert(spark, sf_dir):
    """OntoRAG extraction response parsing + triple conversion
    (extract/kg/ontology/simplified_parser.py:49-346,
    triple_converter.py:21-230): per-doc planted LLM responses rotate the
    three reference formats (JSONL-discriminator list with junk items,
    legacy nested dict, snake_case legacy) through the resilient parser
    seam, then convert to triples under broadcast ontology constraints —
    unknown classes/properties skipped, domain/range enforced with
    subClassOf ancestor matching, entity URIs minted as
    {base}/{ontology}/{type}-{name}, numeric/bool attribute values
    stringified. doc % 11 responses are malformed JSON (parser returns
    None -> no rows)."""
    from trustgraph_spark.operators.ontology import (
        convert_extraction_triples,
        extract_ontology_objects,
    )
    from trustgraph_spark.planted import planted_onto_responses

    chunks = _docs(spark, sf_dir).select(
        F.col("doc_id").cast("string").alias("chunk_id"), "text"
    )
    # checkpoint: the converter derives entity/relationship/attribute
    # frames from the parse output — unmaterialized, the parser seam
    # would run once per frame (4 MapInPandas nodes, plan-audited)
    parsed = extract_ontology_objects(
        chunks, planted_onto_responses).localCheckpoint()
    return convert_extraction_triples(parsed, _onto_ex_elements(spark), "kb")


def q_react_tool_trace(spark, sf_dir):
    """ReAct agent deterministic kernel (agent/react/agent_manager.py:18-172
    parse grammar, streaming_parser.py state machine, tool_filter.py
    group/state availability, the reason->act->observe loop :314-395):
    one scripted two-step agent session per doc_id%10==3 document, tool
    observations resolved by BATCHED broadcast joins (mention-degree +
    order-status counts — one plan for the whole session batch where the
    reference calls its backends per request), response-format / parser /
    group-state / error-path rotation on the decade index.  Covers the
    happy path, the __parse_error__ recovery path (malformed Args JSON)
    and the tool-failure 'Error: ...' observation path; the oracle
    reconstructs every trace row analytically."""
    from trustgraph_spark.agent import react_tool_trace

    return react_tool_trace(
        _docs(spark, sf_dir),
        _spread(spark.read.parquet(f"{sf_dir}/orders.parquet")),
    )


def q_react_prov_triples(spark, sf_dir):
    """Agent provenance emission (provenance/agent.py:66-355 +
    react/service.py:535-545 lineage): PROV-O triples for every scripted
    ReAct session derived from the trace frame with pure column
    expressions — Question activity, Analysis+ToolUse iteration with
    thought sub-entity / tool candidates / step number, Observation with
    the tg:Error mixin + toolError literal on failures, Conclusion with
    termination reason; iteration 1 derives from the question, the
    conclusion from the last iteration."""
    from trustgraph_spark.agent import agent_prov_triples, react_tool_trace

    # checkpoint: the provenance emitter derives several triple families
    # from the trace — unmaterialized, the session-replay seam would run
    # once per family (3 MapInPandas nodes, plan-audited)
    trace = react_tool_trace(
        _docs(spark, sf_dir),
        _spread(spark.read.parquet(f"{sf_dir}/orders.parquet")),
    ).localCheckpoint()
    return agent_prov_triples(trace, timestamp="2026-01-01T00:00:00Z")


def q_media_stdlib_features(spark, sf_dir):
    """REAL media decode with no codec libraries: per-doc WAV (stdlib
    ``wave`` PCM read) and BMP (hand-written uncompressed-24bpp parser)
    payloads synthesized with integer-exact sample/pixel math, decoded
    back through the feature seam — per-band RMS energy for audio, luma
    histogram for images. The oracle reproduces every sample and pixel
    analytically and applies the same float32 quantization the feature
    schema stores."""
    from trustgraph_spark.multimodal import (
        extract_media_features,
        stdlib_decode,
        synth_stdlib_media,
    )

    media = synth_stdlib_media(_docs(spark, sf_dir))
    feats = extract_media_features(media, decode_fn=stdlib_decode)
    return feats.select(
        "media_id", "kind",
        F.posexplode("feature").alias("band", "value"),
    ).select(
        "media_id", "kind", "band",
        F.round(F.col("value").cast("double"), 4).alias("value"),
    )


def q_doc_library_triples(spark, sf_dir):
    """Document-library metadata -> schema.org triples (knowledge/
    document.py:12-130 + publication.py + organization.py emitters,
    identifier.py sha256->UUID minting): per-doc planted metadata rotates
    every nullable field through present/absent, publication events link
    organizations, and the whole family emits as one conditional-array
    explode. The reference's builtin-id identifier bug is fixed (subject
    = document URI) and the oracle asserts the fixed behavior."""
    from trustgraph_spark.operators.library import document_metadata_triples
    from trustgraph_spark.planted import planted_doc_metadata

    return document_metadata_triples(planted_doc_metadata(_docs(spark, sf_dir)))


def q_nquads_export(spark, sf_dir):
    """N-Quads serialization of the triple store (trustgraph-cli/
    nquads.py:1-119 hand-rolled grammar encoding): planted triples rotate
    every encoding case — named-graph IRI objects, literals carrying the
    full ECHAR escape set, language tags, xsd datatypes, grammar-invalid
    IRIs (skipped with encodable=false), RDF-star rows (skipped, no
    standard encoding). Pure column expressions; the oracle rebuilds
    every line with the same escape chain."""
    from trustgraph_spark.operators.serialize import triples_to_nquads
    from trustgraph_spark.planted import planted_nquad_triples

    return triples_to_nquads(planted_nquad_triples(_docs(spark, sf_dir)))


def q_nquads_roundtrip(spark, sf_dir):
    """Export -> parse roundtrip: the encodable planted lines re-parsed by
    the regexp N-Quads grammar (sentinel-swap unescape) must reproduce the
    original term columns byte-for-byte; the oracle is the planted
    encodable subset itself — no string surgery on the oracle side."""
    from trustgraph_spark.operators.serialize import (
        parse_nquads,
        triples_to_nquads,
    )
    from trustgraph_spark.planted import planted_nquad_triples

    enc = triples_to_nquads(planted_nquad_triples(_docs(spark, sf_dir)))
    return parse_nquads(enc.where(F.col("encodable")).select("line"))


def q_turtle_export(spark, sf_dir):
    """Turtle export with RDF-star (trustgraph-cli/graph_to_turtle.py):
    deterministic single-line-block dialect — sorted @prefix header,
    per-subject blocks with sorted predicate-object pairs, longest-prefix
    qname compression, << s p o >> quoted-triple objects (which N-Quads
    must skip), malformed IRIs skipped. One subject-keyed aggregation;
    the oracle rebuilds the header and every block in SQL."""
    from trustgraph_spark.operators.serialize import triples_to_turtle
    from trustgraph_spark.planted import planted_nquad_triples

    return triples_to_turtle(
        planted_nquad_triples(_docs(spark, sf_dir)),
        {"ex": "http://ex/",
         "xsd": "http://www.w3.org/2001/XMLSchema#"},
    )


def q_kg_core_msgpack(spark, sf_dir):
    """Portable knowledge-core exchange (get_kg_core.py:17-73 msgpack
    record stream, put_kg_core.py:16-60 reader, TermTranslator compact
    keys primitives.py:50-99): the planted triples — every term shape
    incl. RDF-star quoted objects and grammar-invalid IRIs N-Quads must
    skip but msgpack must not — grouped into per-(id, collection)
    batches, packed to wire records by the pure-Python codec seam, then
    decoded back; per-document root-metadata triples ride in every
    record as the reference's writer does.  Batched applyInPandas
    encode / streaming mapInPandas decode; roundtrip must be the planted
    frame byte-for-byte, so the oracle is the planted set itself."""
    from trustgraph_spark.operators.kgcore import (
        decode_core_triples,
        encode_core_triples,
    )
    from trustgraph_spark.planted import planted_nquad_triples

    planted = planted_nquad_triples(_docs(spark, sf_dir))
    root = planted.select("id", "collection").distinct().select(
        "id", "collection",
        F.concat(F.lit("http://ex/doc/"), F.col("id")).alias("s"),
        F.lit("http://purl.org/dc/terms/title").alias("p"),
        F.concat(F.lit("Core "), F.col("id")).alias("o"),
        F.lit("l").alias("otype"),
        F.lit("").alias("dtype"), F.lit("").alias("lang"),
        F.lit("").alias("g"),
    )
    recs = encode_core_triples(planted, root_metadata=root, batch_size=16)
    return decode_core_triples(recs).select(
        "id", "collection", "g", "s", "p", "o", "otype", "dtype", "lang")


def q_kg_core_ge_msgpack(spark, sf_dir):
    """Graph-embeddings leg of the core exchange (get_kg_core.py:30-48
    ``("ge", ...)`` records, entity term + float64 vector): planted
    dyadic-rational vectors (exact in binary and in the oracle's SQL
    arithmetic) roundtrip bit-exactly through pack -> unpack; the vector
    re-exploded to scalar rows for the value-hash compare."""
    from trustgraph_spark.operators.kgcore import (
        decode_core_entities,
        encode_core_entities,
    )

    did = F.col("doc_id").cast("long")
    ents = _docs(spark, sf_dir).select(
        F.concat(F.lit("doc-"), (did % 7).cast("string")).alias("id"),
        F.lit("default").alias("collection"),
        F.concat(F.lit("http://ex/e"), did.cast("string")).alias("entity"),
        F.array(
            did / F.lit(4.0),
            -did / F.lit(8.0),
            (did % 16) / F.lit(2.0),
        ).alias("vector"),
    )
    back = decode_core_entities(encode_core_entities(ents, batch_size=32))
    return back.select(
        "id", "collection", "entity",
        F.posexplode("vector").alias("pos", "value"),
    ).select("id", "collection", "entity", "pos",
             F.col("value").cast("double").alias("value"))


def q_turtle_roundtrip(spark, sf_dir):
    """Turtle import (load_turtle.py:40-76 / load_knowledge.py:37-76 —
    the reference parses Turtle with rdflib; here a hand-written
    tokenizer + recursive-descent parser covering the practical grammar
    incl. qnames, @lang, ^^datatypes and RDF-star ``<< >>`` objects):
    the planted triples exported by triples_to_turtle and parsed back
    must reproduce every encodable row byte-for-byte — quoted-triple
    JSON included — so the oracle is the planted encodable subset.  The
    single-document assembly is the roundtrip harness; the operator's
    corpus shape is per-document parallel parsing (test_turtle)."""
    from trustgraph_spark.operators.serialize import triples_to_turtle
    from trustgraph_spark.operators.turtle import parse_turtle
    from trustgraph_spark.planted import planted_nquad_triples

    lines = triples_to_turtle(
        planted_nquad_triples(_docs(spark, sf_dir)),
        {"ex": "http://ex/",
         "xsd": "http://www.w3.org/2001/XMLSchema#"},
    )
    one_doc = lines.agg(
        F.array_join(F.sort_array(F.collect_list("line")), "\n")
        .alias("text")).select(F.lit(0).alias("doc_id"), "text")
    return parse_turtle(one_doc).select(
        "s", "p", "o", "otype", "dtype", "lang")


def q_flow_topic_sweep(spark, sf_dir):
    """Flow-service topic closure (flow/service/flow.py:381-517): every
    live flow's owned topics via fully native template interpolation —
    {workspace}/{blueprint}/{id} as chained replace, arbitrary {param}
    substitution as an aggregate fold over map_entries — then the
    closure refcount the stop sweep consults (refs == 1 means deletable
    when its flow stops).  Stopping flows keep nothing alive; literal
    templates (no '{') are not flow-owned and never appear."""
    from trustgraph_spark.operators.flow import (
        resolve_flow_topics, topic_refcounts)

    n = F.col("doc_id")
    flows = _docs(spark, sf_dir).select(
        F.concat(F.lit("ws"), (n % 3).cast("string")).alias("workspace"),
        F.concat(F.lit("f"), n.cast("string")).alias("flow_id"),
        F.concat(F.lit("bp"), (n % 4).cast("string"))
        .alias("blueprint_name"),
        F.when(n % 11 == 0, F.lit("stopping")).otherwise(F.lit("running"))
        .alias("status"),
        F.create_map(
            F.lit("model"), F.concat(F.lit("m"), (n % 2).cast("string")),
            F.lit("tier"), F.concat(F.lit("t"), (n % 3).cast("string")),
        ).alias("parameters"),
    )
    templates = spark.createDataFrame(
        [(f"bp{i}", t) for i in range(4) for t in (
            "persistent://tg/flow/chunk-{id}",
            "request:{workspace}:rag-{model}-{tier}",
            "shared-{blueprint}",
            "request:tg:librarian",
        )],
        "blueprint_name string, template string")
    return (topic_refcounts(resolve_flow_topics(flows, templates))
            .select("topic", F.col("refs").cast("long").alias("refs")))


def q_gopher_metrics(spark, sf_dir):
    """Gopher corpus-quality rules (Rae et al. 2021 A1.1) over the
    documents table — per-doc repetition/structure metrics and the
    combined pass verdict, one narrow UDF-free projection."""
    from trustgraph_spark.operators.quality import gopher_doc_metrics

    df = gopher_doc_metrics(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n_words").cast("long").alias("n_words"),
        "mean_word_len",
        "symbol_word_ratio",
        "bullet_line_fraction",
        "ellipsis_line_fraction",
        "alpha_word_fraction",
        F.col("stopword_hits").cast("long").alias("stopword_hits"),
        "duplicate_line_fraction",
        "duplicate_line_char_fraction",
        "gopher_pass",
    )


def q_ngram_repetition(spark, sf_dir):
    """Gopher top-/duplicated-n-gram character fractions (n = 2..4):
    native n-gram build, ONE explode, map-side-combinable counts."""
    from trustgraph_spark.operators.quality import ngram_repetition

    df = ngram_repetition(_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        F.col("n").cast("long").alias("n"),
        "top_ngram_char_frac",
        "dup_ngram_char_frac",
    )


_CC_PLANT = (
    "4111 1111 1111 1111",   # Luhn-valid (Visa test vector)
    "5500-0000-0000-0004",   # Luhn-valid (MC test vector)
    "4539148803436467",      # Luhn-valid
    "378282246310005",       # Luhn-valid (Amex, 15 digits)
    "1234 5678 9012 3456",   # shaped but checksum-invalid
)


def _pii_plant(docs):
    """documents with deterministic PII planted per doc_id (the base
    word-soup has none); the oracle mirrors the same concat."""
    n = F.col("doc_id")

    def s(c):
        return c.cast("string")

    planted = F.concat(
        F.col("text"),
        F.lit(" mail u"), s(n), F.lit("@ex"), s(n % 7), F.lit(".org"),
        F.when(n % 3 == 0, F.concat(
            F.lit(" ph (555) 86"), s(n % 10), F.lit("-"),
            F.lpad(s(n % 10000), 4, "0"))).otherwise(F.lit("")),
        F.when(n % 4 == 1, F.concat(
            F.lit(" ip 10."), s(n % 256), F.lit("."), s((n * 7) % 256),
            F.lit("."), s(n % 100))).otherwise(F.lit("")),
        F.when(n % 5 == 2, F.concat(
            F.lit(" ssn "), F.lpad(s(n % 1000), 3, "0"), F.lit("-"),
            F.lpad(s(n % 100), 2, "0"), F.lit("-"),
            F.lpad(s(n % 10000), 4, "0"))).otherwise(F.lit("")),
        F.when(n % 2 == 0, F.concat(
            F.lit(" card "),
            F.element_at(F.array(*[F.lit(c) for c in _CC_PLANT]),
                         (n % 5).cast("int") + 1))).otherwise(F.lit("")),
    )
    return docs.select(n.alias("doc_id"), planted.alias("text"))


def _pii_planted_docs(spark, sf_dir):
    return _pii_plant(_docs(spark, sf_dir))


def q_pii_profile(spark, sf_dir):
    """PII scrub-pass profile (LLM-data-pipeline family): regex match
    counts per category + native-fold Luhn validation of card-shaped
    digit runs, over documents with deterministic planted PII."""
    from trustgraph_spark.operators.pii import pii_profile

    df = pii_profile(_pii_planted_docs(spark, sf_dir))
    return df.select(
        "doc_id",
        *[F.col(f"n_{c}").cast("long").alias(f"n_{c}")
          for c in ("email", "phone", "ipv4", "ssn")],
        F.col("n_cc_shaped").cast("long").alias("n_cc_shaped"),
        F.col("n_cc_valid").cast("long").alias("n_cc_valid"),
        "has_pii",
    )


def q_pii_redact(spark, sf_dir):
    """Placeholder redaction as one chained regexp_replace pass; the
    oracle replays the identical pattern chain in RE2."""
    from trustgraph_spark.operators.pii import pii_redact

    df = pii_redact(_pii_planted_docs(spark, sf_dir))
    return df.select(
        "doc_id", "redacted",
        F.col("chars_delta").cast("long").alias("chars_delta"))


def _lined_plant(docs):
    """Multi-line corpus planted from documents (the word-soup base has
    no newlines): a banner every doc shares, a near-unique body line,
    a footer shared within doc_id%7 groups, a blank structural line or
    a unique tail, and an in-doc banner repeat every 5th doc."""
    n = F.col("doc_id")
    base = F.concat_ws(
        "\n",
        F.lit("COOKIE NOTICE please accept"),
        F.substring(F.col("text"), 1, 120),
        F.concat(F.lit("footer "), (n % 7).cast("string")),
        F.when(n % 3 == 0, F.lit("  "))
        .otherwise(F.concat(F.lit("tail "), n.cast("string"))),
    )
    lined = F.concat(
        base,
        F.when(n % 5 == 0, F.lit("\nCOOKIE NOTICE please accept"))
        .otherwise(F.lit("")))
    return docs.select(n.alias("doc_id"), lined.alias("text"))


def _lined_docs(spark, sf_dir):
    return _lined_plant(_docs(spark, sf_dir))


def q_line_dedup_clean(spark, sf_dir):
    """C4-style corpus line dedup (keep-first policy): one explode, a
    map-side-combinable count on the line-key hash, equi-join back,
    per-doc reassembly."""
    from trustgraph_spark.operators.linededup import corpus_line_dedup

    return corpus_line_dedup(_lined_docs(spark, sf_dir))


def q_line_dedup_stats(spark, sf_dir):
    """The duplicated-line table the dedup join builds from: occurrence
    counts and globally-first positions per boilerplate line."""
    from trustgraph_spark.operators.linededup import corpus_line_stats

    df = corpus_line_stats(_lined_docs(spark, sf_dir))
    return df.select(
        "line_key",
        F.col("n_occurrences").cast("long").alias("n_occurrences"),
        F.col("first_doc_id").cast("long").alias("first_doc_id"),
        F.col("first_line_pos").cast("long").alias("first_line_pos"),
    )


_MIX_TARGETS = {"src0": 0.4, "src1": 0.25, "src2": 0.2,
                "src3": 0.1, "src4": 0.05}


def q_source_stats(spark, sf_dir):
    """Per-source corpus composition (doc/token/char totals and
    fractions) — the input to mixture construction."""
    from trustgraph_spark.operators.mixing import source_stats

    df = source_stats(_docs(spark, sf_dir))
    return df.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        "doc_frac", "token_frac")


def q_sample_to_mix(spark, sf_dir):
    """Deterministic training-mix sampling: md5-hash Bernoulli +
    epoch-repeat upsampling toward pinned per-source token shares
    (sources outside the target map drop; src0 upsamples ~8x at the
    uniform 20-source corpus)."""
    from trustgraph_spark.operators.mixing import sample_to_mix

    df = sample_to_mix(_docs(spark, sf_dir), _MIX_TARGETS)
    return df.select(
        "doc_id", "source",
        F.col("epoch").cast("long").alias("epoch"), "rate")


def q_decontam_13gram(spark, sf_dir):
    """GPT-3-style eval-set decontamination: the eval corpus is 20-word
    spans lifted from every 25th document, so exactly the source docs
    collide on 13-grams; the eval gram set broadcasts and the train
    side stays a pure scan."""
    from trustgraph_spark.operators.decontam import ngram_contamination
    from trustgraph_spark.operators.quality import _words

    docs = _docs(spark, sf_dir).select("doc_id", "text")
    evals = (docs.where(F.col("doc_id") % 25 == 0)
             .select((F.col("doc_id") / 25).cast("long").alias("eval_id"),
                     F.array_join(
                         F.slice(_words(F.col("text")), 6, 20), " ")
                     .alias("text")))
    return ngram_contamination(docs, evals)


def q_dedup_resolve(spark, sf_dir):
    """End-to-end duplicate resolution over planted path-shaped pair
    chains ({10k..10k+4} linked only consecutively — transitive closure
    is the thing under test): alternating-star CC + min-id canonical
    election + cluster sizes; singletons self-canonical."""
    from trustgraph_spark.operators.dedup import resolve_duplicates

    docs = _docs(spark, sf_dir).select("doc_id")
    n = F.col("doc_id")
    pairs = (docs.where((n % 10).isin(1, 2, 3, 4))
             .select(n.alias("a"), (n - 1).alias("b")))
    return resolve_duplicates(docs, pairs)


def q_lm_quality(spark, sf_dir):
    """CCNet-style unigram LM quality score fitted on the corpus
    itself; vocab capped at 30 so the word-soup tail exercises the
    OOV floor path."""
    from trustgraph_spark.operators.lmquality import unigram_logprob_score

    return unigram_logprob_score(_docs(spark, sf_dir), vocab_size=30)


def q_pack_blocks(spark, sf_dir):
    """GPT-style concat-split sequence packing: deterministic doc_id
    order, two-phase prefix sum (bucket windows + n_buckets driver
    scalars) instead of a single-partition global window."""
    from trustgraph_spark.operators.packing import pack_blocks

    return pack_blocks(_docs(spark, sf_dir), seq_len=2048)


def q_span_dedup(spark, sf_dir):
    """Exact-substring span dedup (Lee et al. ExactSubstr semantics,
    n=8 anchors): every 4th doc carries a shared 10-token span — the
    globally-first copy survives intact, later copies lose exactly the
    span; unique text is never touched."""
    from trustgraph_spark.operators.spandedup import exact_substring_dedup

    n = F.col("doc_id")
    planted = _docs(spark, sf_dir).select(
        n.alias("doc_id"),
        F.concat(
            F.col("text"),
            F.when(n % 4 == 0,
                   F.lit(" shared span alpha beta gamma delta epsilon"
                         " zeta eta theta")).otherwise(F.lit("")))
        .alias("text"))
    return exact_substring_dedup(planted, n=8)


def q_config_resolve(spark, sf_dir):
    """Config-store read path (config/service/config.py:16-301 over
    tables/config.py's Cassandra ((workspace, class), key) table): the
    append-log layout's last-write-wins resolve — latest seq per
    (workspace, type, key), tombstones dropped — as ONE window argmax.
    Planted log: each doc is a write batch; every 7th is a delete, and
    keys collide across batches so both LWW and revive-after-delete
    paths execute."""
    from trustgraph_spark.operators.config import config_resolve

    n = F.col("doc_id")
    log = _docs(spark, sf_dir).select(
        F.concat(F.lit("ws"), (n % 3).cast("string")).alias("workspace"),
        F.when(n % 2 == 0, F.lit("prompt")).otherwise(F.lit("flow"))
        .alias("type"),
        F.concat(F.lit("k"), (n % 10).cast("string")).alias("key"),
        F.when(n % 7 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("v"), n.cast("string"))).alias("value"),
        n.cast("long").alias("seq"),
        (n % 7 == 0).alias("deleted"),
    )
    return config_resolve(log).select("workspace", "type", "key",
                                      "value", "seq")


def q_iam_authorise(spark, sf_dir):
    """IAM batch authorisation (iam/service/iam.py:1304-1402 _decide
    over the OSS role regime, iam.py:58-121): a planted identity
    matrix — reader / writer / admin / unknown-role / role-less /
    disabled users across workspaces — evaluated against one check per
    document, capability and target workspace derived from doc_id so
    every decision arm executes: capability-not-in-role, assigned-scope
    workspace mismatch, admin '*' scope, system-level no-target checks,
    unknown users, disabled users.  The ~120-row role-capability
    vocabulary is the broadcast dim; the verdict is one native boolean
    max per check — the gateway hot path as a batch join, zero Python."""
    from trustgraph_spark.operators.iam import authorise_batch

    n = F.col("doc_id")
    docs = _docs(spark, sf_dir)
    users = docs.select(
        F.concat(F.lit("u"), n.cast("string")).alias("id"),
        F.concat(F.lit("ws"), (n % 4).cast("string"))
        .alias("default_workspace"),
        F.lit("x").alias("username"), F.lit("x").alias("name"),
        F.lit("").alias("email"), F.lit("").alias("password_hash"),
        F.when(n % 5 == 0, F.array(F.lit("reader")))
        .when(n % 5 == 1, F.array(F.lit("writer")))
        .when(n % 5 == 2, F.array(F.lit("admin")))
        .when(n % 5 == 3, F.array(F.lit("ghost"), F.lit("reader")))
        .otherwise(F.array().cast("array<string>")).alias("roles"),
        (n % 7 != 0).alias("enabled"),
        F.lit(False).alias("must_change_password"),
        F.lit("").alias("created"))
    checks = docs.select(
        n.cast("long").alias("check_id"),
        F.when(n % 11 == 0, F.concat(F.lit("missing"), n.cast("string")))
        .otherwise(F.concat(F.lit("u"), n.cast("string"))).alias("user_id"),
        F.when(n % 4 == 0, F.lit("triples:read"))
        .when(n % 4 == 1, F.lit("rows:write"))
        .when(n % 4 == 2, F.lit("users:admin"))
        .otherwise(F.lit("no-such-cap")).alias("capability"),
        F.when(n % 6 == 0, F.lit(None).cast("string"))
        .otherwise(F.concat(F.lit("ws"), (n % 3).cast("string")))
        .alias("target_workspace"))
    return authorise_batch(spark, checks, users)


def q_iam_resolve_keys(spark, sf_dir):
    """IAM batch api-key resolution (iam.py:1070-1112): a micro-batch
    of inbound credentials — per doc a valid planted key, an unknown
    key, or none — sha2-joined against the planted key/user/workspace
    dims with the reference's failure-arm precedence: expired beats
    missing-owner (doc 0 plants both), then disabled owner, then
    disabled home workspace (ws2), else the resolved identity with
    sorted roles.  The oracle recomputes the same sha256 join in
    DuckDB, so the hash parity is part of the check."""
    from trustgraph_spark.operators.iam import resolve_api_keys_batch

    n = F.col("doc_id")
    docs = _docs(spark, sf_dir)
    users = docs.select(
        F.concat(F.lit("u"), n.cast("string")).alias("id"),
        F.concat(F.lit("ws"), (n % 3).cast("string"))
        .alias("default_workspace"),
        F.lit("x").alias("username"), F.lit("x").alias("name"),
        F.lit("").alias("email"), F.lit("").alias("password_hash"),
        F.when(n % 5 == 0, F.array(F.lit("writer"), F.lit("reader")))
        .when(n % 5 == 1, F.array(F.lit("admin")))
        .when(n % 5 <= 3, F.array(F.lit("reader")))
        .otherwise(F.array().cast("array<string>")).alias("roles"),
        (n % 7 != 0).alias("enabled"),
        F.lit(False).alias("must_change_password"),
        F.lit("").alias("created"))
    keys = docs.where(n % 2 == 0).select(
        F.sha2(F.concat(F.lit("tg_key"), n.cast("string"))
               .cast("binary"), 256).alias("key_hash"),
        F.concat(F.lit("k"), n.cast("string")).alias("id"),
        F.when(n % 13 == 0, F.concat(F.lit("nouser"), n.cast("string")))
        .otherwise(F.concat(F.lit("u"), n.cast("string"))).alias("user_id"),
        F.lit("key").alias("name"), F.lit("tg_key").alias("prefix"),
        F.when(n % 6 == 0, F.lit(1000).cast("long"))
        .when(n % 6 == 4, F.lit(4102444800).cast("long"))
        .otherwise(F.lit(None).cast("long")).alias("expires_epoch"),
        F.lit("").alias("created"), F.lit("").alias("last_used"))
    workspaces = spark.range(3).select(
        F.concat(F.lit("ws"), F.col("id").cast("string")).alias("id"),
        F.col("id").cast("string").alias("name"),
        (F.col("id") != 2).alias("enabled"),
        F.lit("").alias("created"))
    requests = docs.select(
        n.cast("long").alias("req_id"),
        F.when(n % 2 == 0, F.concat(F.lit("tg_key"), n.cast("string")))
        .when(n % 4 == 1, F.concat(F.lit("tg_missing"), n.cast("string")))
        .otherwise(F.lit(None).cast("string")).alias("api_key"))
    return resolve_api_keys_batch(requests, keys, users, workspaces,
                                  1_700_000_000)


def q_bootstrap_state(spark, sf_dir):
    """Fleet bootstrap-reconciliation view (bootstrap/bootstrapper/
    service.py:242-295 run_spec flag comparison + :355-400 cadence
    selection, lifted to fleet scale): each doc is one init-state
    write for one of 40 deployments — rewrites, stale flags, and
    tombstones (every 17th) — resolved last-write-wins per
    (deployment, initialiser) and joined against the broadcast
    3-spec target list.  Even writes are stored in the REAL store
    encoding (store_flag persists json.dumps -> '"v1"'), odd writes
    raw legacy strings, so both decode arms execute.  Verdict 'skip'
    when the decoded stored flag matches the target (tombstoned /
    never-stored mean run, per stored_flag's None semantics), plus
    the cadence the reference's wake loop would pick per deployment
    (INIT_RETRY=15 while pending, else STEADY_INTERVAL=300)."""
    from trustgraph_spark.operators.bootstrap import bootstrap_pending

    n = F.col("doc_id")
    log = _docs(spark, sf_dir).select(
        F.concat(F.lit("d"), (n % 40).cast("string")).alias("deployment"),
        F.when(n % 3 == 0, F.lit("template-seed"))
        .when(n % 3 == 1, F.lit("workspace-init"))
        .otherwise(F.lit("default-flow")).alias("name"),
        F.when(n % 2 == 0, F.lit('"v1"')).otherwise(F.lit("v2"))
        .alias("value"),
        n.cast("long").alias("seq"),
        (n % 17 == 0).alias("deleted"))
    specs = spark.createDataFrame(
        [("template-seed", "v1"), ("workspace-init", "v2"),
         ("default-flow", "v1")], "name string, flag string")
    return bootstrap_pending(log, specs)


def q_prompt_render(spark, sf_dir):
    """Prompt templating at corpus scale (template/prompt_manager.py:
    12-215 + the tg-set-prompt config wire shape from cli/set_prompt.py:
    16-61): a PromptManager loads the planted config dict (system /
    template-index / template.{id} JSON strings), then the selected
    template — vars, dotted struct fields, for-loop, if/else, flag —
    is compiled to ONE native Catalyst column (transform + array_join +
    CASE WHEN, no UDF) and rendered for every document row.  The oracle
    rebuilds every rendered prompt in SQL (list_transform +
    list_aggregate)."""
    import json as _json

    from trustgraph_spark.template import PromptManager, compile_template

    pm = PromptManager()
    pm.load_config({
        "system": _json.dumps("Be helpful."),
        "template-index": _json.dumps(["render_demo"]),
        "template.render_demo": _json.dumps({
            "prompt": (
                "Doc {{ doc_id }}: {{ title }}\n"
                "{% if items %}Items:\n"
                "{% for item in items %}- {{ item.name }} x{{ item.qty }}\n"
                "{% endfor %}"
                "{% else %}No items\n{% endif %}"
                "{% if flag %}FLAGGED{% endif %}"),
            "response-type": "text",
        }),
    })

    n = F.col("doc_id")
    items = F.when(
        n % 4 >= 1,
        F.transform(
            F.sequence(F.lit(1), (n % 4).cast("int")),
            lambda i: F.struct(
                F.concat(F.lit("it"), i.cast("string")).alias("name"),
                (i * 2).alias("qty")),
        ),
    ).otherwise(F.array().cast("array<struct<name:string,qty:int>>"))
    terms = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.lit("T"), n.cast("string")).alias("title"),
        items.alias("items"),
        (n % 5 == 0).alias("flag"),
    )
    return terms.select(
        "doc_id",
        compile_template(pm.prompts["render_demo"].template, terms)
        .alias("rendered"),
    )


def q_structured_ingest(spark, sf_dir):
    """Descriptor-driven structured ingest (load_structured_data.py:
    340-573 _parse_data_by_format -> _apply_transformations ->
    _format_extracted_objects): per-doc planted CSV — quoted field with
    an embedded comma, padded numerics, a to_int failure arm, an empty
    to_float arm, a missing source field — parsed in the ingest seam,
    every transform (trim/upper/to_int/to_float/title_case) compiled to
    native columns, ExtractedObject shaping with sequential parsed-N
    ids.  The planted text is synthesized from doc_id, so the oracle
    reconstructs every output value analytically (no SQL CSV parser)."""
    from trustgraph_spark.operators.ingest import load_structured

    did = F.col("doc_id").cast("long")
    n = did.cast("string")
    text = F.concat(
        F.lit("name,qty,price,note\n"),
        F.lit("  alpha "), n, F.lit(" , "), (did % 100).cast("string"),
        F.lit(" ,"), n, F.lit('.5,mixed CASE text '), n, F.lit("\n"),
        F.lit('"beta, '), n, F.lit('",bad'), n,
        F.lit(",,second row "), n, F.lit("\n"),
    )
    docs = _docs(spark, sf_dir).select(did.alias("doc_id"),
                                       text.alias("text"))
    descriptor = {
        "format": {"type": "csv", "options": {"delimiter": ","}},
        "mappings": [
            {"source_field": "name", "target_field": "name",
             "transforms": [{"type": "trim"}, {"type": "upper"}]},
            {"source_field": "qty", "target_field": "quantity",
             "transforms": [{"type": "to_int"}]},
            {"source_field": "price", "target_field": "price",
             "transforms": [{"type": "to_float"}]},
            {"source_field": "note", "target_field": "label",
             "transforms": [{"type": "title_case"}]},
            {"source_field": "nosuch", "target_field": "ghost"},
        ],
        "output": {"schema_name": "item",
                   "options": {"confidence": 0.75}},
    }
    return load_structured(docs, descriptor, collection="kb")


def q_onto_match_query(spark, sf_dir):
    """Query-variant ontology matcher (query/ontology/ontology_matcher.py):
    the top_k=15 / threshold=0.6 parameterization of the OntoRAG subset
    selector over question segments, plus the question-type enhancements —
    RETRIEVAL adds domain-hit properties, RELATIONSHIP adds connecting
    object properties (domain OR range), AGGREGATION adds count/number
    datatype properties.  Three questions exercise all three branches
    through the real embedding + broadcast-cosine + enhancement-join
    path AS ONE BATCH (the matcher's unit of parallelism — one embed
    pass, one selection window, one enhancement plan); the oracle is the
    analytically-derived selection."""
    from trustgraph_spark.nlquery import match_questions_to_ontology

    elements = _nlq_elements(spark)
    allq = match_questions_to_ontology(
        [
            ("ret", "find all Device"),
            ("rel", "how is Device related to Sensor"),
            ("agg", "count the Device readings"),
        ],
        elements,
    )
    return allq.select(
        "question_id", "ontology_id", "element_type", "element_id", "role",
        F.round("score", 4).alias("score"),
    )


def q_nl2sparql_exec(spark, sf_dir):
    """NL->SPARQL orchestration, executed-SPARQL leg (the triple-store
    twin of graphql.structured_query; query/ontology/query_service.py
    flow): question analysis -> query-variant ontology match -> the
    deterministic retrieval template (sparql_generator.py:131-147) ->
    execution through the Catalyst SPARQL engine over a typed+labelled
    entity graph planted on the documents corpus.  Answer shaping and the
    translator/error paths are pytest-gated (test_nlquery)."""
    from trustgraph_spark.constants import RDF_TYPE
    from trustgraph_spark.nlquery import nl_graph_query

    d = _docs(spark, sf_dir)
    ent = F.concat(F.lit(_NLQ_NS + "dev"), F.col("doc_id").cast("string"))
    cls = F.when(F.col("doc_id") % 3 == 0, F.lit(_NLQ_NS + "sensor")).otherwise(
        F.lit(_NLQ_NS + "device")
    )
    types = d.select(
        F.lit("default").alias("collection"), F.lit("").alias("g"),
        ent.alias("s"), F.lit(RDF_TYPE).alias("p"), cls.alias("o"),
        F.lit("u").alias("otype"), F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )
    labels = d.select(
        F.lit("default").alias("collection"), F.lit("").alias("g"),
        ent.alias("s"), F.lit(RDF_LABEL).alias("p"),
        F.concat(F.lit("device "), F.col("doc_id").cast("string")).alias("o"),
        F.lit("l").alias("otype"), F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )
    edges = types.unionByName(labels)
    out = nl_graph_query(
        edges, _nlq_elements(spark), "find all Device", namespace=_NLQ_NS
    )
    assert out["metadata"].get("error") is None, out["metadata"]
    return out["result"].select("entity", "label")


def q_onto_segments(spark, sf_dir):
    """OntoRAG text segmentation + key-term extraction
    (extract/kg/ontology/text_processor.py): whitespace-normalized
    sentence split (deterministic punctuation splitter — the NLTK punkt
    seam's native default) with position numbering, and per-segment key
    terms (non-stopword words >2 chars + adjacent non-stop bigrams, the
    NLTK stopword list inlined).  Punctuation planted deterministically
    on the documents corpus; terms gated as count + md5 of the ordered
    term list."""
    from trustgraph_spark.operators.ontology import (
        key_terms_col,
        segment_chunks,
    )

    d = _docs(spark, sf_dir)
    planted = d.select(
        "doc_id",
        F.concat(
            F.substring("text", 1, 20), F.lit(". "),
            F.substring("text", 21, 20), F.lit("! "),
            F.substring("text", 41, 20), F.lit("?"),
        ).alias("text"),
    )
    segs = segment_chunks(planted, id_col="doc_id")
    terms = key_terms_col(F.col("segment"))
    return segs.select(
        "doc_id",
        F.col("position").cast("long").alias("position"),
        "segment",
        F.size(terms).cast("long").alias("n_terms"),
        F.md5(F.array_join(terms, " ")).alias("terms_md5"),
    )


def q_doc_rag_mmr_pool(spark, sf_dir):
    """The SQL-expressible prefix of the MMR stage (rerank.py:92-106):
    the dense candidate pool exactly as the doc_rag_mmr entry fetches it
    (document_rag_candidates, fetch_count = max(fetch_limit=10,
    doc_limit=5)) with per-query min-max normalized relevance.  Only the
    greedy selection itself remains on the rows-only exception."""
    from trustgraph_spark.operators.docrag import (
        document_rag_candidates,
        mmr_normalized_pool,
    )

    store, chunks = _rag_chunk_tables(spark, sf_dir)
    queries_df = _rag_concept_queries(spark, sf_dir)
    pool = mmr_normalized_pool(
        document_rag_candidates(queries_df, store, chunks, fetch_count=10)
    )
    return pool.select(
        "query_id", "chunk_id",
        F.round("score", 4).alias("score"),
        F.round("norm_score", 4).alias("norm_score"),
    )


def _semdedup_centroids() -> list[list[float]]:
    """Seeded literal centroids — embedded identically in the DuckDB
    oracle; the k-means refinement path is oracled separately via
    ann_cosine_topk.  Empirically verified against sf0.01: min argmax
    gap 1.6e-4, every within-cluster pair is either a planted copy
    (cos >= 0.9968) or natural (<= 0.904) — no value sits near the
    0.95 eps or a 6dp rounding boundary, so cross-engine float noise
    cannot flip any verdict."""
    import numpy as np

    rng = np.random.RandomState(5)
    return [[float(x) for x in row] for row in rng.randn(8, 64)]


def q_semdedup_keep(spark, sf_dir):
    """SemDedup (Abbas et al. 2023): cluster-then-upper-triangular
    semantic dedup over the corpus with planted near-identical copies;
    keep='far' preserves the paper's low-centroid-similarity choice."""
    from trustgraph_spark.operators.semdedup import semdedup
    from trustgraph_spark.planted import planted_near_dup_embeddings

    emb = planted_near_dup_embeddings(
        _emb(spark, sf_dir))
    return semdedup(emb, _semdedup_centroids(), eps=0.95, keep="far")


def q_dsir_sample(spark, sf_dir):
    """DSIR importance resampling (Xie et al. 2023): hashed unigram+
    bigram models target-vs-raw, Gumbel-top-k selection.  Target = the
    English docs with doc_id % 7 == 0 (a small curated slice); raw =
    the whole corpus."""
    from trustgraph_spark.operators.dsir import dsir_sample

    docs = _docs(spark, sf_dir)
    target = docs.where((F.col("lang") == "en") & (F.col("doc_id") % 7 == 0))
    return dsir_sample(docs, target, k=40, n_buckets=256)


_EXPLAIN_TG = "https://trustgraph.ai/ns/"


def _explain_gr_sessions(spark, sf_dir):
    """Planted GraphRAG query sessions (doc_id % 5 == 1, 100 at sf0.01):
    every optional emit arm (edge concept/score/reasoning, document,
    tokens, model) toggles on a distinct doc_id residue so the oracle
    replays each conditional row exactly."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    return _docs(spark, sf_dir).where(d % 5 == 1).select(
        F.concat(F.lit("s"), s(d)).alias("session_id"),
        F.concat(F.lit("who is entity "), s(d % 40), F.lit("?"))
        .alias("query"),
        F.concat(F.lit("2026-01-01T00:00:"),
                 F.lpad(s(d % 60), 2, "0"), F.lit("Z")).alias("ts"),
        F.array(F.concat(F.lit("alpha"), s(d % 7))).alias("concepts"),
        F.array(F.concat(F.lit("http://trustgraph.ai/e/e"), s(d % 11)))
        .alias("entities"),
        (d % 13).cast("int").alias("edge_count"),
        F.array(F.struct(
            F.concat(F.lit("http://trustgraph.ai/e/e"), s(d % 11))
            .alias("s"),
            F.lit(_EXPLAIN_TG + "rel").alias("p"),
            F.concat(F.lit("http://trustgraph.ai/e/e"), s(d % 9))
            .alias("o"),
            F.when(d % 2 == 0, F.concat(F.lit("alpha"), s(d % 7)))
            .otherwise("").alias("concept"),
            F.when(d % 3 != 0, F.concat(F.lit("0."), s(d % 89 + 10)))
            .otherwise("").alias("score"),
            F.when(d % 4 == 0, F.concat(F.lit("because "), s(d)))
            .otherwise("").alias("reasoning"),
        )).alias("selected_edges"),
        F.when(d % 2 == 0, F.concat(F.lit("urn:doc:"), s(d)))
        .alias("document_id"),
        F.when(d % 3 == 0, d).alias("in_token"),
        F.when(d % 3 == 0, d + 1).alias("out_token"),
        F.when(d % 6 == 0, F.lit("test-model")).alias("model"),
    )


def _explain_dr_sessions(spark, sf_dir):
    """Planted DocumentRAG sessions (doc_id % 5 == 3): d % 7 == 0 has no
    reranked entries (no Focus entity), d % 3 == 0 has an empty
    chunk_id (selection row skipped, envelope kept)."""
    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    empty = F.array().cast(
        "array<struct<chunk_id:string,score:string>>")
    return _docs(spark, sf_dir).where(d % 5 == 3).select(
        F.concat(F.lit("d"), s(d)).alias("session_id"),
        F.concat(F.lit("what about doc "), s(d), F.lit("?")).alias("query"),
        F.concat(F.lit("2026-01-02T00:00:"),
                 F.lpad(s(d % 60), 2, "0"), F.lit("Z")).alias("ts"),
        F.array(F.concat(F.lit("beta"), s(d % 4))).alias("concepts"),
        (d % 6).cast("int").alias("chunk_count"),
        F.array(F.concat(F.lit("urn:chunk:"), s(d % 17)))
        .alias("chunk_ids"),
        F.when(d % 7 == 0, empty).otherwise(F.array(F.struct(
            F.when(d % 3 == 0, F.lit("")).otherwise(
                F.concat(F.lit("urn:chunk:"), s(d % 17))).alias("chunk_id"),
            F.when(d % 2 == 0, F.concat(F.lit("0."), s(d % 89 + 10)))
            .otherwise("").alias("score"),
        ))).alias("reranked"),
        F.when(d % 3 == 0, F.concat(F.lit("urn:doc:"), s(d)))
        .alias("document_id"),
        F.when(d % 4 == 0, d).alias("in_token"),
        F.when(d % 4 == 0, d * 2).alias("out_token"),
        F.lit(None).cast("string").alias("model"),
    )


def _explain_store(spark, sf_dir):
    from trustgraph_spark.operators.explain import (
        docrag_session_triples,
        graphrag_session_triples,
    )

    return graphrag_session_triples(
        _explain_gr_sessions(spark, sf_dir)
    ).unionByName(docrag_session_triples(_explain_dr_sessions(spark, sf_dir)))


def q_explain_rag_emit(spark, sf_dir):
    """Query-time explainability emission (provenance/triples.py:372-833):
    the full GraphRAG Question->Grounding->Exploration->Focus(+edge
    selections)->Synthesis chain and the DocumentRAG twin (synthesis
    derived from exploration, chunk-selection Focus only when reranked)
    over planted sessions — inline array + explode per session, the
    RDF-star edge JSON via the sanctioned byte-exact seam, every
    optional arm (concept/score/reasoning/document/tokens/model)
    exercised on a doc_id residue."""
    return _explain_store(spark, sf_dir).select("s", "p", "o", "otype")


def q_explain_entities(spark, sf_dir):
    """Explainability entity reconstruction (api/explainability.py:85-416):
    emit both RAG chains, then parse EVERY entity back in one
    map-side-combinable groupBy — the reference's from_triples type
    dispatch (exact priority order) + per-type field parsers, fields
    masked to the owning type. Oracle = ground truth computed directly
    from the planted session definitions, so emit->parse must round-trip
    exactly."""
    from trustgraph_spark.operators.explain import explain_entities

    e = explain_entities(_explain_store(spark, sf_dir))
    return e.select(
        "uri", "entity_type", "question_type", "query", "timestamp",
        F.size("concepts").alias("n_concepts"),
        F.md5(F.concat_ws("|", "concepts")).alias("concepts_key"),
        "edge_count", "chunk_count",
        F.size("entities").alias("n_entities"),
        F.md5(F.concat_ws("|", "selected_edge_uris")).alias("edges_key"),
        "document",
    )


def q_explain_trace(spark, sf_dir):
    """Whole-store trace reconstruction (fetch_graphrag_trace
    :735-864 / fetch_docrag_trace :866-972): every session's
    Question->Grounding->Exploration[->Focus]->Synthesis chain assembled
    with fixed-depth joins on the prov:wasDerivedFrom edge frame — the
    set-oriented replacement for the reference's per-request chained
    fetches. GraphRAG synthesis hangs off Focus, DocumentRAG off
    Exploration; sessions without a Focus surface null tails."""
    from trustgraph_spark.operators.explain import rag_traces

    # rag_traces derives two frames (entities + derivation edges) from
    # the store; a parquet-backed store re-scans cheaply, but this one
    # is a computed emit pipeline with a Python seam — materialize once.
    t = rag_traces(_explain_store(spark, sf_dir).localCheckpoint())
    return t.select(
        "question_uri", "question_type", "query", "timestamp",
        "grounding_uri",
        F.md5(F.concat_ws("|", "grounding_concepts")).alias("concepts_key"),
        "exploration_uri",
        F.col("exploration_edge_count").alias("edge_count"),
        F.col("exploration_chunk_count").alias("chunk_count"),
        F.size("exploration_entities").alias("n_entities"),
        "focus_uri",
        F.size("focus_selected_edge_uris").alias("n_selected"),
        "synthesis_uri", "synthesis_document",
    )


def q_doc_prov_triples(spark, sf_dir):
    """Extraction-time document + derived-entity provenance
    (provenance/triples.py:97-280): source documents as typed
    prov:Entity rows with presence-gated Dublin Core metadata, one
    derived chunk per document with the wasDerivedFrom / generation
    activity / agent scaffolding and the image>section>page>chunk
    specific-type priority (deterministic sha256 activity URIs, see
    derived_entity_prov_triples docstring)."""
    from trustgraph_spark.operators.explain import (
        derived_entity_prov_triples,
        document_prov_triples,
    )

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = _docs(spark, sf_dir)
    docs = base.select(
        F.concat(F.lit("urn:doc:"), s(d)).alias("doc_uri"),
        F.when(d % 2 == 0, F.concat(F.lit("Doc "), s(d)))
        .otherwise("").alias("title"),
        F.when(d % 3 == 0, F.concat(F.lit("http://src/"), s(d)))
        .otherwise("").alias("source"),
        F.when(d % 4 == 0,
               F.concat(F.lit("2026-0"), s(d % 9 + 1), F.lit("-01")))
        .otherwise("").alias("date"),
        F.when(d % 5 == 0, F.concat(F.lit("author "), s(d % 13)))
        .otherwise("").alias("creator"),
        F.when(d % 6 == 0, (d % 9).cast("int")).alias("page_count"),
        F.when(d % 2 == 1, F.lit("text/plain"))
        .otherwise("").alias("mime_type"),
    )
    ents = base.select(
        F.concat(F.lit("urn:chunk:c"), s(d)).alias("entity_uri"),
        F.concat(F.lit("urn:doc:"), s(d)).alias("parent_uri"),
        F.when(d % 3 == 0, F.concat(F.lit("chunk of "), s(d)))
        .alias("label"),
        F.lit(None).cast("int").alias("page_number"),
        (d % 5).cast("int").alias("chunk_index"),
        (d % 7).cast("int").alias("char_offset"),
        F.col("n_chars").cast("int").alias("char_length"),
        F.lit(False).alias("section"),
        (d % 11 == 0).alias("image"),
        F.lit(None).cast("string").alias("mime_type"),
    )
    out = document_prov_triples(docs).unionByName(
        derived_entity_prov_triples(
            ents, "chunker", "0.1.0", "2026-01-01T00:00:00Z"))
    return out.select("s", "p", "o", "otype")


def _edge_prov_source(spark, sf_dir):
    """Planted urn:graph:source store: one extraction subgraph per
    GraphRAG session containing its selected edge (RDF-star JSON via
    the sanctioned seam), a subgraph -> chunk -> page -> doc
    wasDerivedFrom chain, and rdfs:labels on the docs only (the other
    chain nodes exercise the URI fallback). Page/doc collapse on
    doc_id % 10, so label/derivation rows repeat — the operator's
    min-aggregations must dedupe them."""
    from trustgraph_spark.operators.provenance import quoted_triple_json

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = _docs(spark, sf_dir).where(d % 5 == 1).select(
        F.concat(F.lit("https://trustgraph.ai/subgraph/x"), s(d))
        .alias("sg"),
        F.concat(F.lit("urn:chunk:c"), s(d)).alias("chunk"),
        F.concat(F.lit("urn:page:p"), s(d % 10)).alias("page"),
        F.concat(F.lit("urn:doc:"), s(d % 10)).alias("doc"),
        F.concat(F.lit("http://trustgraph.ai/e/e"), s(d % 11)).alias("es"),
        F.concat(F.lit("http://trustgraph.ai/e/e"), s(d % 9)).alias("eo"),
        F.concat(F.lit("Doc "), s(d % 10)).alias("doclabel"),
    )
    wdf = "http://www.w3.org/ns/prov#wasDerivedFrom"
    rdfs_label = "http://www.w3.org/2000/01/rdf-schema#label"

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

    contains = emit(base.select(F.array(t(
        F.col("sg"), _EXPLAIN_TG + "contains",
        quoted_triple_json(F.col("es"), F.lit(_EXPLAIN_TG + "rel"),
                           F.col("eo"), F.lit("u")), "t")).alias("tr")))
    rest = emit(base.select(F.array(
        t(F.col("sg"), wdf, F.col("chunk")),
        t(F.col("chunk"), wdf, F.col("page")),
        t(F.col("page"), wdf, F.col("doc")),
        t(F.col("doc"), rdfs_label, F.col("doclabel"), "l"),
    ).alias("tr")))
    return contains.unionByName(rest)


def q_edge_prov_trace(spark, sf_dir):
    """Edge -> source provenance (cli/show_explain_trace.py:53-164):
    every GraphRAG edge selection traced through the urn:graph:source
    RDF-star containment to its extraction subgraph, then down the
    wasDerivedFrom chain to the root document with label resolution
    (URI fallback for unlabeled nodes) — ONE value-equality join of
    parsed quoted-triple terms plus a bounded frontier walk, where the
    reference runs ~2 store queries per hop per edge. Sessions whose
    edges collide mod (11, 9) match each other's subgraphs, so the
    containment join fans out exactly as the reference's store query
    would."""
    from trustgraph_spark.operators.explain import (
        edge_selections,
        edge_source_provenance,
        graphrag_session_triples,
    )

    store = graphrag_session_triples(_explain_gr_sessions(spark, sf_dir))
    out = edge_source_provenance(
        edge_selections(store), _edge_prov_source(spark, sf_dir))
    return out.select(
        "selection_uri", "stmt_uri", "source_chain", "content_chunk",
        F.size("chain").alias("chain_len"),
    )


def q_corpus_shards(spark, sf_dir):
    """Seeded deterministic corpus shuffle + sharding
    (operators/mixing.shuffle_shards — the training-export stage after
    selection/mixing/packing; brief-mandated family extension, no
    reference analog): order_key = md5(seed:doc_id), shard_id =
    first-8-hex % 16, then the per-shard manifest (doc/char totals +
    arg-min first doc).  Zero shuffles for the assignment; one
    map-side-combinable aggregate for the manifest; the oracle replays
    the exact md5 assignment."""
    from trustgraph_spark.operators.mixing import shard_stats, shuffle_shards

    sh = shuffle_shards(_docs(spark, sf_dir), n_shards=16, seed="r5")
    return shard_stats(sh).orderBy("shard_id")


def q_extraction_hierarchy(spark, sf_dir):
    """Document -> Pages -> Chunks -> Edges extraction-hierarchy reader
    (cli/show_extraction_provenance.py:175-230 build_hierarchy): one BFS
    over the planted urn:graph:source store — a typed
    doc/page/chunk/subgraph wasDerivedFrom chain where page rows repeat
    per document (the reader's min-aggs dedupe), chunk labels exist only
    on d%4==0 (URI-fallback arm), subgraph children inline their
    RDF-star tg:contains edges (LITERAL objects, exercising the
    extract_value literal arm) instead of becoming nodes, an untyped
    urn:misc leaf classifies 'unknown', and retrieval-graph noise labels
    must be dropped by the named-graph filter."""
    from trustgraph_spark.operators.explain import extraction_hierarchy
    from trustgraph_spark.operators.provenance import quoted_triple_json

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    rdfs_label = "http://www.w3.org/2000/01/rdf-schema#label"
    wdf = "http://www.w3.org/ns/prov#wasDerivedFrom"
    page = F.concat(F.lit("urn:page:"), s(d % 10))
    chunk = F.concat(F.lit("urn:chunk:"), s(d))

    def t(sc, p, oc, otype="u"):
        return F.struct(sc.alias("s"), F.lit(p).alias("p"),
                        oc.alias("o"), F.lit(otype).alias("otype"))

    def emit(rows, g="urn:graph:source"):
        return rows.select(F.explode("tr").alias("tr")).select(
            F.lit("default").alias("collection"),
            F.lit(g).alias("g"),
            F.col("tr.s").alias("s"), F.col("tr.p").alias("p"),
            F.col("tr.o").alias("o"), F.col("tr.otype").alias("otype"),
            F.lit("").alias("dtype"), F.lit("").alias("lang"))

    base = _docs(spark, sf_dir)
    root = emit(spark.range(1).select(F.array(
        t(F.lit("urn:doc:root"), rdf_type,
          F.lit(_EXPLAIN_TG + "Document")),
        t(F.lit("urn:doc:root"), "http://purl.org/dc/terms/title",
          F.lit("Root Document"), "l"),
        t(F.lit("urn:doc:root"), _EXPLAIN_TG + "mimeType",
          F.lit("text/plain"), "l"),
    ).alias("tr")))
    per_doc = emit(base.select(F.concat(
        F.array(
            t(page, wdf, F.lit("urn:doc:root")),
            t(page, rdf_type, F.lit(_EXPLAIN_TG + "Page")),
            t(page, rdfs_label, F.concat(F.lit("Page "), s(d % 10)), "l"),
            t(chunk, wdf, page),
            t(chunk, rdf_type, F.lit(_EXPLAIN_TG + "Chunk")),
        ),
        F.when(d % 4 == 0, F.array(
            t(chunk, rdfs_label, F.concat(F.lit("Chunk "), s(d)), "l"),
        )).otherwise(F.array().cast(
            "array<struct<s:string,p:string,o:string,otype:string>>")),
        F.when(d % 3 == 0, F.array(
            t(F.concat(F.lit("urn:sg:"), s(d)), wdf, chunk),
            t(F.concat(F.lit("urn:sg:"), s(d)), rdf_type,
              F.lit(_EXPLAIN_TG + "Subgraph")),
            t(F.concat(F.lit("urn:sg:"), s(d)), _EXPLAIN_TG + "contains",
              quoted_triple_json(
                  F.concat(F.lit("http://trustgraph.ai/e/e"), s(d % 7)),
                  F.lit(_EXPLAIN_TG + "rel"),
                  F.concat(F.lit("val "), s(d % 5)),
                  F.lit("l")), "t"),
        )).otherwise(F.array().cast(
            "array<struct<s:string,p:string,o:string,otype:string>>")),
        F.when(d % 7 == 3, F.array(
            t(F.concat(F.lit("urn:misc:"), s(d)), wdf, chunk),
        )).otherwise(F.array().cast(
            "array<struct<s:string,p:string,o:string,otype:string>>")),
    ).alias("tr")))
    noise = emit(base.select(F.array(
        t(page, rdfs_label, F.lit("WRONG"), "l"),
    ).alias("tr")), g="urn:graph:retrieval")

    # the reader scans the store 4x (derived/types/meta/contains
    # projections); materialize the planted store once per run instead
    # of re-running the emit explode chain per scan (the real operator
    # input is a parquet store where each scan is a pushdown read)
    store = root.unionByName(per_doc).unionByName(noise).localCheckpoint()
    return extraction_hierarchy(store, "urn:doc:root")


def q_wire_triples_exec(spark, sf_dir):
    """Batched wire-format triples-query execution
    (messaging/translators/triples.py:13-28 decode +
    query/triples/cassandra/service.py:203-314 dispatch): request JSON
    batches built over doc_id cycle all 8 bound-term masks, the three
    graph arms (absent = all graphs, "" = default only, named), and
    small per-request limits; the store mixes IRI / literal(+lang)
    objects and named-graph rows. The whole batch executes as
    mask-grouped broadcast joins with windowed per-request limits —
    never a per-request loop. Oracle replays decode+dispatch
    analytically (the wire grammar itself is pytest-pinned)."""
    from trustgraph_spark.operators.wire import (
        decode_triples_requests,
        execute_triples_requests,
    )

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = _docs(spark, sf_dir)
    store_a = base.select(
        F.lit("default").alias("collection"),
        F.when(d % 5 == 0, "urn:g:1").otherwise("").alias("g"),
        F.concat(F.lit("http://t/e/"), s(d % 11)).alias("s"),
        F.concat(F.lit("http://t/p/"), s(d % 3)).alias("p"),
        F.concat(F.lit("http://t/e/"), s(d % 7)).alias("o"),
        F.lit("u").alias("otype"),
        F.lit("").alias("dtype"), F.lit("").alias("lang"))
    store_b = base.where(d % 4 == 0).select(
        F.lit("default").alias("collection"), F.lit("").alias("g"),
        F.concat(F.lit("http://t/e/"), s(d % 11)).alias("s"),
        F.concat(F.lit("http://t/p/"), s(d % 3)).alias("p"),
        F.concat(F.lit("lit "), s(d % 13)).alias("o"),
        F.lit("l").alias("otype"), F.lit("").alias("dtype"),
        F.when((d % 13) % 2 == 0, "en").otherwise("").alias("lang"))
    store = store_a.unionByName(store_b)

    mask = F.floor((d % 160) / 20).cast("int")
    garm = F.floor((d % 60) / 20).cast("int")
    part = lambda cond, txt: F.when(cond, txt).otherwise("")  # noqa: E731
    req_json = F.concat(
        F.lit("{"),
        part(mask >= 4, F.concat(
            F.lit('"s":{"t":"i","i":"http://t/e/'), s(d % 11),
            F.lit('"},'))),
        part((mask % 4) >= 2, F.concat(
            F.lit('"p":{"t":"i","i":"http://t/p/'), s(d % 3),
            F.lit('"},'))),
        part(mask % 2 == 1, F.concat(
            F.lit('"o":{"t":"i","i":"http://t/e/'), s(d % 7),
            F.lit('"},'))),
        part(garm == 0, F.lit('"g":"",')),
        part(garm == 1, F.lit('"g":"urn:g:1",')),
        F.lit('"limit":'), s(1 + (d % 3) * 3), F.lit("}"))
    reqs = base.where(d % 20 == 0).select(
        F.concat(F.lit("r"), s(d)).alias("req_id"),
        req_json.alias("request"))
    return execute_triples_requests(decode_triples_requests(reqs), store)


def q_wire_embed_exec(spark, sf_dir):
    """Batched wire-format graph-embeddings query
    (translators/embeddings_query.py:57-70 grammar; the vector-search
    service's cosine top-k): requests are real embedding vectors
    round-tripped through the wire JSON (shortest-roundtrip float32
    reprs parse back exactly), limits vary per request with the
    default-10 arm exercised via an omitted key. One broadcast of the
    request batch against one corpus scan, per-request window limits.
    Oracle replays the vectors analytically (the JSON grammar is
    pytest-pinned)."""
    from trustgraph_spark.operators.wire import (
        decode_embeddings_requests,
        execute_embeddings_requests,
    )

    emb = _emb(spark, sf_dir)
    v = F.col("vec_id")
    reqs = emb.where(v < 8).select(
        F.concat(F.lit("e"), v.cast("string")).alias("req_id"),
        F.to_json(F.struct(
            F.col("embedding").cast("array<double>").alias("vector"),
            F.when(v % 5 != 0, (1 + v % 4) * 2).alias("limit"),
        )).alias("request"))
    store = emb.select(
        F.concat(F.lit("http://t/e/"), v.cast("string")).alias("entity"),
        F.col("embedding").alias("vector"))
    return execute_embeddings_requests(
        decode_embeddings_requests(reqs), store)


def q_librarian_uploads(spark, sf_dir):
    """Librarian chunked-upload lifecycle (librarian.py:273-553):
    planted upload sessions with ceil-div chunk plans and a skip rule
    that leaves some sessions incomplete; `assemble_uploads` reports
    per-session completeness + the sorted missing list and folds the
    received chunks into the S3-multipart-ordered content for complete
    sessions, decoding the stored DocumentMetadata JSON (absent
    title/comments/tags take the service defaults). One grouped
    aggregate over the chunk table — never per-session round-trips."""
    from trustgraph_spark.operators.librarian import assemble_uploads

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = _docs(spark, sf_dir).where(d % 5 == 0)
    sess = base.select(
        F.concat(F.lit("u"), s(d)).alias("upload_id"),
        F.concat(F.lit("w"), s(d % 3)).alias("workspace"),
        F.concat(F.lit("doc"), s(d)).alias("document_id"),
        F.concat(
            F.lit('{"id":"doc'), s(d), F.lit('","time":'), s(d),
            F.lit(',"kind":"text/plain","title":"T'), s(d % 7),
            F.lit('"}')).alias("document_metadata"),
        (7 + d % 9).cast("long").alias("total_size"),
        (3 + d % 4).cast("long").alias("chunk_size"),
        F.ceil((7 + d % 9) / (3 + d % 4)).cast("int")
        .alias("total_chunks"),
        d.alias("_d"))
    chunks = sess.select(
        "upload_id", "_d",
        F.explode(F.sequence(F.lit(0), F.col("total_chunks") - 1))
        .alias("chunk_index"),
    ).where((F.col("_d") + F.col("chunk_index")) % 11 != 0).select(
        "upload_id", "chunk_index",
        F.concat(F.lit("c"), s(F.col("_d")), F.lit(":"),
                 s(F.col("chunk_index")), F.lit(";"))
        .cast("binary").alias("content"))
    out = assemble_uploads(sess.drop("_d"), chunks)
    return out.select(
        "upload_id", "workspace", "document_id", "complete",
        F.array_join(F.col("missing").cast("array<string>"), ",")
        .alias("missing_csv"),
        F.col("content").cast("string").alias("content_str"),
        "time", "kind", "title", "comments",
        F.array_join("tags", ",").alias("tags_csv"))


def q_tgx_roundtrip(spark, sf_dir):
    """Workspace .tgx bundle exchange (cli/export_workspace.py:47-206 /
    import_workspace.py:37-106): planted config entries, two
    collections of quads (RDF-star rows exercise the N-Quads
    written/skipped contract — they must drop), and a parent/child
    document library roundtrip through a real gzipped-tar bundle on
    disk; the read-back flattens to one comparable frame. The oracle
    replays the planted state with the skip rule applied — export,
    member naming, N-Quads encode/parse, and metadata JSON must all
    invert exactly for the hash to match."""
    import tempfile

    from trustgraph_spark.workspace import (
        export_workspace_bundle,
        read_workspace_bundle,
    )

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    base = _docs(spark, sf_dir)
    config = base.where(d % 10 == 0).select(
        F.concat(F.lit("ty"), s(d % 3)).alias("type"),
        F.concat(F.lit("key"), s(d)).alias("key"),
        F.concat(F.lit('"val '), s(d % 7), F.lit('"')).alias("value"))
    triples = base.select(
        F.concat(F.lit("c"), s(d % 2)).alias("collection"),
        F.lit("").alias("g"),
        F.concat(F.lit("http://s/"), s(d % 11)).alias("s"),
        F.concat(F.lit("http://p/"), s(d % 3)).alias("p"),
        F.when(d % 9 == 0, F.lit('{"s": {}}'))
        .when(d % 4 == 0, F.concat(F.lit("lit "), s(d % 13)))
        .otherwise(F.concat(F.lit("http://o/"), s(d % 7))).alias("o"),
        F.when(d % 9 == 0, "t").when(d % 4 == 0, "l")
        .otherwise("u").alias("otype"),
        F.lit("").alias("dtype"),
        F.when((d % 9 != 0) & (d % 4 == 0) & (d % 13 % 2 == 0), "en")
        .otherwise("").alias("lang"))
    lib = base.where(d % 25 == 0).select(
        F.concat(F.lit("doc"), s(d)).alias("id"),
        F.lit("2026-01-01T00:00:00").alias("time"),
        F.lit("text/plain").alias("kind"),
        F.concat(F.lit("T"), s(d % 5)).alias("title"),
        F.lit("").alias("comments"),
        F.array(F.struct(
            F.lit("http://a").alias("s"), F.lit("http://b").alias("p"),
            F.concat(F.lit("m"), s(d % 4)).alias("o"))).alias("metadata"),
        F.array(F.concat(F.lit("t"), s(d % 3))).alias("tags"),
        F.when(d % 50 != 0, F.concat(F.lit("doc"), s(d - 25)))
        .alias("parent_id"),
        F.lit("").alias("document_type"),
        F.concat(F.lit("body "), s(d)).cast("binary").alias("content"))

    path = tempfile.mktemp(prefix="tgx_rt_", suffix=".tgx")
    export_workspace_bundle(
        path, "default", config, triples, lib,
        config_version=3, exported_at="2026-08-18T00:00:00Z")
    _, cdf, tdf, ldf = read_workspace_bundle(spark, path)

    c_rows = cdf.select(
        F.lit("config").alias("part"), F.col("type").alias("a"),
        F.col("key").alias("b"), F.col("value").alias("c"),
        F.lit("").alias("d"), F.lit("").alias("e"))
    t_rows = tdf.select(
        F.lit("triple").alias("part"), F.col("collection").alias("a"),
        F.col("s").alias("b"), F.col("p").alias("c"),
        F.col("o").alias("d"),
        F.concat_ws("|", "otype", "dtype", "lang").alias("e"))
    l_rows = ldf.select(
        F.lit("doc").alias("part"), F.col("id").alias("a"),
        F.coalesce("parent_id", F.lit("")).alias("b"),
        F.col("title").alias("c"),
        F.col("content").cast("string").alias("d"),
        F.concat_ws(",",
                    F.transform("metadata", lambda m: m.getField("o")),
                    "tags").alias("e"))
    return c_rows.unionByName(t_rows).unionByName(l_rows)


def q_dedup_incremental(spark, sf_dir):
    """Incremental dedup: a new batch probes the PERSISTED archive band
    index plus itself (dedup.incremental_lsh_candidates) — archive text
    is never re-read and archive signatures never recomputed, the
    daily-increment shape a 100 TB corpus needs. Planted: archive =
    doc_id%3!=0; batch = doc_id%3==0 with every %6==0 doc carrying its
    archive neighbor's exact text, guaranteeing archive collisions on
    every band."""
    from trustgraph_spark.operators.dedup import (
        incremental_lsh_candidates,
        minhash_band_index,
    )

    d = F.col("doc_id")
    base = _docs(spark, sf_dir).select("doc_id", "text")
    arch = base.where(d % 3 != 0)
    donor = base.select((d - 1).alias("doc_id"),
                        F.col("text").alias("dtext"))
    batch = base.where(d % 3 == 0).join(donor, "doc_id", "left").select(
        "doc_id",
        F.when((d % 6 == 0) & F.col("dtext").isNotNull(), F.col("dtext"))
        .otherwise(F.col("text")).alias("text"))
    out = incremental_lsh_candidates(
        minhash_band_index(arch, n=3, num_hashes=16, bands=4), batch,
        n=3, num_hashes=16, bands=4)
    return out.select("new_id", "match_id", "source")


def q_kg_core_de_msgpack(spark, sf_dir):
    """Document-embeddings leg of the core exchange
    (save_doc_embeds.py:44-60 / put_de_core.py:18-58 ``("de", ...)``
    records: per-chunk vector LISTS under root metadata): planted
    dyadic-rational vectors roundtrip bit-exactly through
    pack -> unpack; both nesting levels re-exploded to scalar rows for
    the value-hash compare."""
    from trustgraph_spark.operators.kgcore import (
        decode_core_doc_embeddings,
        encode_core_doc_embeddings,
    )

    did = F.col("doc_id").cast("long")
    chunks = _docs(spark, sf_dir).select(
        F.concat(F.lit("doc-"), (did % 5).cast("string")).alias("id"),
        F.lit("default").alias("collection"),
        F.concat(F.lit("chunk-"), did.cast("string")).alias("chunk_id"),
        F.array(
            F.array(did / F.lit(4.0), -did / F.lit(8.0)),
            F.array((did % 16) / F.lit(2.0)),
        ).alias("vectors"),
    )
    back = decode_core_doc_embeddings(
        encode_core_doc_embeddings(chunks, batch_size=32))
    return back.select(
        "id", "collection", "chunk_id",
        F.posexplode("vectors").alias("vec_idx", "vec"),
    ).select(
        "id", "collection", "chunk_id", "vec_idx",
        F.posexplode("vec").alias("pos", "value"),
    ).select("id", "collection", "chunk_id", "vec_idx", "pos",
             F.col("value").cast("double").alias("value"))


def q_cli_graph_query(spark, sf_dir):
    """tg-query-graph round trip (cli/query_graph.py:91-337): a
    CLI-style graph pattern (angle/urn term strings through build_term)
    feeds the Q1 pattern dispatch, and every matched triple renders
    with the native display formatter — IRIs bare, literals quoted
    with the language-beats-datatype tag precedence, RDF-star objects
    decoded from their byte-exact JSON to ``<<s p o>>``. Runs over the
    emitted explainability store plus planted @lang / ^^datatype
    literal rows so all three term shapes and both tag arms format."""
    from trustgraph_spark.cliquery import cli_query_graph

    d = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    q_uri = F.concat(F.lit("urn:trustgraph:question:s"), s(d))

    def lit_rows(pred, val, dtype, lang):
        return _docs(spark, sf_dir).where(d % 5 == 1).select(
            F.lit("default").alias("collection"),
            F.lit("urn:graph:retrieval").alias("g"),
            q_uri.alias("s"), F.lit(_EXPLAIN_TG + pred).alias("p"),
            val.alias("o"), F.lit("l").alias("otype"),
            F.lit(dtype).alias("dtype"), F.lit(lang).alias("lang"))

    edges = _explain_store(spark, sf_dir).unionByName(
        lit_rows("note", F.concat(F.lit("note "), s(d)), "", "en")
    ).unionByName(lit_rows("rank", s(d % 9), "xsd:integer", ""))
    return cli_query_graph(edges, g="urn:graph:retrieval")


def _universal_elements(spark, sf_dir):
    """Planted decoder-element table: 6 elements per document; doc_id
    residues toggle page-based mime, Titles, table HTML, images, empty
    texts, and a missing page number — each arm of the universal
    decoder exercised and exactly replayable in SQL."""
    d = F.col("doc_id").cast("string")
    di = F.col("doc_id")
    i = F.col("i")
    return _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.sequence(F.lit(0), F.lit(5))).alias("i")
    ).select(
        d.alias("doc_id"),
        F.when(di % 4 == 0, "application/pdf")
        .otherwise("text/plain").alias("mime_type"),
        i.cast("int").alias("element_idx"),
        F.when((i == 5) & (di % 5 == 0), "Image")
        .when(i == 3, "Table")
        .when(((i == 2) | (i == 4)) & (di % 3 != 0), "Title")
        .otherwise("NarrativeText").alias("category"),
        F.when((i == 1) & (di % 7 == 0), "").otherwise(
            F.concat(F.lit("el "), d, F.lit(" "), i.cast("string")))
        .alias("text"),
        F.when((i == 3) & (di % 2 == 0),
               F.concat(F.lit("<table>"), d, F.lit("</table>")))
        .alias("text_as_html"),
        F.when((di % 4 == 0) & ~((i == 0) & (di % 8 == 0)),
               (F.floor(i / 3) + 1).cast("int")).alias("page_number"),
    )


def q_universal_sections(spark, sf_dir):
    """Universal decoder section flow (decoding/universal/processor.py
    :374-517 + strategies.py heading): page-based docs group by page
    (missing page -> 1), text docs run the heading strategy (Title
    boundaries except in leading position, whole-document fallback);
    assembly joins text with blank lines, tables prefer HTML, empty
    sections drop; element_types sorted csv; deterministic sha256
    page/section URIs."""
    from trustgraph_spark.operators.unstructured import decode_universal

    out = decode_universal(
        _universal_elements(spark, sf_dir), strategy="heading")
    return out["sections"].select(
        "entity_uri", "parent_uri", "label", "page_number",
        "section_index", "section", "element_types", "table_count",
        "image_count", "char_length", F.md5("text").alias("text_key"),
    )


def q_universal_images(spark, sf_dir):
    """Universal decoder image flow (processor.py:316-373, 460-478):
    images store separately with provenance parented to their page's
    emitted section on page-based docs (falling back to the document
    when the page produced no text) and to the document on section-path
    docs, with the reference's label shapes."""
    from trustgraph_spark.operators.unstructured import decode_universal

    out = decode_universal(
        _universal_elements(spark, sf_dir), strategy="heading")
    return out["images"].select(
        "entity_uri", "parent_uri", "label", "page_number", "doc_id",
        "mime_type",
    )


def q_metering_costs(spark, sf_dir):
    """Token metering (metering/counter.py:26-140): per-workspace
    price tables resolved from the config store (type token-cost, one
    JSON value per model, :66-90), then the two Prometheus counters
    (tg_metering_tokens_total / tg_metering_cost_usd_total, model x
    direction) computed over a completions table in ONE broadcast join
    + grouped aggregate.  Planted: the config log exercises
    last-write-wins, the malformed-JSON skip, and the type filter
    (which unprices ws0/gpt-b entirely); completions exercise the
    "unknown"-model fallback (:101, empty AND null), null token counts
    (:102-103), and the not-found unpriced arm (:104-105 — tokens
    counted, no cost).  Costs gated as exact integer micro-USD."""
    from trustgraph_spark.operators.metering import (
        meter_costs, price_table_from_config, token_counters)

    n = F.col("doc_id")
    docs = _docs(spark, sf_dir)
    cfg_log = docs.where(n < 12).select(
        F.concat(F.lit("ws"), (n % 2).cast("string")).alias("workspace"),
        F.when(n % 6 == 4, F.lit("prompt"))
        .otherwise(F.lit("token-cost")).alias("type"),
        F.when(n % 3 == 0, F.lit("gpt-a"))
        .when(n % 3 == 1, F.lit("gpt-b"))
        .otherwise(F.lit("gpt-c")).alias("key"),
        F.when(n % 3 == 2, F.lit("not json")).otherwise(F.concat(
            F.lit('{"input_price": 0.00000'),
            (n % 4 + 1).cast("string"),
            F.lit(', "output_price": 0.00000'),
            (n % 4 + 2).cast("string"), F.lit("}"))).alias("value"),
        n.cast("long").alias("seq"),
        F.lit(False).alias("deleted"),
    )
    completions = docs.select(
        F.concat(F.lit("ws"), (n % 2).cast("string")).alias("workspace"),
        F.when(n % 5 == 0, F.lit("gpt-a"))
        .when(n % 5 == 1, F.lit("gpt-b"))
        .when(n % 5 == 2, F.lit("unpriced"))
        .when(n % 5 == 3, F.lit(""))
        .otherwise(F.lit(None).cast("string")).alias("model"),
        F.when(n % 11 == 0, F.lit(None).cast("long"))
        .otherwise((n % 1000).cast("long")).alias("in_token"),
        F.when(n % 13 == 0, F.lit(None).cast("long"))
        .otherwise((n * 3 % 800).cast("long")).alias("out_token"),
    )
    metered = meter_costs(completions, price_table_from_config(cfg_log))
    return token_counters(metered).select(
        "workspace", "model", "direction", "tokens",
        F.round(F.col("cost_usd") * 1e6).cast("long").alias("cost_micro"))


def _release_stale_blocks(spark: SparkSession) -> None:
    """Unpersist every persisted RDD before building the next query.

    Several queries (and the operators they call) localCheckpoint
    bounded intermediates — the sanctioned within-run materializations.
    Spark never frees those blocks until the session ends, so a long
    multi-query session (the bench runs 61 queries x 2, the correctness
    gate 124) accumulates gigabytes of dead blocks and the later
    queries pay the GC pressure: the same query measured 2-3x slower
    late in a sweep than isolated.  Every consumer of this registry
    constructs one query, evaluates it, then moves on (bench.py's
    per-run loop, tools/check_oracles.py, the driver's gate), so blocks
    from PRIOR constructions are unreachable garbage by the time the
    next construction starts.  Never call mid-query: unpersisting a
    live localCheckpoint is unrecoverable (lineage is truncated)."""
    try:
        it = (spark.sparkContext._jsc.getPersistentRDDs()
              .entrySet().iterator())
        while it.hasNext():
            it.next().getValue().unpersist(False)
    except Exception:
        pass  # best-effort hygiene; never fail a query over cleanup


def _with_cleanup(fn):
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _release_stale_blocks(spark)
        return fn(spark, sf_dir)

    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _with_cleanup(fn) for name, fn in _registry().items()}


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # Ordering matters: the driver's CORRECTNESS snapshot covers the
        # FIRST 50 registry entries.  Window invariant (r5 verdict): new
        # OR rewritten-since-last-driver-check entries come first.  This
        # round rewrote the execution path (not the semantics) of the
        # dedup family (zip_with shingles, nd_guard verify, hoisted
        # norms), the docrag tokenizer/postings, the ontology key-term
        # extractor, nodes materialization, the linking scorer, the
        # extraction fast path, and the wire dispatcher — those entries
        # hold the window so CORRECTNESS_r06 re-checks the rewritten
        # code; driver-r5-green entries whose code is untouched rotate
        # to the back.
        # -- r6-rewritten / r6-touched (driver window: first 50) --
        "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "minhash_sig4": q_minhash_sig4,
        "emb_near_dup": q_emb_near_dup,
        "dedup_exact_groups": q_dedup_exact_groups,
        "dedup_resolve": q_dedup_resolve,
        "dedup_incremental": q_dedup_incremental,
        "doc_rag_bm25": q_doc_rag_bm25,
        "doc_rag_hybrid": q_doc_rag_hybrid,
        "doc_rag_topk": q_doc_rag_topk,
        "doc_rag_mmr_pool": q_doc_rag_mmr_pool,
        "doc_rag_mmr": q_doc_rag_mmr,
        "doc_rag_rerank": q_doc_rag_rerank,
        "onto_segments": q_onto_segments,
        "onto_match_query": q_onto_match_query,
        "nl2sparql_exec": q_nl2sparql_exec,
        "onto_select": q_onto_select,
        "kg_nodes_degree": q_kg_nodes_degree,
        "kg_linking_cc": q_kg_linking_cc,
        "kg_def_triples": q_kg_def_triples,
        "kg_rel_triples": q_kg_rel_triples,
        "kg_entity_contexts": q_kg_entity_contexts,
        "kg_prov_triples": q_kg_prov_triples,
        "kg_mentions": q_kg_mentions,
        "agent_triples": q_agent_triples,
        "wire_triples_exec": q_wire_triples_exec,
        "wire_embed_exec": q_wire_embed_exec,
        "extraction_hierarchy": q_extraction_hierarchy,
        "explain_trace": q_explain_trace,
        "span_dedup": q_span_dedup,
        "gopher_metrics": q_gopher_metrics,
        "ngram_repetition": q_ngram_repetition,
        "decontam_13gram": q_decontam_13gram,
        "dsir_sample": q_dsir_sample,
        "semdedup_keep": q_semdedup_keep,
        "line_dedup_clean": q_line_dedup_clean,
        "line_dedup_stats": q_line_dedup_stats,
        "lm_quality": q_lm_quality,
        "pii_profile": q_pii_profile,
        "pii_redact": q_pii_redact,
        "pack_blocks": q_pack_blocks,
        "sample_to_mix": q_sample_to_mix,
        "corpus_shards": q_corpus_shards,
        "react_tool_trace": q_react_tool_trace,
        "react_prov_triples": q_react_prov_triples,
        "onto_extract_convert": q_onto_extract_convert,
        "media_stdlib_features": q_media_stdlib_features,
        "doc_fingerprint": q_doc_fingerprint,
        "language_id": q_language_id,
        "quality_score": q_quality_score,
        # -- unchanged this round; green driver history r1-r5 --
        "librarian_uploads": q_librarian_uploads,
        "tgx_roundtrip": q_tgx_roundtrip,
        "metering_costs": q_metering_costs,
        "explain_rag_emit": q_explain_rag_emit,
        "explain_entities": q_explain_entities,
        "doc_prov_triples": q_doc_prov_triples,
        "universal_sections": q_universal_sections,
        "universal_images": q_universal_images,
        "edge_prov_trace": q_edge_prov_trace,
        "cli_graph_query": q_cli_graph_query,
        "kg_core_de_msgpack": q_kg_core_de_msgpack,
        "doc_library_triples": q_doc_library_triples,
        "nquads_export": q_nquads_export,
        "nquads_roundtrip": q_nquads_roundtrip,
        "turtle_export": q_turtle_export,
        "kg_core_msgpack": q_kg_core_msgpack,
        "kg_core_ge_msgpack": q_kg_core_ge_msgpack,
        "structured_ingest": q_structured_ingest,
        "turtle_roundtrip": q_turtle_roundtrip,
        "prompt_render": q_prompt_render,
        "config_resolve_state": q_config_resolve,
        "flow_topic_sweep": q_flow_topic_sweep,
        "source_stats": q_source_stats,
        "iam_authorise": q_iam_authorise,
        "iam_resolve_keys": q_iam_resolve_keys,
        "bootstrap_state": q_bootstrap_state,
        "text_embed_bucket": q_text_embed_bucket,
        "term_reconstruct": q_term_reconstruct,
        "graph_embed_map": q_graph_embed_map,
        "jsonl_parse": q_jsonl_parse,
        "rerank_topk": q_rerank_topk,
        "rows_store_query": q_rows_store_query,
        "graphql_rows": q_graphql_rows,
        "sparql_path_star": q_sparql_path_star,
        "row_emb_lookup": q_row_emb_lookup,
        "sparql_graph_var": q_sparql_graph_var,
        "diag_detect_type": q_diag_detect_type,
        "sparql_subquery": q_sparql_subquery,
        "sparql_path_nps": q_sparql_path_nps,
        "kg_label_triples": q_kg_label_triples,
        "kg_cooccur_edges": q_kg_cooccur_edges,
        "kg_quads_by_entity": q_kg_quads_by_entity,
        "kg_pattern_po": q_kg_pattern_po,
        "token_count": q_token_count,
        "ann_cosine_topk": q_ann_cosine_topk,
        "events_sessionize": q_events_sessionize,
        "events_window_agg": q_events_window_agg,
        "pricing_summary": q_pricing_summary,
        "kg_bgp_two_hop": q_kg_bgp_two_hop,
        "sparql_two_hop": q_sparql_two_hop,
        "sparql_group_count": q_sparql_group_count,
        "simhash16": q_simhash16,
        "revenue_by_nation": q_revenue_by_nation,
        "top_parts_by_size": q_top_parts_by_size,
        "chunk_recursive": q_chunk_recursive,
        "chunk_token": q_chunk_token,
        "graphrag_hop2": q_graphrag_hop2,
        "sparql_optional": q_sparql_optional,
        "sparql_union_bind": q_sparql_union_bind,
        "sparql_minus_values": q_sparql_minus_values,
        "sparql_builtins": q_sparql_builtins,
        "sparql_construct": q_sparql_construct,
        "sparql_describe": q_sparql_describe,
        "sparql_having_ask": q_sparql_having_ask,
        "sparql_graph_clause": q_sparql_graph_clause,
        "topic_triples": q_topic_triples,
        "rows_validate": q_rows_validate,
        "kg_core_roundtrip": q_kg_core_roundtrip,
        "collections_admin": q_collections_admin,
        "warehouse_roundtrip": q_warehouse_roundtrip,
        "media_features": q_media_features,
        "prov_trace": q_prov_trace,
        "entity_normalize": q_entity_normalize,
        "retrieval_prov": q_retrieval_prov,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_MENTIONS_CTE = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), mentions AS (
  SELECT DISTINCT doc_id, token AS entity FROM toks
  WHERE token IN ({_VOCAB_SQL})
)
"""

_COOCCUR_CTE = _MENTIONS_CTE + f"""
, cooccur AS (
  SELECT '{TG}' || a.entity AS s,
         '{CO_URI}' AS p,
         '{TG}' || b.entity AS o,
         count(*)::BIGINT AS n_docs
  FROM mentions a JOIN mentions b USING (doc_id)
  WHERE a.entity < b.entity
  GROUP BY 1, 2, 3
)
"""

_NORM_TOKS = (
    "list_filter(string_split(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')), ' '), "
    "x -> x <> '')"
)

_SHINGLES_CTE = f"""
WITH toks AS (
  SELECT doc_id, {_NORM_TOKS} AS tk FROM documents
), sh AS (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                                 i -> array_to_string(tk[i:i+2], ' '))) AS shingle
    FROM toks
  )
)
"""


def oracle_sql() -> dict[str, str]:
    sql: dict[str, str] = {}

    sql["corpus_shards"] = """
WITH s AS (
  SELECT doc_id, text,
         md5('r5:' || CAST(doc_id AS VARCHAR)) AS order_key
  FROM documents
), a AS (
  SELECT doc_id, text, order_key,
         CAST(('0x' || substr(order_key, 1, 8))::UBIGINT % 16 AS INT)
           AS shard_id
  FROM s
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       min(order_key) AS first_key,
       arg_min(doc_id, order_key) AS first_doc
FROM a
GROUP BY shard_id
ORDER BY shard_id
"""

    cent_rows = ",\n    ".join(
        "({}, [{}]::DOUBLE[])".format(
            i, ", ".join(repr(x) for x in c))
        for i, c in enumerate(_semdedup_centroids()))
    sql["semdedup_keep"] = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, list_transform(embedding::DOUBLE[], x -> x + 0.01)
  FROM embeddings WHERE vec_id % 5 = 0
), cents(cid, cv) AS (VALUES
    {cent_rows}
), asg AS (
  SELECT vec_id, v, cid FROM (
    SELECT b.vec_id, b.v, c.cid,
           row_number() OVER (PARTITION BY b.vec_id
                              ORDER BY list_cosine_similarity(b.v, c.cv) DESC,
                                       c.cid ASC) AS rn
    FROM base b, cents c) WHERE rn = 1
), simd AS (
  SELECT a.vec_id, a.cid, a.v,
         round(list_cosine_similarity(a.v, c.cv), 6) AS centroid_sim
  FROM asg a JOIN cents c USING (cid)
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY cid
                               ORDER BY centroid_sim ASC, vec_id ASC)
            AS csim_rank
  FROM simd
), dropped AS (
  SELECT DISTINCT r.vec_id
  FROM ranked r JOIN ranked e
    ON r.cid = e.cid AND e.csim_rank < r.csim_rank
  WHERE list_cosine_similarity(r.v, e.v) >= 0.95
)
SELECT r.vec_id, r.cid AS cluster_id, r.centroid_sim,
       r.csim_rank::BIGINT AS csim_rank,
       d.vec_id IS NULL AS kept
FROM ranked r LEFT JOIN dropped d USING (vec_id)
"""

    sql["dsir_sample"] = """
WITH d AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), g AS (
  SELECT doc_id,
         w || list_transform(generate_series(1, greatest(len(w) - 1, 0)),
                             i -> w[i] || ' ' || w[i + 1]) AS gs
  FROM d
), raw_g AS (
  SELECT doc_id, ('0x' || substr(md5(u.g), 1, 8))::UBIGINT % 256 AS bucket
  FROM g, unnest(gs) AS u(g)
), tgt_g AS (
  SELECT bucket FROM raw_g JOIN documents USING (doc_id)
  WHERE lang = 'en' AND doc_id % 7 = 0
), tc AS (SELECT bucket, count(*) AS cnt FROM tgt_g GROUP BY bucket),
tt AS (SELECT coalesce(sum(cnt), 0)::DOUBLE AS total FROM tc),
bc AS (SELECT bucket, count(*) AS cnt FROM raw_g GROUP BY bucket),
bt AS (SELECT coalesce(sum(cnt), 0)::DOUBLE AS total FROM bc),
scored AS (
  SELECT r.doc_id,
         ln(coalesce(tc.cnt + 1.0, 1.0) / (tt.total + 256.0))
         - ln(coalesce(bc.cnt + 1.0, 1.0) / (bt.total + 256.0)) AS llr
  FROM raw_g r LEFT JOIN tc USING (bucket) LEFT JOIN bc USING (bucket),
       tt, bt
), agg AS (
  SELECT doc_id, count(*) AS n_grams, round(sum(llr), 6) AS weight
  FROM scored GROUP BY doc_id
), alldocs AS (
  SELECT d.doc_id, coalesce(agg.n_grams, 0)::BIGINT AS n_grams,
         coalesce(agg.weight, 0.0) AS weight
  FROM d LEFT JOIN agg USING (doc_id)
)
SELECT doc_id, n_grams, weight,
       round(weight - ln(-ln(
         (('0x' || substr(md5('dsir' || doc_id), 1, 8))::UBIGINT + 0.5)
         / 4294967296.0)), 6) AS key
FROM alldocs
ORDER BY key DESC, doc_id ASC LIMIT 40
"""

    # -- explainability provenance (provenance/triples.py:97-833 emit;
    #    api/explainability.py:85-972 read) ------------------------------
    _ns = "https://trustgraph.ai/ns/"
    _rt = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    _pv = "http://www.w3.org/ns/prov#"
    _pe, _wdf, _sat = _pv + "Entity", _pv + "wasDerivedFrom", _pv + "startedAtTime"
    _ejson = (
        "'{\"s\": {\"type\": \"i\", \"iri\": \"' || es || "
        "'\"}, \"p\": {\"type\": \"i\", \"iri\": \"" + _ns + "rel\"}, "
        "\"o\": {\"type\": \"i\", \"iri\": \"' || eo || '\"}}'"
    )
    _EXPLAIN_CTE = f"""
WITH gr AS (
  SELECT doc_id AS d,
    'urn:trustgraph:question:s' || doc_id AS q,
    'urn:trustgraph:prov:grounding:s' || doc_id AS g,
    'urn:trustgraph:prov:exploration:s' || doc_id AS e,
    'urn:trustgraph:prov:focus:s' || doc_id AS f,
    'urn:trustgraph:prov:synthesis:s' || doc_id AS syn,
    'urn:trustgraph:prov:edge:s' || doc_id || ':0' AS sel,
    'who is entity ' || (doc_id % 40) || '?' AS query,
    '2026-01-01T00:00:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || 'Z' AS ts,
    'alpha' || (doc_id % 7) AS concept,
    'http://trustgraph.ai/e/e' || (doc_id % 11) AS ent,
    (doc_id % 13)::VARCHAR AS ec,
    'http://trustgraph.ai/e/e' || (doc_id % 11) AS es,
    'http://trustgraph.ai/e/e' || (doc_id % 9) AS eo,
    '0.' || (doc_id % 89 + 10) AS score
  FROM documents WHERE doc_id % 5 = 1
), dr AS (
  SELECT doc_id AS d,
    'urn:trustgraph:docrag:d' || doc_id AS q,
    'urn:trustgraph:docrag:d' || doc_id || '/grounding' AS g,
    'urn:trustgraph:docrag:d' || doc_id || '/exploration' AS e,
    'urn:trustgraph:docrag:d' || doc_id || '/focus' AS f,
    'urn:trustgraph:docrag:d' || doc_id || '/synthesis' AS syn,
    'urn:trustgraph:prov:chunk:d' || doc_id || ':0' AS sel,
    'what about doc ' || doc_id || '?' AS query,
    '2026-01-02T00:00:' || lpad((doc_id % 60)::VARCHAR, 2, '0') || 'Z' AS ts,
    'beta' || (doc_id % 4) AS concept,
    (doc_id % 6)::VARCHAR AS cc,
    'urn:chunk:' || (doc_id % 17) AS chunk,
    '0.' || (doc_id % 89 + 10) AS score
  FROM documents WHERE doc_id % 5 = 3
)
"""

    def _arm(src, s, p, o, otype, where=None):
        w = f" WHERE {where}" if where else ""
        return (f"SELECT {s} AS s, '{p}' AS p, {o} AS o, "
                f"'{otype}' AS otype FROM {src}{w}")

    _emit_arms = [
        # GraphRAG scalar chain (triples.py:372-634)
        _arm("gr", "q", _rt, f"'{_pe}'", "u"),
        _arm("gr", "q", _rt, f"'{_ns}Question'", "u"),
        _arm("gr", "q", _rt, f"'{_ns}GraphRagQuestion'", "u"),
        _arm("gr", "q", RDF_LABEL, "'GraphRAG Question'", "l"),
        _arm("gr", "q", _sat, "ts", "l"),
        _arm("gr", "q", _ns + "query", "query", "l"),
        _arm("gr", "g", _rt, f"'{_pe}'", "u"),
        _arm("gr", "g", _rt, f"'{_ns}Grounding'", "u"),
        _arm("gr", "g", RDF_LABEL, "'Grounding'", "l"),
        _arm("gr", "g", _wdf, "q", "u"),
        _arm("gr", "g", _ns + "concept", "concept", "l"),
        _arm("gr", "e", _rt, f"'{_pe}'", "u"),
        _arm("gr", "e", _rt, f"'{_ns}Exploration'", "u"),
        _arm("gr", "e", RDF_LABEL, "'Exploration'", "l"),
        _arm("gr", "e", _wdf, "g", "u"),
        _arm("gr", "e", _ns + "edgeCount", "ec", "l"),
        _arm("gr", "e", _ns + "entity", "ent", "u"),
        _arm("gr", "f", _rt, f"'{_pe}'", "u"),
        _arm("gr", "f", _rt, f"'{_ns}Focus'", "u"),
        _arm("gr", "f", RDF_LABEL, "'Focus'", "l"),
        _arm("gr", "f", _wdf, "e", "u"),
        _arm("gr", "syn", _rt, f"'{_pe}'", "u"),
        _arm("gr", "syn", _rt, f"'{_ns}Synthesis'", "u"),
        _arm("gr", "syn", _rt, f"'{_ns}Answer'", "u"),
        _arm("gr", "syn", RDF_LABEL, "'Synthesis'", "l"),
        _arm("gr", "syn", _wdf, "f", "u"),
        _arm("gr", "syn", _ns + "document", "'urn:doc:' || d", "u",
             "d % 2 = 0"),
        _arm("gr", "syn", _ns + "inToken", "d::VARCHAR", "l", "d % 3 = 0"),
        _arm("gr", "syn", _ns + "outToken", "(d + 1)::VARCHAR", "l",
             "d % 3 = 0"),
        _arm("gr", "syn", _ns + "llmModel", "'test-model'", "l",
             "d % 6 = 0"),
        # GraphRAG edge selection (triples.py:547-592)
        _arm("gr", "f", _ns + "selectedEdge", "sel", "u"),
        _arm("gr", "sel", _rt, f"'{_ns}EdgeSelection'", "u"),
        _arm("gr", "sel", _ns + "edge", _ejson, "t"),
        _arm("gr", "sel", _ns + "concept", "concept", "l", "d % 2 = 0"),
        _arm("gr", "sel", _ns + "score", "score", "l", "d % 3 <> 0"),
        _arm("gr", "sel", _ns + "reasoning", "'because ' || d", "l",
             "d % 4 = 0"),
        # DocumentRAG scalar chain (triples.py:644-833)
        _arm("dr", "q", _rt, f"'{_pe}'", "u"),
        _arm("dr", "q", _rt, f"'{_ns}Question'", "u"),
        _arm("dr", "q", _rt, f"'{_ns}DocRagQuestion'", "u"),
        _arm("dr", "q", RDF_LABEL, "'DocumentRAG Question'", "l"),
        _arm("dr", "q", _sat, "ts", "l"),
        _arm("dr", "q", _ns + "query", "query", "l"),
        _arm("dr", "g", _rt, f"'{_pe}'", "u"),
        _arm("dr", "g", _rt, f"'{_ns}Grounding'", "u"),
        _arm("dr", "g", RDF_LABEL, "'Grounding'", "l"),
        _arm("dr", "g", _wdf, "q", "u"),
        _arm("dr", "g", _ns + "concept", "concept", "l"),
        _arm("dr", "e", _rt, f"'{_pe}'", "u"),
        _arm("dr", "e", _rt, f"'{_ns}Exploration'", "u"),
        _arm("dr", "e", RDF_LABEL, "'Exploration'", "l"),
        _arm("dr", "e", _wdf, "g", "u"),
        _arm("dr", "e", _ns + "chunkCount", "cc", "l"),
        _arm("dr", "e", _ns + "selectedChunk", "chunk", "u"),
        _arm("dr", "syn", _rt, f"'{_pe}'", "u"),
        _arm("dr", "syn", _rt, f"'{_ns}Synthesis'", "u"),
        _arm("dr", "syn", _rt, f"'{_ns}Answer'", "u"),
        _arm("dr", "syn", RDF_LABEL, "'Synthesis'", "l"),
        _arm("dr", "syn", _wdf, "e", "u"),
        _arm("dr", "syn", _ns + "document", "'urn:doc:' || d", "u",
             "d % 3 = 0"),
        _arm("dr", "syn", _ns + "inToken", "d::VARCHAR", "l", "d % 4 = 0"),
        _arm("dr", "syn", _ns + "outToken", "(d * 2)::VARCHAR", "l",
             "d % 4 = 0"),
        # Focus envelope only when reranked is non-empty
        _arm("dr", "f", _rt, f"'{_pe}'", "u", "d % 7 <> 0"),
        _arm("dr", "f", _rt, f"'{_ns}Focus'", "u", "d % 7 <> 0"),
        _arm("dr", "f", RDF_LABEL, "'Chunk Selection'", "l", "d % 7 <> 0"),
        _arm("dr", "f", _wdf, "e", "u", "d % 7 <> 0"),
        # Chunk selection rows skip empty chunk_id (d % 3 = 0)
        _arm("dr", "f", _ns + "selectedChunk", "sel", "u",
             "d % 7 <> 0 AND d % 3 <> 0"),
        _arm("dr", "sel", _rt, f"'{_ns}ChunkSelection'", "u",
             "d % 7 <> 0 AND d % 3 <> 0"),
        _arm("dr", "sel", _ns + "document", "chunk", "u",
             "d % 7 <> 0 AND d % 3 <> 0"),
        _arm("dr", "sel", _ns + "score", "score", "l",
             "d % 7 <> 0 AND d % 3 <> 0 AND d % 2 = 0"),
    ]
    sql["explain_rag_emit"] = _EXPLAIN_CTE + "\nUNION ALL\n".join(_emit_arms)

    def _ent_row(src, uri, etype, qtype="''", query="''", ts="''",
                 n_con="0", con_key="md5('')", ec="0", cc="0", n_ent="0",
                 edge_key="md5('')", doc="''", where=None):
        w = f" WHERE {where}" if where else ""
        return (
            f"SELECT {uri} AS uri, '{etype}' AS entity_type, "
            f"{qtype} AS question_type, {query} AS query, "
            f'{ts} AS "timestamp", {n_con}::INT AS n_concepts, '
            f"{con_key} AS concepts_key, {ec}::INT AS edge_count, "
            f"{cc}::INT AS chunk_count, {n_ent}::INT AS n_entities, "
            f"{edge_key} AS edges_key, {doc} AS document FROM {src}{w}"
        )

    sql["explain_entities"] = _EXPLAIN_CTE + "\nUNION ALL\n".join([
        _ent_row("gr", "q", "question", "'graph-rag'", "query", "ts"),
        _ent_row("gr", "g", "grounding", n_con="1", con_key="md5(concept)"),
        _ent_row("gr", "e", "exploration", ec="(d % 13)", n_ent="1"),
        _ent_row("gr", "f", "focus", edge_key="md5(sel)"),
        _ent_row("gr", "syn", "synthesis",
                 doc="CASE WHEN d % 2 = 0 THEN 'urn:doc:' || d "
                     "ELSE '' END"),
        _ent_row("gr", "sel", "unknown"),
        _ent_row("dr", "q", "question", "'document-rag'", "query", "ts"),
        _ent_row("dr", "g", "grounding", n_con="1", con_key="md5(concept)"),
        _ent_row("dr", "e", "exploration", cc="(d % 6)"),
        _ent_row("dr", "f", "focus", where="d % 7 <> 0"),
        _ent_row("dr", "syn", "synthesis",
                 doc="CASE WHEN d % 3 = 0 THEN 'urn:doc:' || d "
                     "ELSE '' END"),
        _ent_row("dr", "sel", "unknown",
                 where="d % 7 <> 0 AND d % 3 <> 0"),
    ])

    sql["explain_trace"] = _EXPLAIN_CTE + f"""
SELECT q AS question_uri, 'graph-rag' AS question_type, query,
       ts AS "timestamp", g AS grounding_uri, md5(concept) AS concepts_key,
       e AS exploration_uri, (d % 13)::INT AS edge_count, 0::INT AS chunk_count,
       1::INT AS n_entities, f AS focus_uri, 1::INT AS n_selected,
       syn AS synthesis_uri,
       CASE WHEN d % 2 = 0 THEN 'urn:doc:' || d ELSE '' END
         AS synthesis_document
FROM gr
UNION ALL
SELECT q, 'document-rag', query, ts, g, md5(concept),
       e, 0::INT, (d % 6)::INT, 0::INT,
       CASE WHEN d % 7 <> 0 THEN f END,
       CASE WHEN d % 7 <> 0 THEN 0 END::INT,
       syn, CASE WHEN d % 3 = 0 THEN 'urn:doc:' || d ELSE '' END
FROM dr
"""

    _DOCPROV_CTE = """
WITH dp AS (
  SELECT doc_id AS d, n_chars,
    'urn:doc:' || doc_id AS doc,
    'urn:chunk:c' || doc_id AS ent,
    'https://trustgraph.ai/activity/'
      || sha256('urn:chunk:c' || doc_id || ':chunker') AS act
  FROM documents
)
"""
    _agt = "https://trustgraph.ai/agent/chunker"
    _dc = "http://purl.org/dc/elements/1.1/"
    sql["doc_prov_triples"] = _DOCPROV_CTE + "\nUNION ALL\n".join([
        _arm("dp", "doc", _rt, f"'{_pe}'", "u"),
        _arm("dp", "doc", _rt, f"'{_ns}Document'", "u"),
        _arm("dp", "doc", _dc + "title", "'Doc ' || d", "l", "d % 2 = 0"),
        _arm("dp", "doc", RDF_LABEL, "'Doc ' || d", "l", "d % 2 = 0"),
        _arm("dp", "doc", _dc + "source", "'http://src/' || d", "u",
             "d % 3 = 0"),
        _arm("dp", "doc", _dc + "date",
             "'2026-0' || (d % 9 + 1) || '-01'", "l", "d % 4 = 0"),
        _arm("dp", "doc", _dc + "creator", "'author ' || (d % 13)", "l",
             "d % 5 = 0"),
        _arm("dp", "doc", _ns + "pageCount", "(d % 9)::VARCHAR", "l",
             "d % 6 = 0"),
        _arm("dp", "doc", _ns + "mimeType", "'text/plain'", "l",
             "d % 2 = 1"),
        _arm("dp", "ent", _rt, f"'{_pe}'", "u"),
        _arm("dp", "ent", _rt,
             f"CASE WHEN d % 11 = 0 THEN '{_ns}Image' "
             f"ELSE '{_ns}Chunk' END", "u"),
        _arm("dp", "ent", _wdf, "doc", "u"),
        _arm("dp", "ent", _pv + "wasGeneratedBy", "act", "u"),
        _arm("dp", "act", _rt, f"'{_pv}Activity'", "u"),
        _arm("dp", "act", RDF_LABEL, "'chunker extraction'", "l"),
        _arm("dp", "act", _pv + "used", "doc", "u"),
        _arm("dp", "act", _pv + "wasAssociatedWith", f"'{_agt}'", "u"),
        _arm("dp", "act", _sat, "'2026-01-01T00:00:00Z'", "l"),
        _arm("dp", "act", _ns + "componentVersion", "'0.1.0'", "l"),
        _arm("dp", f"'{_agt}'", _rt, f"'{_pv}Agent'", "u"),
        _arm("dp", f"'{_agt}'", RDF_LABEL, "'chunker'", "l"),
        _arm("dp", "ent", RDF_LABEL, "'chunk of ' || d", "l", "d % 3 = 0"),
        _arm("dp", "ent", _ns + "chunkIndex", "(d % 5)::VARCHAR", "l"),
        _arm("dp", "ent", _ns + "charOffset", "(d % 7)::VARCHAR", "l"),
        _arm("dp", "ent", _ns + "charLength", "n_chars::VARCHAR", "l"),
    ])

    # -- universal decoder (decoding/universal/processor.py + strategies) --
    _UNIV_CTE = """
WITH els AS (
  SELECT d.doc_id AS d, t.i AS i,
    CASE WHEN d.doc_id % 4 = 0 THEN 'application/pdf'
         ELSE 'text/plain' END AS mime,
    CASE WHEN t.i = 5 AND d.doc_id % 5 = 0 THEN 'Image'
         WHEN t.i = 3 THEN 'Table'
         WHEN (t.i = 2 OR t.i = 4) AND d.doc_id % 3 <> 0 THEN 'Title'
         ELSE 'NarrativeText' END AS cat,
    CASE WHEN t.i = 1 AND d.doc_id % 7 = 0 THEN ''
         ELSE 'el ' || d.doc_id || ' ' || t.i END AS txt,
    CASE WHEN t.i = 3 AND d.doc_id % 2 = 0
         THEN '<table>' || d.doc_id || '</table>' END AS html,
    CASE WHEN d.doc_id % 4 = 0 AND NOT (t.i = 0 AND d.doc_id % 8 = 0)
         THEN t.i // 3 + 1 END AS pg
  FROM documents d CROSS JOIN range(0, 6) t(i)
), nonimg AS (
  SELECT *, coalesce(pg, 1) AS page,
    CASE WHEN cat = 'Table' THEN coalesce(nullif(html, ''), txt)
         ELSE txt END AS part
  FROM els WHERE cat <> 'Image'
), psec AS (
  SELECT d, mime, page,
    string_agg(part, chr(10) || chr(10) ORDER BY i)
      FILTER (WHERE part <> '') AS text,
    array_to_string(list_sort(list(DISTINCT cat)), ',') AS element_types,
    (count(*) FILTER (WHERE cat = 'Table'))::INT AS table_count
  FROM nonimg WHERE mime = 'application/pdf'
  GROUP BY d, mime, page
), sein AS (
  SELECT *,
    row_number() OVER (PARTITION BY d ORDER BY i) AS pos,
    max(CASE WHEN cat = 'Title' THEN 1 ELSE 0 END)
      OVER (PARTITION BY d) AS ht
  FROM nonimg WHERE mime = 'text/plain'
), seg AS (
  SELECT *, CASE WHEN ht = 0 THEN 1 ELSE
    sum(CASE WHEN cat = 'Title' AND pos > 1 THEN 1 ELSE 0 END)
      OVER (PARTITION BY d ORDER BY i ROWS UNBOUNDED PRECEDING) + 1
    END AS sid
  FROM sein
), ssec AS (
  SELECT d, mime, sid,
    string_agg(part, chr(10) || chr(10) ORDER BY i)
      FILTER (WHERE part <> '') AS text,
    array_to_string(list_sort(list(DISTINCT cat)), ',') AS element_types,
    (count(*) FILTER (WHERE cat = 'Table'))::INT AS table_count
  FROM seg GROUP BY d, mime, sid
)
"""
    sql["universal_sections"] = _UNIV_CTE + """
SELECT 'urn:page:' || sha256(d || ':' || page) AS entity_uri,
       'urn:doc:' || d AS parent_uri,
       'Page ' || page AS label,
       page::INT AS page_number, NULL::INT AS section_index,
       FALSE AS section, element_types, table_count,
       0::INT AS image_count, length(text)::INT AS char_length,
       md5(text) AS text_key
FROM psec WHERE trim(coalesce(text, '')) <> ''
UNION ALL
SELECT 'urn:section:' || sha256(d || ':' || sid),
       'urn:doc:' || d, 'Section ' || sid,
       NULL::INT, sid::INT, TRUE, element_types, table_count,
       0::INT, length(text)::INT, md5(text)
FROM ssec WHERE trim(coalesce(text, '')) <> ''
"""

    sql["universal_images"] = _UNIV_CTE + """
, imgs AS (SELECT *, coalesce(pg, 1) AS page FROM els WHERE cat = 'Image')
SELECT 'urn:image:' || sha256(i2.d || ':' || i2.i) AS entity_uri,
       CASE WHEN i2.mime = 'application/pdf'
            THEN coalesce('urn:page:' || sha256(p.d || ':' || p.page),
                          'urn:doc:' || i2.d)
            ELSE 'urn:doc:' || i2.d END AS parent_uri,
       CASE WHEN i2.mime = 'application/pdf'
            THEN 'Image from page ' || i2.page
            ELSE 'Image' END AS label,
       CASE WHEN i2.mime = 'application/pdf' THEN i2.page END::INT
         AS page_number,
       i2.d::VARCHAR AS doc_id, i2.mime AS mime_type
FROM imgs i2
LEFT JOIN (SELECT d, page FROM psec
           WHERE trim(coalesce(text, '')) <> '') p
  ON i2.d = p.d AND i2.page = p.page
"""

    sql["edge_prov_trace"] = """
WITH gr AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 1)
SELECT 'urn:trustgraph:prov:edge:s' || a.d || ':0' AS selection_uri,
       'https://trustgraph.ai/subgraph/x' || b.d AS stmt_uri,
       'https://trustgraph.ai/subgraph/x' || b.d
         || ' -> urn:chunk:c' || b.d
         || ' -> urn:page:p' || (b.d % 10)
         || ' -> Doc ' || (b.d % 10) AS source_chain,
       'urn:chunk:c' || b.d AS content_chunk,
       4::INT AS chain_len
FROM gr a JOIN gr b ON a.d % 11 = b.d % 11 AND a.d % 9 = b.d % 9
"""

    sql["wire_triples_exec"] = """
WITH docs AS (SELECT doc_id AS d FROM documents),
store AS (
  SELECT 'default' AS collection,
         CASE WHEN d % 5 = 0 THEN 'urn:g:1' ELSE '' END AS g,
         'http://t/e/' || (d % 11) AS s, 'http://t/p/' || (d % 3) AS p,
         'http://t/e/' || (d % 7) AS o, 'u' AS otype,
         '' AS dtype, '' AS lang
  FROM docs
  UNION ALL
  SELECT 'default', '', 'http://t/e/' || (d % 11),
         'http://t/p/' || (d % 3), 'lit ' || (d % 13), 'l', '',
         CASE WHEN (d % 13) % 2 = 0 THEN 'en' ELSE '' END
  FROM docs WHERE d % 4 = 0
), reqs AS (
  SELECT 'r' || d AS req_id,
         CASE WHEN ((d % 160) // 20) >= 4
              THEN 'http://t/e/' || (d % 11) END AS s_val,
         CASE WHEN (((d % 160) // 20) % 4) >= 2
              THEN 'http://t/p/' || (d % 3) END AS p_val,
         CASE WHEN ((d % 160) // 20) % 2 = 1
              THEN 'http://t/e/' || (d % 7) END AS o_val,
         CASE WHEN ((d % 60) // 20) = 0 THEN ''
              WHEN ((d % 60) // 20) = 1 THEN 'urn:g:1' END AS g_val,
         1 + (d % 3) * 3 AS lim
  FROM docs WHERE d % 20 = 0
), matched AS (
  SELECT r.req_id, t.s, t.p, t.o, t.otype, t.dtype, t.lang, t.g, r.lim
  FROM reqs r JOIN store t
    ON (r.s_val IS NULL OR t.s = r.s_val)
   AND (r.p_val IS NULL OR t.p = r.p_val)
   AND (r.o_val IS NULL OR t.o = r.o_val)
   AND (r.g_val IS NULL OR t.g = r.g_val)
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY req_id ORDER BY g, s, p, o, otype) AS rn
  FROM matched
)
SELECT req_id, s, p, o, otype, dtype, lang, g
FROM ranked WHERE rn <= lim
"""

    sql["tgx_roundtrip"] = """
WITH docs AS (SELECT doc_id AS d FROM documents)
SELECT 'config' AS part, 'ty' || (d % 3) AS a, 'key' || d AS b,
       '"val ' || (d % 7) || '"' AS c, '' AS d, '' AS e
FROM docs WHERE d % 10 = 0
UNION ALL
SELECT 'triple', 'c' || (d % 2), 'http://s/' || (d % 11),
       'http://p/' || (d % 3),
       CASE WHEN d % 4 = 0 THEN 'lit ' || (d % 13)
            ELSE 'http://o/' || (d % 7) END,
       CASE WHEN d % 4 = 0
            THEN 'l||' || CASE WHEN (d % 13) % 2 = 0 THEN 'en'
                               ELSE '' END
            ELSE 'u||' END
FROM docs WHERE d % 9 <> 0
UNION ALL
SELECT 'doc', 'doc' || d,
       CASE WHEN d % 50 <> 0 THEN 'doc' || (d - 25) ELSE '' END,
       'T' || (d % 5), 'body ' || d,
       'm' || (d % 4) || ',t' || (d % 3)
FROM docs WHERE d % 25 = 0
"""

    sql["librarian_uploads"] = """
WITH ds AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 0),
sess AS (
  SELECT d, 'u' || d AS upload_id, 'w' || (d % 3) AS workspace,
         'doc' || d AS document_id,
         (7 + d % 9)::BIGINT AS total_size,
         (3 + d % 4)::BIGINT AS chunk_size,
         CAST(ceil((7 + d % 9)::DOUBLE / (3 + d % 4)) AS INT)
           AS total_chunks
  FROM ds
), idx AS (
  SELECT s.*, unnest(range(s.total_chunks))::INT AS i FROM sess s
), rec AS (
  SELECT upload_id, count(*)::INT AS n,
         string_agg('c' || d || ':' || i || ';', '' ORDER BY i)
           AS content
  FROM idx WHERE (d + i) % 11 <> 0 GROUP BY upload_id
), miss AS (
  SELECT upload_id, string_agg(i, ',' ORDER BY i) AS missing_csv
  FROM idx WHERE (d + i) % 11 = 0 GROUP BY upload_id
)
SELECT s.upload_id, s.workspace, s.document_id,
       coalesce(r.n, 0) = s.total_chunks AS complete,
       coalesce(m.missing_csv, '') AS missing_csv,
       CASE WHEN coalesce(r.n, 0) = s.total_chunks THEN r.content END
         AS content_str,
       s.d AS time, 'text/plain' AS kind, 'T' || (s.d % 7) AS title,
       '' AS comments, '' AS tags_csv
FROM sess s
LEFT JOIN rec r ON r.upload_id = s.upload_id
LEFT JOIN miss m ON m.upload_id = s.upload_id
"""

    sql["wire_embed_exec"] = """
WITH q AS (
  SELECT 'e' || vec_id AS req_id, embedding AS qv,
         CASE WHEN vec_id % 5 <> 0 THEN (1 + vec_id % 4) * 2
              ELSE 10 END AS lim
  FROM embeddings WHERE vec_id < 8
), scored AS (
  SELECT q.req_id, 'http://t/e/' || v.vec_id AS entity,
         list_cosine_similarity(v.embedding::DOUBLE[], q.qv::DOUBLE[])
           AS raw,
         q.lim
  FROM embeddings v, q
), ranked AS (
  SELECT req_id, entity, raw, lim, row_number() OVER (
    PARTITION BY req_id ORDER BY raw DESC, entity ASC) AS rank
  FROM scored
)
SELECT req_id, entity, round(raw, 4) AS score, rank::INT AS rank
FROM ranked WHERE rank <= lim
"""

    sql["extraction_hierarchy"] = """
WITH docs AS (SELECT doc_id AS d FROM documents),
pages AS (SELECT DISTINCT d % 10 AS pg FROM docs)
SELECT 0::INT AS depth, 'urn:doc:root' AS node_uri,
       NULL::VARCHAR AS parent_uri, 'document' AS node_type,
       NULL::VARCHAR AS label, 'Root Document' AS title,
       'text/plain' AS fmt
UNION ALL
SELECT 1::INT, 'urn:page:' || pg, 'urn:doc:root', 'page',
       'Page ' || pg, NULL, NULL FROM pages
UNION ALL
SELECT 2::INT, 'urn:chunk:' || d, 'urn:page:' || (d % 10), 'chunk',
       CASE WHEN d % 4 = 0 THEN 'Chunk ' || d END, NULL, NULL FROM docs
UNION ALL
SELECT 3::INT, '<<http://trustgraph.ai/e/e' || (d % 7)
         || ' https://trustgraph.ai/ns/rel val ' || (d % 5) || '>>',
       'urn:chunk:' || d, 'edge', NULL, NULL, NULL
FROM docs WHERE d % 3 = 0
UNION ALL
SELECT 3::INT, 'urn:misc:' || d, 'urn:chunk:' || d, 'unknown',
       NULL, NULL, NULL FROM docs WHERE d % 7 = 3
"""

    sql["kg_core_de_msgpack"] = """
SELECT 'doc-' || (doc_id % 5) AS id,
       'default' AS collection,
       'chunk-' || doc_id AS chunk_id,
       u.vec_idx, u.pos, u.value
FROM documents,
  LATERAL (
    SELECT 0 AS vec_idx, 0 AS pos, doc_id / 4.0 AS value
    UNION ALL SELECT 0, 1, -doc_id / 8.0
    UNION ALL SELECT 1, 0, (doc_id % 16) / 2.0
  ) u
"""

    def _jt(path):
        return (f"CASE WHEN json_extract_string(o, '$.{path}.type') = 'i' "
                f"THEN json_extract_string(o, '$.{path}.iri') "
                f"ELSE '\"' || json_extract_string(o, '$.{path}.value') "
                f"|| '\"' END")

    sql["cli_graph_query"] = f"""
WITH base AS (
  SELECT s, p, o, otype, '' AS dtype, '' AS lang
  FROM ({sql["explain_rag_emit"]})
  UNION ALL
  SELECT 'urn:trustgraph:question:s' || doc_id, '{_ns}note',
         'note ' || doc_id, 'l', '', 'en'
  FROM documents WHERE doc_id % 5 = 1
  UNION ALL
  SELECT 'urn:trustgraph:question:s' || doc_id, '{_ns}rank',
         (doc_id % 9)::VARCHAR, 'l', 'xsd:integer', ''
  FROM documents WHERE doc_id % 5 = 1
), fmt AS (
  SELECT s, p,
    CASE WHEN otype = 'u' THEN o
         WHEN otype = 't' THEN
           '<<' || {_jt('s')} || ' ' || {_jt('p')} || ' '
                || {_jt('o')} || '>>'
         ELSE '"' || o || '"'
              || CASE WHEN lang <> '' THEN '@' || lang
                      WHEN dtype <> '' THEN '^^' || dtype
                      ELSE '' END
    END AS o_fmt
  FROM base
)
SELECT s AS s_fmt, p AS p_fmt, o_fmt,
       s || ' ' || p || ' ' || o_fmt AS line
FROM fmt
"""

    sql["kg_mentions"] = _MENTIONS_CTE + "SELECT doc_id, entity FROM mentions"

    sql["kg_label_triples"] = _MENTIONS_CTE + (
        f"SELECT DISTINCT '{TG}' || entity AS s, '{RDF_LABEL}' AS p, "
        "entity AS o, 'l' AS otype FROM mentions"
    )

    sql["kg_cooccur_edges"] = _COOCCUR_CTE + "SELECT s, p, o, n_docs FROM cooccur"

    sql["kg_quads_by_entity"] = _COOCCUR_CTE + f"""
, quads AS (
  SELECT s, p, o FROM cooccur
  UNION ALL
  SELECT DISTINCT '{TG}' || entity AS s, '{RDF_LABEL}' AS p, entity AS o
  FROM mentions
)
SELECT s AS entity, 'S' AS role, s, p, o FROM quads
UNION ALL
SELECT p AS entity, 'P' AS role, s, p, o FROM quads
UNION ALL
SELECT o AS entity, 'O' AS role, s, p, o FROM quads
"""

    sql["kg_nodes_degree"] = _COOCCUR_CTE + f"""
, quads AS (
  SELECT s, p, o, 'u' AS otype FROM cooccur
  UNION ALL
  SELECT DISTINCT '{TG}' || entity AS s, '{RDF_LABEL}' AS p, entity AS o,
         'l' AS otype
  FROM mentions
), ents AS (
  SELECT s AS entity FROM quads
  UNION ALL
  SELECT o AS entity FROM quads WHERE otype = 'u'
), degree AS (
  SELECT entity, count(*)::BIGINT AS degree FROM ents GROUP BY entity
), labels AS (
  SELECT s AS entity, min(o) AS label FROM quads
  WHERE p = '{RDF_LABEL}' GROUP BY s
)
SELECT d.entity, l.label, d.degree
FROM degree d LEFT JOIN labels l USING (entity)
"""

    sql["kg_pattern_po"] = _COOCCUR_CTE + (
        f"SELECT s FROM cooccur WHERE p = '{CO_URI}' AND o = '{TG}spark'"
    )

    # --- extraction core (E2/E3/E11) + linking over planted sentences ------
    # to_uri parity: spaces -> hyphens, lower, percent-encode; the planted
    # character set is {ascii, é, ï, &} so the encoding is an explicit chain
    def _uri(expr: str) -> str:
        return (
            f"'{TG}' || replace(replace(replace("
            f"lower(replace({expr}, ' ', '-')), "
            "'é', '%C3%A9'), 'ï', '%C3%AF'), '&', '%26')"
        )

    SKOS_DEF = "http://www.w3.org/2004/02/skos/core#definition"
    _DEF_TXT = """
WITH txt AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN 'no facts in this chunk'
         ELSE (CASE WHEN doc_id % 7 = 0 THEN 'café ' || (doc_id % 97)
                    WHEN doc_id % 13 = 0 THEN 'r&d ' || (doc_id % 97)
                    ELSE 'term ' || (doc_id % 97) END)
              || ' is defined as concept from ' || source
              || ' sized ' || (n_chars % 10) || '.'
    END AS text
  FROM documents
), ext AS (
  SELECT doc_id,
    trim(regexp_extract(text, '([^.]+?) is defined as (.+?)\\.', 1)) AS entity,
    trim(regexp_extract(text, '([^.]+?) is defined as (.+?)\\.', 2)) AS definition
  FROM txt
  WHERE regexp_matches(text, '([^.]+?) is defined as (.+?)\\.')
)"""
    sql["kg_def_triples"] = _DEF_TXT + f"""
, u AS (SELECT *, {_uri('entity')} AS s_uri FROM ext)
SELECT s_uri AS s, '{RDF_LABEL}' AS p, entity AS o, 'l' AS otype FROM u
UNION ALL
SELECT s_uri, '{SKOS_DEF}', definition, 'l' FROM u
"""

    # NPS: non-label edges out of each entity = the definition edges
    sql["sparql_path_nps"] = _DEF_TXT + f"""
, u AS (SELECT *, {_uri('entity')} AS s_uri FROM ext)
SELECT s_uri AS s, definition AS o FROM u
"""

    sql["kg_entity_contexts"] = _DEF_TXT + f"""
, u AS (SELECT *, {_uri('entity')} AS entity_uri,
               'urn:chunk:' || doc_id AS chunk_id FROM ext)
SELECT 'default' AS collection, entity_uri, entity AS context, chunk_id FROM u
UNION ALL
SELECT 'default', entity_uri, definition, chunk_id FROM u
"""

    _REL_TXT = """
WITH txt AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN 'no facts in this chunk'
         ELSE ('proc ' || (doc_id % 53)) || ' '
              || (CASE WHEN doc_id % 3 = 0 THEN 'uses'
                       WHEN doc_id % 3 = 1 THEN 'contains'
                       ELSE 'extends' END) || ' '
              || (CASE WHEN doc_id % 5 = 0 THEN 'naïve ' ELSE 'unit ' END)
              || (doc_id % 31) || '. '
              || ('proc ' || (doc_id % 53)) || ' produces value '
              || (doc_id % 29) || '.'
    END AS text
  FROM documents
), rel AS (
  SELECT doc_id,
    trim(regexp_extract(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.', 1)) AS s_txt,
    trim(regexp_extract(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.', 2)) AS p_txt,
    trim(regexp_extract(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.', 3)) AS o_txt,
    trim(regexp_extract(text, '([^.]+?) produces value ([^.]+?)\\.', 1)) AS ls_txt,
    trim(regexp_extract(text, '([^.]+?) produces value ([^.]+?)\\.', 2)) AS lv_txt
  FROM txt
  WHERE regexp_matches(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.')
)"""
    sql["kg_rel_triples"] = _REL_TXT + f"""
, u AS (
  SELECT *, {_uri('s_txt')} AS s_uri, {_uri('p_txt')} AS p_uri,
         {_uri('o_txt')} AS o_uri, {_uri('ls_txt')} AS ls_uri,
         '{TG}produces-value' AS lp_uri
  FROM rel
)
SELECT s_uri AS s, p_uri AS p, o_uri AS o, 'u' AS otype FROM u
UNION ALL SELECT s_uri, '{RDF_LABEL}', s_txt, 'l' FROM u
UNION ALL SELECT p_uri, '{RDF_LABEL}', p_txt, 'l' FROM u
UNION ALL SELECT o_uri, '{RDF_LABEL}', o_txt, 'l' FROM u
UNION ALL SELECT ls_uri, lp_uri, lv_txt, 'l' FROM u
UNION ALL SELECT ls_uri, '{RDF_LABEL}', ls_txt, 'l' FROM u
UNION ALL SELECT lp_uri, '{RDF_LABEL}', 'produces value', 'l' FROM u
"""

    # E11 provenance: deterministic subgraph/activity hash URIs, byte-exact
    # json.dumps serialization (', '/': ' separators, ensure_ascii -> \\u00e9)
    TGNS = "https://trustgraph.ai/ns/"
    PROV = "http://www.w3.org/ns/prov#"
    RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    sql["kg_prov_triples"] = _DEF_TXT + f"""
, u AS (SELECT *, {_uri('entity')} AS s_uri,
               'urn:chunk:' || doc_id AS chunk_id FROM ext)
, content AS (
  SELECT chunk_id, s_uri AS s, '{RDF_LABEL}' AS p, entity AS o FROM u
  UNION ALL
  SELECT chunk_id, s_uri, '{SKOS_DEF}', definition FROM u
), keyed AS (
  SELECT *, sha256(chunk_id || ':kg-extract') AS h FROM content
), contains_rows AS (
  SELECT 'urn:graph:source' AS g,
         'https://trustgraph.ai/subgraph/' || h AS s,
         '{TGNS}contains' AS p,
         '{{"s": {{"type": "i", "iri": "' || s || '"}}, '
         || '"p": {{"type": "i", "iri": "' || p || '"}}, '
         || '"o": {{"type": "l", "value": "' || replace(o, 'é', '\\u00e9') || '"}}}}' AS o,
         't' AS otype
  FROM keyed
), chunks AS (
  SELECT DISTINCT chunk_id,
         'https://trustgraph.ai/subgraph/' || h AS sg,
         'https://trustgraph.ai/activity/' || h AS act
  FROM keyed
)
SELECT * FROM contains_rows
UNION ALL SELECT 'urn:graph:source', sg, '{RDF_TYPE}', '{PROV}Entity', 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', sg, '{RDF_TYPE}', '{TGNS}Subgraph', 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', sg, '{PROV}wasDerivedFrom', chunk_id, 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', sg, '{PROV}wasGeneratedBy', act, 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', act, '{RDF_TYPE}', '{PROV}Activity', 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', act, '{RDF_LABEL}', 'kg-extract extraction', 'l' FROM chunks
UNION ALL SELECT 'urn:graph:source', act, '{PROV}used', chunk_id, 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', act, '{PROV}wasAssociatedWith', 'https://trustgraph.ai/agent/kg-extract', 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', act, '{PROV}startedAtTime', '1970-01-01T00:00:00Z', 'l' FROM chunks
UNION ALL SELECT 'urn:graph:source', act, '{TGNS}componentVersion', '0.1.0', 'l' FROM chunks
UNION ALL SELECT 'urn:graph:source', 'https://trustgraph.ai/agent/kg-extract', '{RDF_TYPE}', '{PROV}Agent', 'u' FROM chunks
UNION ALL SELECT 'urn:graph:source', 'https://trustgraph.ai/agent/kg-extract', '{RDF_LABEL}', 'kg-extract', 'l' FROM chunks
"""

    # linking/CC: same trigram-Jaccard ('  s ' padding) on normalized labels,
    # all-pairs here because every planted label shares the 'p4:enti'
    # blocking key; components via recursive min-label propagation
    sql["kg_linking_cc"] = f"""
WITH RECURSIVE labs AS (
  SELECT DISTINCT
    CASE WHEN doc_id % 3 = 0
         THEN 'entity ' || (doc_id % 40) || 's'
         ELSE 'entity ' || (doc_id % 40) END AS label
  FROM documents
), m AS (
  SELECT '{TG}' || replace(label, ' ', '-') AS uri,
         replace(label, ' ', '-') AS norm
  FROM labs
), grams AS (
  SELECT uri, list_distinct(list_transform(
           range(1, length('  ' || norm || ' ') - 1),
           i -> ('  ' || norm || ' ')[i:i+2])) AS g
  FROM m
), pairs AS (
  SELECT a.uri AS ua, b.uri AS ub,
         len(list_intersect(a.g, b.g))::DOUBLE
           / (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) AS score
  FROM grams a JOIN grams b ON a.uri < b.uri
), bidir AS (
  SELECT ua AS u, ub AS v FROM pairs WHERE score >= 0.65
  UNION ALL
  SELECT ub, ua FROM pairs WHERE score >= 0.65
), reach(node, comp) AS (
  SELECT u, u FROM bidir
  UNION
  SELECT b.v, r.comp FROM reach r JOIN bidir b ON b.u = r.node
)
SELECT node AS uri, min(comp) AS canonical_uri
FROM reach GROUP BY node HAVING min(comp) <> node
"""

    sql["dedup_exact_groups"] = """
SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS text_hash,
       count(*)::BIGINT AS n_docs,
       min(doc_id) AS representative
FROM documents GROUP BY 1
"""

    sql["dedup_ngram_jaccard"] = _SHINGLES_CTE + """
, hot AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > 100)
, kept AS (SELECT * FROM sh ANTI JOIN hot USING (shingle))
, sizes AS (SELECT doc_id, count(*) AS sz FROM kept GROUP BY doc_id)
, inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
  FROM kept a JOIN kept b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(inter / (sa.sz + sb.sz - inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE inter / (sa.sz + sb.sz - inter) >= 0.3
"""

    band_exprs = ",\n    ".join(
        "array_to_string(sig[{start}:{end}], '|') AS band{i}".format(
            start=i * 4 + 1, end=i * 4 + 4, i=i
        )
        for i in range(4)
    )
    # the affine-family literals (dedup.minhash_coeffs) embedded verbatim;
    # base hash x = ('0x' || md5[:15])::BIGINT % P replays Spark's
    # conv(substr(md5, 1, 15), 16, 10) % P exactly (verified bit-equal)
    from trustgraph_spark.operators.dedup import MINHASH_PRIME, minhash_coeffs

    _mh_x = (f"('0x' || substr(md5(shingle), 1, 15))::BIGINT"
             f" % {MINHASH_PRIME}")
    hash_exprs = ", ".join(
        f"min(({a}::BIGINT * x + {b}) % {MINHASH_PRIME})"
        for a, b in minhash_coeffs(16)
    )
    _inc_sh = """
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, greatest(len(tk) - 2, 0) + 1),
                                 i -> array_to_string(tk[i:i+2], ' ')))
             AS shingle
    FROM {toks}
  )
"""
    sql["dedup_incremental"] = f"""
WITH newdocs AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 6 = 0 AND d.text IS NOT NULL THEN d.text
              ELSE b.text END AS text
  FROM documents b LEFT JOIN documents d ON d.doc_id = b.doc_id + 1
  WHERE b.doc_id % 3 = 0
), arch AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0
), toks_a AS (SELECT doc_id, {_NORM_TOKS} AS tk FROM arch),
toks_n AS (SELECT doc_id, {_NORM_TOKS} AS tk FROM newdocs),
sh_a AS ({_inc_sh.format(toks="toks_a")}),
sh_n AS ({_inc_sh.format(toks="toks_n")}),
sig_a AS (SELECT doc_id, [{hash_exprs}] AS sig
          FROM (SELECT doc_id, {_mh_x} AS x FROM sh_a) GROUP BY doc_id),
sig_n AS (SELECT doc_id, [{hash_exprs}] AS sig
          FROM (SELECT doc_id, {_mh_x} AS x FROM sh_n) GROUP BY doc_id),
banded_a AS (
  SELECT doc_id, band, band_sig FROM (
    SELECT doc_id, {band_exprs} FROM sig_a
  ) UNPIVOT (band_sig FOR band IN (band0, band1, band2, band3))
),
banded_n AS (
  SELECT doc_id, band, band_sig FROM (
    SELECT doc_id, {band_exprs} FROM sig_n
  ) UNPIVOT (band_sig FOR band IN (band0, band1, band2, band3))
)
SELECT DISTINCT n.doc_id AS new_id, a.doc_id AS match_id,
       'archive' AS source
FROM banded_n n JOIN banded_a a USING (band, band_sig)
UNION ALL
SELECT DISTINCT x.doc_id, y.doc_id, 'batch'
FROM banded_n x JOIN banded_n y USING (band, band_sig)
WHERE x.doc_id < y.doc_id
"""

    sql["dedup_minhash_lsh"] = _SHINGLES_CTE + f"""
, sig AS (
  SELECT doc_id, [{hash_exprs}] AS sig
  FROM (SELECT doc_id, {_mh_x} AS x FROM sh) GROUP BY doc_id
), banded AS (
  SELECT doc_id, band, band_sig FROM (
    SELECT doc_id, {band_exprs} FROM sig
  ) UNPIVOT (band_sig FOR band IN (band0, band1, band2, band3))
)
SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
FROM banded a JOIN banded b USING (band, band_sig)
WHERE a.doc_id < b.doc_id
"""

    sql["doc_fingerprint"] = f"""
SELECT doc_id,
       md5(array_to_string(list_sort(list_distinct({_NORM_TOKS})), ' ')) AS fingerprint
FROM documents
"""

    sql["token_count"] = f"""
SELECT doc_id,
       len({_NORM_TOKS})::BIGINT AS n_tokens_ws,
       len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]'))::BIGINT
         AS n_tokens_bpeish,
       length(text)::BIGINT AS n_chars
FROM documents
"""

    stop_list = ", ".join(
        f"'{w}'"
        for w in [
            "the", "and", "of", "to", "is", "in", "that", "it", "for", "was",
            "a", "an", "on", "at", "by", "with", "as", "be",
        ]
    )
    sql["quality_score"] = f"""
WITH t AS (SELECT doc_id, text, {_NORM_TOKS} AS tk FROM documents)
SELECT doc_id,
       length(text)::BIGINT AS n_chars,
       len(tk)::BIGINT AS n_tokens,
       round(CASE WHEN len(tk) > 0
         THEN list_sum(list_transform(tk, x -> length(x)))::DOUBLE / len(tk)
         ELSE 0.0 END, 4) AS mean_token_len,
       round(CASE WHEN len(tk) > 0
         THEN len(list_filter(tk, x -> x IN ({stop_list})))::DOUBLE / len(tk)
         ELSE 0.0 END, 4) AS stopword_ratio,
       round(CASE WHEN length(text) > 0
         THEN (length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')))::DOUBLE
              / length(text) ELSE 0.0 END, 4) AS punct_ratio,
       round(CASE WHEN length(text) > 0
         THEN (length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')))::DOUBLE
              / length(text) ELSE 0.0 END, 4) AS alpha_ratio
FROM t
"""

    lang_markers = {
        "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
        "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
        "es": ["el", "la", "los", "y", "es", "en", "que", "por", "una", "para"],
        "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"],
    }
    hit_defs = ",\n  ".join(
        "len(list_filter(tk, x -> x IN ({lst}))) AS h_{lang}".format(
            lst=", ".join(f"'{w}'" for w in ws), lang=lang
        )
        for lang, ws in lang_markers.items()
    )
    langs = sorted(lang_markers)
    cases = []
    for lang in langs:
        conds = [f"h_{lang} > 0"]
        for other in langs:
            if other == lang:
                continue
            op = ">" if other < lang else ">="
            conds.append(f"h_{lang} {op} h_{other}")
        cases.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " ELSE 'und' END"
    sql["language_id"] = f"""
WITH t AS (SELECT doc_id, text, {_NORM_TOKS} AS tk FROM documents),
h AS (SELECT doc_id, text,
  {hit_defs}
FROM t)
SELECT doc_id,
  CASE WHEN length(regexp_replace(text, '[^一-鿿]', '', 'g')) * 2 > length(text)
       THEN 'zh' ELSE {case_sql} END AS lang_pred
FROM h
"""

    sql["ann_cosine_topk"] = """
WITH q AS (
  SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT q.query_id, v.vec_id AS neighbor_id,
         list_cosine_similarity(v.embedding::DOUBLE[], q.qv::DOUBLE[]) AS raw
  FROM embeddings v, q
)
SELECT query_id, neighbor_id, round(raw, 4) AS score
FROM scored
QUALIFY row_number() OVER (
  PARTITION BY query_id ORDER BY raw DESC, neighbor_id ASC) <= 5
"""

    sql["events_sessionize"] = """
WITH o AS (
  SELECT user_id, ts, value, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR floor(epoch(ts))::BIGINT - floor(epoch(lag(ts) OVER w))::BIGINT > 1800
              THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, ts, value,
         sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM o
)
SELECT user_id, session_idx::BIGINT AS session_idx,
       count(*)::BIGINT AS n_events,
       floor(epoch(min(ts)))::BIGINT AS session_start,
       round(sum(value), 2) AS total_value
FROM s GROUP BY user_id, session_idx
"""

    sql["events_window_agg"] = """
SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS hour_start, event_type,
       count(*)::BIGINT AS n, round(sum(value), 2) AS total_value
FROM events GROUP BY 1, 2
"""

    sql["kg_bgp_two_hop"] = _COOCCUR_CTE + (
        "SELECT a.s AS x, a.o AS y, b.o AS z "
        "FROM cooccur a JOIN cooccur b ON a.o = b.s"
    )

    sql["sparql_two_hop"] = _COOCCUR_CTE + (
        "SELECT a.s AS x, b.o AS z "
        "FROM cooccur a JOIN cooccur b ON a.o = b.s WHERE a.s <> b.o"
    )

    sql["sparql_subquery"] = _COOCCUR_CTE + (
        "SELECT s AS x, count(*)::BIGINT AS n FROM cooccur "
        "GROUP BY s HAVING count(*) > 3"
    )

    sql["sparql_group_count"] = _COOCCUR_CTE + (
        "SELECT s AS x, count(*)::BIGINT AS n FROM cooccur GROUP BY s"
    )

    # simhash16: per-token md5 nibble bits, +1/-1 weighted sums, sign bits
    nib = lambda i: (
        f"(strpos('0123456789abcdef', substring(h, {i // 4 + 1}, 1)) - 1)"
    )
    bit_sums = ",\n  ".join(
        f"sum(CASE WHEN ({nib(i)} >> {i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(16)
    )
    fp = " + ".join(f"CASE WHEN b{i} > 0 THEN {2**i} ELSE 0 END" for i in range(16))
    sql["simhash16"] = f"""
WITH toks AS (
  SELECT doc_id, unnest({_NORM_TOKS}) AS tok FROM documents
), hs AS (
  SELECT doc_id, md5(tok) AS h FROM toks WHERE tok <> ''
), sums AS (
  SELECT doc_id,
  {bit_sums}
  FROM hs GROUP BY doc_id
)
SELECT doc_id, ({fp})::BIGINT AS simhash FROM sums
"""

    mh = ", ".join(
        f"min(({a}::BIGINT * x + {b}) % {MINHASH_PRIME}) AS h{i}"
        for i, (a, b) in enumerate(minhash_coeffs(4))
    )
    sql["minhash_sig4"] = _SHINGLES_CTE + (
        f"SELECT doc_id, {mh} "
        f"FROM (SELECT doc_id, {_mh_x} AS x FROM sh) GROUP BY doc_id"
    )

    sql["revenue_by_nation"] = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*)::BIGINT AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""

    sql["top_parts_by_size"] = """
SELECT p_size, p_partkey, p_retailprice,
       row_number() OVER (PARTITION BY p_size
                          ORDER BY p_retailprice DESC, p_partkey ASC)::BIGINT AS rn
FROM part
QUALIFY rn <= 3
"""

    sql["pricing_summary"] = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       count(*)::BIGINT AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""

    # --- S2/S3 chunkers -----------------------------------------------------
    sql["chunk_recursive"] = """
WITH t AS (SELECT doc_id, text, length(text) AS len FROM documents),
x AS (SELECT doc_id, text, len,
             unnest(range(0, greatest(len - 1, 0) + 1, 100)) AS off FROM t),
offs AS (
  SELECT doc_id, text, off,
         row_number() OVER (PARTITION BY doc_id ORDER BY off) - 1 AS ci
  FROM x WHERE len > 0 AND (off = 0 OR off + 20 < len)
)
SELECT 'urn:chunk:' || sha256(doc_id::VARCHAR || ':' || ci::VARCHAR) AS chunk_id,
       doc_id AS root_id, ci::BIGINT AS chunk_index,
       substr(text, off + 1, 120) AS text
FROM offs
"""

    sql["chunk_token"] = """
WITH t AS (SELECT doc_id, string_split_regex(text, '\\s+') AS tk,
                  length(trim(text)) AS tl FROM documents),
x AS (SELECT doc_id, tk, tl, len(tk) AS ntok,
             unnest(range(0, greatest(len(tk) - 1, 0) + 1, 35)) AS off FROM t),
offs AS (
  SELECT doc_id, tk, off,
         row_number() OVER (PARTITION BY doc_id ORDER BY off) - 1 AS ci
  FROM x WHERE tl > 0 AND (off = 0 OR off + 5 < ntok)
)
SELECT 'urn:chunk:' || sha256(doc_id::VARCHAR || ':' || ci::VARCHAR) AS chunk_id,
       doc_id AS root_id, ci::BIGINT AS chunk_index,
       array_to_string(tk[off + 1 : off + 40], ' ') AS text
FROM offs
"""

    # --- G3/G4: 2-hop BFS + label resolution --------------------------------
    seed = TG + "spark"
    sql["graphrag_hop2"] = _COOCCUR_CTE + f"""
, trav AS (SELECT s, p, o, 'u' AS otype FROM cooccur)
, labs AS (SELECT DISTINCT '{TG}' || entity AS entity, entity AS label
           FROM mentions)
, h1raw AS (SELECT DISTINCT * FROM trav WHERE s = '{seed}' OR o = '{seed}')
, h1 AS (SELECT s, p, o, otype FROM (
    SELECT *, row_number() OVER (PARTITION BY s ORDER BY p, o) AS rn FROM h1raw
  ) WHERE rn <= 30)
, f2 AS (
  SELECT node FROM (
    SELECT o AS node FROM h1 WHERE o LIKE 'http%'
    UNION SELECT s FROM h1
  ) WHERE node <> '{seed}'
)
, h2raw AS (
  SELECT DISTINCT t.* FROM trav t
  WHERE (t.s IN (SELECT node FROM f2) OR t.o IN (SELECT node FROM f2))
    AND NOT EXISTS (SELECT 1 FROM h1
                    WHERE h1.s = t.s AND h1.p = t.p AND h1.o = t.o)
)
, h2 AS (SELECT s, p, o, otype FROM (
    SELECT *, row_number() OVER (PARTITION BY s ORDER BY p, o) AS rn FROM h2raw
  ) WHERE rn <= 30)
, sel AS (SELECT *, 1 AS hop FROM h1 UNION ALL SELECT *, 2 FROM h2)
SELECT sel.s, sel.p, sel.o, hop::BIGINT AS hop,
       ls.label AS s_label, lo.label AS o_label
FROM sel
LEFT JOIN labs ls ON ls.entity = sel.s
LEFT JOIN labs lo ON lo.entity = sel.o
"""

    # --- SPARQL algebra forms through the string front-end ------------------
    sql["sparql_optional"] = _COOCCUR_CTE + (
        "SELECT a.s AS x, a.o AS y, b.o AS z "
        "FROM cooccur a LEFT JOIN cooccur b ON a.o = b.s"
    )

    sql["sparql_union_bind"] = _COOCCUR_CTE + (
        f"SELECT o AS a, 'fwd' AS dir FROM cooccur WHERE s = '{seed}' "
        f"UNION ALL SELECT s, 'rev' FROM cooccur WHERE o = '{seed}'"
    )

    sql["sparql_minus_values"] = _COOCCUR_CTE + f"""
SELECT s AS x, o AS y FROM cooccur
WHERE s IN ('{TG}hash', '{TG}join', '{TG}spark')
  AND s <> '{TG}spark'
"""

    sql["sparql_builtins"] = _MENTIONS_CTE + f"""
, lab AS (SELECT DISTINCT entity AS o, '{TG}' || entity AS x FROM mentions)
SELECT o,
  CASE WHEN strpos(x, '/e/') > 0
       THEN substr(x, strpos(x, '/e/') + 3) ELSE '' END AS name,
  length(o)::BIGINT AS n,
  upper(o) AS up,
  CASE WHEN contains(o, 'a')
       THEN substr(o, 1, strpos(o, 'a') - 1) ELSE '-' END AS pre
FROM lab
"""

    sql["sparql_having_ask"] = _COOCCUR_CTE + """
SELECT s AS x, count(*)::BIGINT AS n FROM cooccur
GROUP BY s HAVING count(*) >= 3
UNION ALL SELECT 'ask:true', -1
UNION ALL SELECT 'ask:false', -1
"""

    sql["sparql_construct"] = _COOCCUR_CTE + f"""
, hop2 AS (SELECT a.s AS x, b.o AS z FROM cooccur a JOIN cooccur b ON a.o = b.s)
SELECT DISTINCT * FROM (
  SELECT x AS s, '{TG}linked2' AS p, z AS o, 'u' AS otype,
         '' AS dtype, '' AS lang FROM hop2
  UNION ALL
  SELECT DISTINCT x, '{RDF_LABEL}', 'hub', 'l', '', '' FROM hop2
)
"""

    sql["sparql_describe"] = _COOCCUR_CTE + f"""
, quads AS (
  SELECT s, p, o, 'u' AS otype FROM cooccur
  UNION ALL
  SELECT DISTINCT '{TG}' || entity, '{RDF_LABEL}', entity, 'l' FROM mentions
), res AS (SELECT '{TG}spark' AS uri UNION SELECT '{TG}hash')
SELECT DISTINCT s, p, o, otype, '' AS dtype, '' AS lang FROM quads
WHERE s IN (SELECT uri FROM res)
   OR (otype = 'u' AND o IN (SELECT uri FROM res))
"""

    # --- E4: agent combined flow (quote-only URI dialect) -------------------
    def _uri_agent(expr: str) -> str:
        return (
            f"'{TG}' || replace(replace(replace(replace({expr}, "
            "' ', '%20'), 'é', '%C3%A9'), 'ï', '%C3%AF'), '&', '%26')"
        )

    sql["agent_triples"] = f"""
WITH dtxt AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN 'no facts in this chunk'
         ELSE (CASE WHEN doc_id % 7 = 0 THEN 'café ' || (doc_id % 97)
                    WHEN doc_id % 13 = 0 THEN 'r&d ' || (doc_id % 97)
                    ELSE 'term ' || (doc_id % 97) END)
              || ' is defined as concept from ' || source
              || ' sized ' || (n_chars % 10) || '.'
    END AS text
  FROM documents
), dext AS (
  SELECT doc_id,
    trim(regexp_extract(text, '([^.]+?) is defined as (.+?)\\.', 1)) AS entity,
    trim(regexp_extract(text, '([^.]+?) is defined as (.+?)\\.', 2)) AS definition
  FROM dtxt
  WHERE regexp_matches(text, '([^.]+?) is defined as (.+?)\\.')
), du AS (SELECT *, {_uri_agent('entity')} AS s_uri FROM dext),
rtxt AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN 'no facts in this chunk'
         ELSE ('proc ' || (doc_id % 53)) || ' '
              || (CASE WHEN doc_id % 3 = 0 THEN 'uses'
                       WHEN doc_id % 3 = 1 THEN 'contains'
                       ELSE 'extends' END) || ' '
              || (CASE WHEN doc_id % 5 = 0 THEN 'naïve ' ELSE 'unit ' END)
              || (doc_id % 31) || '. '
              || ('proc ' || (doc_id % 53)) || ' produces value '
              || (doc_id % 29) || '.'
    END AS text
  FROM documents
), rext AS (
  SELECT doc_id,
    trim(regexp_extract(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.', 1)) AS s_txt,
    trim(regexp_extract(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.', 2)) AS p_txt,
    trim(regexp_extract(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.', 3)) AS o_txt,
    trim(regexp_extract(text, '([^.]+?) produces value ([^.]+?)\\.', 1)) AS ls_txt,
    trim(regexp_extract(text, '([^.]+?) produces value ([^.]+?)\\.', 2)) AS lv_txt
  FROM rtxt
  WHERE regexp_matches(text, '([^.]+?) (uses|contains|extends) ([^.]+?)\\.')
), ru AS (
  SELECT *, {_uri_agent('s_txt')} AS s_uri, {_uri_agent('p_txt')} AS p_uri,
         {_uri_agent('o_txt')} AS o_uri, {_uri_agent('ls_txt')} AS ls_uri,
         '{TG}produces%20value' AS lp_uri
  FROM rext
)
SELECT s_uri AS s, '{RDF_LABEL}' AS p, entity AS o, 'l' AS otype FROM du
UNION ALL SELECT s_uri, '{SKOS_DEF}', definition, 'l' FROM du
UNION ALL SELECT s_uri, p_uri, o_uri, 'u' FROM ru
UNION ALL SELECT s_uri, '{RDF_LABEL}', s_txt, 'l' FROM ru
UNION ALL SELECT p_uri, '{RDF_LABEL}', p_txt, 'l' FROM ru
UNION ALL SELECT o_uri, '{RDF_LABEL}', o_txt, 'l' FROM ru
UNION ALL SELECT ls_uri, lp_uri, lv_txt, 'l' FROM ru
UNION ALL SELECT ls_uri, '{RDF_LABEL}', ls_txt, 'l' FROM ru
UNION ALL SELECT lp_uri, '{RDF_LABEL}', 'produces value', 'l' FROM ru
"""

    # --- E7: topics ----------------------------------------------------------
    sql["topic_triples"] = f"""
WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 11 = 0 THEN NULL
         ELSE 'topic ' || (doc_id % 17) END AS topic,
    CASE WHEN doc_id % 13 = 0 THEN ''
         ELSE 'about ' || source END AS definition
  FROM documents
), v AS (
  SELECT * FROM t
  WHERE topic IS NOT NULL AND topic <> ''
    AND definition IS NOT NULL AND definition <> ''
), u AS (SELECT *, {_uri('topic')} AS t_uri FROM v)
SELECT t_uri AS s, '{RDF_LABEL}' AS p, topic AS o, 'l' AS otype FROM u
UNION ALL SELECT t_uri, '{SKOS_DEF}', definition, 'l' FROM u
"""

    # --- E8: row validation --------------------------------------------------
    sql["rows_validate"] = """
WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 9 = 0 THEN ''
         ELSE 'item ' || (doc_id % 50) END AS name,
    CASE WHEN doc_id % 4 = 0 THEN 'x'
         WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS city,
    (doc_id % 90)::VARCHAR AS age
  FROM documents
)
SELECT doc_id, name, city, age,
       (name IS NOT NULL AND name <> ''
        AND (city IS NULL OR city IN ('a', 'b'))) AS valid
FROM t
"""

    # A14: derivation edges live only in the named provenance graph
    sql["sparql_graph_clause"] = _DEF_TXT + """
, u AS (SELECT *, 'urn:chunk:' || doc_id AS chunk_id FROM ext)
, k AS (SELECT DISTINCT chunk_id, sha256(chunk_id || ':kg-extract') AS h FROM u)
SELECT 'https://trustgraph.ai/subgraph/' || h AS sg, chunk_id AS chunk FROM k
"""

    # GRAPH ?g: same derivation edges, with the named-graph IRI bound
    sql["sparql_graph_var"] = _DEF_TXT + """
, u AS (SELECT *, 'urn:chunk:' || doc_id AS chunk_id FROM ext)
, k AS (SELECT DISTINCT chunk_id, sha256(chunk_id || ':kg-extract') AS h FROM u)
SELECT 'urn:graph:source' AS g,
       'https://trustgraph.ai/subgraph/' || h AS sg, chunk_id AS chunk
FROM k
"""

    # V1/V2: crc32 recomputed in SQL with a table-driven fold (bit-exact
    # vs zlib.crc32); bucket = crc32 % 64 (+1 for 1-based array_position)
    _crc_tbl = []
    for _i in range(256):
        _c = _i
        for _ in range(8):
            _c = (_c >> 1) ^ 0xEDB88320 if _c & 1 else _c >> 1
        _crc_tbl.append(_c)
    crc_tbl_sql = "[" + ", ".join(str(x) for x in _crc_tbl) + "]"
    sql["text_embed_bucket"] = f"""
WITH crc AS (SELECT {crc_tbl_sql}::BIGINT[] AS tbl),
t AS (SELECT doc_id, 'tok' || (doc_id % 250) AS context FROM documents),
h AS (
  SELECT doc_id, context,
    xor(
      list_reduce(
        list_prepend(4294967295::BIGINT,
          list_transform(range(1, length(context) + 1),
                         i -> ord(substr(context, i, 1)))),
        (acc, b) -> xor(acc >> 8, tbl[(xor(acc, b) & 255) + 1])
      ),
      4294967295::BIGINT
    ) AS c32
  FROM t, crc
)
SELECT doc_id, context, (c32 % 64 + 1)::BIGINT AS bucket1, 1.0 AS vmax FROM h
"""

    # E5: each chunk selects exactly its matching element at cosine 1.0
    sql["onto_select"] = """
SELECT 'urn:chunk:' || doc_id AS chunk_id, 'kb' AS ontology_id,
       'class' AS element_type, 'onto' || (doc_id % 6) AS element_id,
       1.0 AS score
FROM documents
"""

    # E9: the two surviving objects per doc, canonically re-serialized
    sql["jsonl_parse"] = """
SELECT doc_id, '{"a": "x ' || (doc_id % 50) || '", "b": 1}' AS obj
FROM documents
UNION ALL
SELECT doc_id, '{"name": "t ' || (doc_id % 50) || '", "type": "topic"}'
FROM documents
"""

    # Q3: heuristic truth table replicated directly
    sql["term_reconstruct"] = """
SELECT doc_id,
  CASE WHEN doc_id % 5 = 0 THEN 'i'
       WHEN doc_id % 5 = 1 THEN 'l'
       WHEN doc_id % 5 = 2 THEN 't'
       WHEN doc_id % 5 = 3 THEN 'i'   -- null otype + https:// -> IRI
       ELSE 'l' END AS ttype,
  CASE WHEN doc_id % 5 = 0 THEN 'http://e/x' || doc_id
       WHEN doc_id % 5 = 1 THEN 'plain text ' || doc_id
       WHEN doc_id % 5 = 2 THEN '{"s": {}}'
       WHEN doc_id % 5 = 3 THEN 'https://bare/' || doc_id
       ELSE 'not a uri ' || doc_id END AS tvalue,
  CASE WHEN doc_id % 5 = 1 THEN 'en' ELSE '' END AS tlang
FROM documents
"""

    # V2/S6: same crc32 bucket check through the graph-embeddings mapper
    sql["graph_embed_map"] = f"""
WITH crc AS (SELECT {crc_tbl_sql}::BIGINT[] AS tbl),
t AS (SELECT doc_id, 'ctx' || (doc_id % 250) AS context FROM documents),
h AS (
  SELECT doc_id, context,
    xor(
      list_reduce(
        list_prepend(4294967295::BIGINT,
          list_transform(range(1, length(context) + 1),
                         i -> ord(substr(context, i, 1)))),
        (acc, b) -> xor(acc >> 8, tbl[(xor(acc, b) & 255) + 1])
      ),
      4294967295::BIGINT
    ) AS c32
  FROM t, crc
)
SELECT 'default' AS collection, '{TG}e' || doc_id AS entity_uri,
       'urn:chunk:' || doc_id AS chunk_id, (c32 % 64 + 1)::BIGINT AS bucket1
FROM h
"""

    # E6: the exact normalize chain, same regexes (RE2 Unicode classes)
    sql["entity_normalize"] = """
WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 4 = 0 THEN '  My_Entity  ' || doc_id
         WHEN doc_id % 4 = 1 THEN 'café!! ' || doc_id || ' (beta)'
         WHEN doc_id % 4 = 2 THEN '--Spaced---name-' || doc_id || '--'
         ELSE 'v1.2_of ' || doc_id END AS raw
  FROM documents
)
SELECT doc_id, raw,
  regexp_replace(
    regexp_replace(
      regexp_replace(
        regexp_replace(lower(raw), '[\\s_]+', '-', 'g'),
        '[^\\p{L}\\p{N}_\\-.]', '', 'g'),
      '^-+|-+$', '', 'g'),
    '-+', '-', 'g') AS normalized
FROM t
"""

    # G7: retrieval PROV envelope — deterministic retrieval URI + RDF-star
    # selectedEdge rows, byte-exact JSON
    sql["retrieval_prov"] = _COOCCUR_CTE + f"""
, sel AS (SELECT s, p, o FROM cooccur WHERE s = '{TG}spark')
, r AS (SELECT 'urn:trustgraph:retrieval:' || sha256('q1') AS ret)
SELECT 'urn:graph:retrieval' AS g, r.ret AS s,
       'https://trustgraph.ai/ns/selectedEdge' AS p,
       '{{"s": {{"type": "i", "iri": "' || sel.s || '"}}, '
       || '"p": {{"type": "i", "iri": "' || sel.p || '"}}, '
       || '"o": {{"type": "i", "iri": "' || sel.o || '"}}}}' AS o,
       't' AS otype
FROM sel, r
UNION ALL
SELECT 'urn:graph:retrieval', ret, '{RDF_TYPE}',
       'http://www.w3.org/ns/prov#Entity', 'u'
FROM r
"""

    # G5: the chunks whose planted definition sentence carries 'term 1'
    # (doc_id % 97 == 1, not an empty/café/r&d row); hop 0 = their
    # deterministic subgraph URIs, hop 1 = the chunks they derive from
    sql["prov_trace"] = """
WITH hits AS (
  SELECT 'urn:chunk:' || doc_id AS chunk_id
  FROM documents
  WHERE doc_id % 11 <> 0 AND doc_id % 7 <> 0 AND doc_id % 13 <> 0
    AND doc_id % 97 = 1
), k AS (SELECT chunk_id, sha256(chunk_id || ':kg-extract') AS h FROM hits)
SELECT 0::BIGINT AS hop, 'https://trustgraph.ai/subgraph/' || h AS node FROM k
UNION ALL
SELECT 1::BIGINT, chunk_id FROM k
"""

    # multimodal feature stub: byte j of sha256(payload) as an integer;
    # hex pairs decoded with the same nibble trick as simhash16
    def _hexbyte(col: str, j: int) -> str:
        p = 2 * j + 1
        return (
            f"((strpos('0123456789abcdef', substr({col}, {p}, 1)) - 1) * 16"
            f" + strpos('0123456789abcdef', substr({col}, {p + 1}, 1)) - 1)"
        )

    media_cols = ",\n  ".join(
        f"{_hexbyte('hx', j)}::BIGINT AS b{j}" for j in range(16)
    )
    sql["media_features"] = f"""
WITH m AS (
  SELECT 'm' || i AS media_id,
         CASE i % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
         repeat(sha256('media-' || i), 4) AS payload
  FROM range(48) t(i)
), d AS (SELECT media_id, kind, sha256(payload) AS hx FROM m)
SELECT media_id, kind,
  {media_cols}
FROM d
"""

    # S7/M3: the colb slice is exactly the doc_id%3 rows (labels ending 's')
    sql["kg_core_roundtrip"] = f"""
WITH m AS (
  SELECT CASE WHEN doc_id % 3 = 0
              THEN 'entity ' || (doc_id % 40) || 's'
              ELSE 'entity ' || (doc_id % 40) END AS label
  FROM documents
)
SELECT 'default' AS collection, '{TG}' || replace(label, ' ', '-') AS s,
       '{RDF_LABEL}' AS p, label AS o, 'l' AS otype
FROM m WHERE label NOT LIKE '%s'
"""

    # S9: the full two-collection planted set, read back exactly
    sql["warehouse_roundtrip"] = f"""
WITH m AS (
  SELECT CASE WHEN doc_id % 3 = 0
              THEN 'entity ' || (doc_id % 40) || 's'
              ELSE 'entity ' || (doc_id % 40) END AS label
  FROM documents
)
SELECT CASE WHEN label LIKE '%s' THEN 'colb' ELSE 'default' END AS collection,
       '{TG}' || replace(label, ' ', '-') AS s,
       '{RDF_LABEL}' AS p, label AS o, 'l' AS otype
FROM m
"""

    sql["collections_admin"] = """
SELECT 'default' AS collection, count(*)::BIGINT AS n
FROM documents WHERE doc_id % 3 <> 0
"""

    sql["rerank_topk"] = """
WITH q AS (
  SELECT 'q1' AS qid, 'spark window hash table' AS query
  UNION ALL SELECT 'q2', 'stream filter vector scan'
), cand AS (SELECT doc_id, text, qid, query FROM documents, q),
capped AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query ORDER BY text) AS rn
    FROM cand
  ) WHERE rn <= 350
), toks AS (
  SELECT qid, doc_id, text,
    list_distinct(list_filter(string_split_regex(lower(query), '\\s+'),
                              x -> x <> '')) AS qt,
    list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tt
  FROM capped
), scored AS (
  SELECT qid, doc_id, text,
    CASE WHEN len(qt) = 0 OR len(tt) = 0 THEN 0.0
         ELSE len(list_intersect(qt, tt))::DOUBLE
              / (len(qt) + len(tt) - len(list_intersect(qt, tt)))
    END AS score
  FROM toks
)
SELECT qid, doc_id, round(score, 6) AS score,
       row_number() OVER (PARTITION BY qid ORDER BY score DESC, text ASC)::BIGINT AS rank
FROM scored
QUALIFY rank <= 25
"""

    # --- embedding near-dup (hyperplane buckets inlined from the same seed) --
    from trustgraph_spark.operators.embeddings import random_hyperplanes

    planes = random_hyperplanes(64, 8)

    def _dot(p: list[float]) -> str:
        lits = ", ".join(repr(float(x)) for x in p)
        return f"list_dot_product(v, [{lits}])"

    sig = " || ".join(
        f"CASE WHEN {_dot(p)} >= 0 THEN '1' ELSE '0' END" for p in planes
    )
    sql["emb_near_dup"] = f"""
WITH base AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
  UNION ALL
  SELECT vec_id + 10000, list_transform(embedding::DOUBLE[], x -> x + 0.01)
  FROM embeddings WHERE vec_id % 5 = 0
), sigged AS (SELECT vec_id, v, {sig} AS bucket FROM base),
pairs AS (
  SELECT l.vec_id AS id_a, r.vec_id AS id_b,
         list_cosine_similarity(l.v, r.v) AS cos
  FROM sigged l JOIN sigged r USING (bucket)
  WHERE l.vec_id < r.vec_id
)
SELECT id_a, id_b FROM pairs WHERE cos >= 0.95
"""

    # DocumentRAG + rerank: dense pool (fetch 15 -> per-concept 7,
    # first-seen dedup), token-Jaccard rerank, top-5 per query
    sql["doc_rag_rerank"] = """
WITH store AS (SELECT 'c' || vec_id AS chunk_id, embedding AS vector FROM embeddings),
chunks AS (SELECT 'c' || doc_id AS chunk_id, text FROM documents),
qdef AS (
  SELECT * FROM (VALUES ('q0', 'spark window hash table'),
                        ('q1', 'stream filter vector scan'),
                        ('q2', 'merge join batch query'),
                        ('q3', 'table scan filter window'),
                        ('q4', 'vector query stream hash')) AS v(query_id, query)
), cv AS (
  SELECT 'q' || (vec_id // 2) AS query_id, (vec_id % 2)::INT AS concept_idx,
         embedding AS qv
  FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT cv.query_id, cv.concept_idx, s.chunk_id,
         list_cosine_similarity(s.vector::DOUBLE[], cv.qv::DOUBLE[]) AS raw
  FROM store s, cv
), perc AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, concept_idx
                                 ORDER BY raw DESC, chunk_id ASC) AS crank
    FROM scored) WHERE crank <= 7
), dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, chunk_id
                                 ORDER BY concept_idx, crank) AS rn
    FROM perc) WHERE rn = 1
), cand AS (
  SELECT d.query_id, d.chunk_id, c.text, q.query
  FROM dedup d JOIN chunks c USING (chunk_id) JOIN qdef q USING (query_id)
), toks AS (
  SELECT query_id, chunk_id,
    list_distinct(list_filter(string_split_regex(lower(query), '\\s+'),
                              x -> x <> '')) AS qt,
    list_distinct(list_filter(string_split_regex(lower(text), '\\s+'),
                              x -> x <> '')) AS tt
  FROM cand
), rs AS (
  SELECT query_id, chunk_id,
    CASE WHEN len(qt) = 0 OR len(tt) = 0 THEN 0.0
         ELSE len(list_intersect(qt, tt))::DOUBLE
              / (len(qt) + len(tt) - len(list_intersect(qt, tt)))
    END AS score
  FROM toks
)
SELECT query_id, chunk_id, round(score, 6) AS score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, chunk_id ASC)::BIGINT AS final_rank
FROM rs
QUALIFY final_rank <= 5
"""

    # structured-diag type detection: the shipped prefix heuristic
    sql["diag_detect_type"] = """
WITH planted AS (
  SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN '{' || text
         WHEN doc_id % 5 = 1 THEN '<?xml version="1.0"?>' || text
         WHEN doc_id % 5 = 2 THEN '<a>' || text || '</a>'
         WHEN doc_id % 5 = 3 THEN '   '
         ELSE text END AS text
  FROM documents
), t AS (SELECT doc_id, trim(text) AS s FROM planted)
SELECT doc_id,
  CASE WHEN s = '' THEN NULL
       WHEN s LIKE '<?xml%' OR (s LIKE '<%' AND contains(s, '</')) THEN 'xml'
       WHEN s LIKE '{%' OR s LIKE '[%' THEN 'json'
       ELSE 'csv' END AS detected_type,
  CASE WHEN s = '' THEN 0.0
       WHEN s LIKE '<?xml%' OR (s LIKE '<%' AND contains(s, '</')) THEN 0.9
       WHEN s LIKE '{%' OR s LIKE '[%' THEN 0.9
       ELSE 0.8 END AS confidence
FROM t
"""

    # rows store/query: planted rows -> per-index layout with PK upsert
    # (index 'city' keys on (city, name); last write = max doc_id), then
    # the city='a' partition with numeric/string post-filters
    sql["rows_store_query"] = """
WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 9 = 0 THEN ''
         ELSE 'item ' || (doc_id % 50) END AS name,
    CASE WHEN doc_id % 4 = 0 THEN 'x'
         WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS city,
    (doc_id % 90)::VARCHAR AS age
  FROM documents
), v AS (
  SELECT * FROM t WHERE name <> '' AND city IN ('a', 'b')
), up AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY city, name
                                 ORDER BY doc_id DESC) AS rn
    FROM v) WHERE rn = 1
)
SELECT name, city, age, '' AS source
FROM up
WHERE city = 'a' AND age::DOUBLE >= 5 AND age::DOUBLE < 80
  AND name LIKE '%1%'
"""

    # row-embeddings exact lookup: each query text is its own top-1 at
    # cosine 1.0 (texts verified distinct-by-hash at this dim)
    sql["row_emb_lookup"] = """
WITH qs AS (SELECT 'item ' || i AS q FROM range(10) t(i))
SELECT q AS query_id, 'name' AS index_name, q AS index_value, q AS text,
       1.0 AS score, 1::BIGINT AS rank
FROM qs
"""

    # property path: recursive closure from the seed, seeded with the
    # zero-length (identity) row for star semantics
    sql["sparql_path_star"] = f"""
WITH RECURSIVE toks AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), mentions AS (
  SELECT DISTINCT doc_id, token AS entity FROM toks
  WHERE token IN ({_VOCAB_SQL})
), cooccur AS (
  SELECT DISTINCT '{TG}' || a.entity AS s, '{TG}' || b.entity AS o
  FROM mentions a JOIN mentions b USING (doc_id)
  WHERE a.entity < b.entity
), reach(x) AS (
  SELECT '{TG}batch'
  UNION
  SELECT c.o FROM reach r JOIN cooccur c ON c.s = r.x
)
SELECT x FROM reach
"""

    # GraphQL surface over the same planted rows store: city='b' partition,
    # integer age filters, endsWith, typed output (age -> BIGINT)
    sql["graphql_rows"] = """
WITH t AS (
  SELECT doc_id,
    CASE WHEN doc_id % 9 = 0 THEN ''
         ELSE 'item ' || (doc_id % 50) END AS name,
    CASE WHEN doc_id % 4 = 0 THEN 'x'
         WHEN doc_id % 2 = 0 THEN 'a' ELSE 'b' END AS city,
    (doc_id % 90)::VARCHAR AS age
  FROM documents
), v AS (
  SELECT * FROM t WHERE name <> '' AND city IN ('a', 'b')
), up AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY city, name
                                 ORDER BY doc_id DESC) AS rn
    FROM v) WHERE rn = 1
)
SELECT name, city, age::BIGINT AS age
FROM up
WHERE city = 'b' AND age::DOUBLE >= 10 AND age::DOUBLE < 70
  AND name LIKE '%3'
"""

    # --- DocumentRAG family -------------------------------------------------
    # dense retrieve loop without a reranker: fetch_count = doc_limit = 5
    # exactly (per_concept_limit = 5 // 2 = 2), first-seen dedup in
    # (concept, rank) order, positions re-ranked, text join, and the
    # reference's UNTRUNCATED candidate list (no final cut)
    sql["doc_rag_topk"] = """
WITH store AS (SELECT 'c' || vec_id AS chunk_id, embedding AS vector FROM embeddings),
chunks AS (SELECT 'c' || doc_id AS chunk_id, text FROM documents),
cv AS (
  SELECT 'q' || (vec_id // 2) AS query_id, (vec_id % 2)::INT AS concept_idx,
         embedding AS qv
  FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT cv.query_id, cv.concept_idx, s.chunk_id,
         list_cosine_similarity(s.vector::DOUBLE[], cv.qv::DOUBLE[]) AS raw
  FROM store s, cv
), perc AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, concept_idx
                                 ORDER BY raw DESC, chunk_id ASC) AS crank
    FROM scored) WHERE crank <= 2
), dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, chunk_id
                                 ORDER BY concept_idx, crank) AS rn
    FROM perc) WHERE rn = 1
), pos AS (
  SELECT query_id, chunk_id, raw,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY concept_idx, crank) AS pos
  FROM dedup
)
SELECT p.query_id, p.chunk_id, round(p.raw, 4) AS score,
       p.pos::BIGINT AS final_rank
FROM pos p JOIN chunks c USING (chunk_id)
"""

    _BM25_CTES = """
chunks AS (SELECT 'c' || doc_id AS chunk_id, text FROM documents),
toks AS (
  SELECT chunk_id,
         unnest(list_filter(string_split_regex(lower(text), '[^a-z0-9_]+'),
                            x -> x <> '')) AS term
  FROM chunks
),
tf AS (SELECT chunk_id, term, count(*)::DOUBLE AS tf FROM toks GROUP BY 1, 2),
dl AS (SELECT chunk_id, sum(tf) AS dl FROM tf GROUP BY 1),
dft AS (SELECT term, count(*)::DOUBLE AS df FROM tf GROUP BY 1),
stats AS (SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl FROM dl),
qt AS (
  SELECT query_id,
         unnest(list_distinct(list_filter(
           string_split_regex(lower(query), '[^a-z0-9_]+'), x -> x <> ''))) AS term
  FROM qdef
),
contrib AS (
  SELECT qt.query_id, tf.chunk_id,
         ln(1 + (s.n_docs - dft.df + 0.5) / (dft.df + 0.5))
           * (tf.tf * 2.2)
           / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)) AS part
  FROM tf JOIN qt USING (term) JOIN dft USING (term) JOIN dl USING (chunk_id)
  CROSS JOIN stats s
),
bm25 AS (SELECT query_id, chunk_id, sum(part) AS score FROM contrib GROUP BY 1, 2),
bm25r AS (
  SELECT query_id, chunk_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, chunk_id ASC) AS krank
  FROM bm25
)"""

    # sparse path: Okapi BM25 k1=1.2 b=0.75, [a-z0-9_]+ tokenizer, top-10
    sql["doc_rag_bm25"] = (
        """
WITH qdef AS (
  SELECT * FROM (VALUES ('q0', 'spark window hash table'),
                        ('q1', 'stream filter vector scan')) AS v(query_id, query)
),"""
        + _BM25_CTES
        + """
SELECT r.query_id, r.chunk_id, round(r.score, 4) AS score,
       r.krank::BIGINT AS final_rank
FROM bm25r r JOIN chunks USING (chunk_id)
WHERE r.krank <= 10
"""
    )

    # hybrid without reranker: fetch_count = doc_limit = 5 on both arms
    # (dense per_concept 5//2 = 2, BM25 top-5) fused by weighted RRF (k=60,
    # weights 1.0 / 0.5); the fused top-5 is the selection, context
    # assembled in fused-rank order
    sql["doc_rag_hybrid"] = (
        """
WITH qdef AS (
  SELECT * FROM (VALUES ('q0', 'spark window hash table'),
                        ('q1', 'stream filter vector scan'),
                        ('q2', 'merge join batch query'),
                        ('q3', 'table scan filter window'),
                        ('q4', 'vector query stream hash')) AS v(query_id, query)
),"""
        + _BM25_CTES
        + """,
store AS (SELECT 'c' || vec_id AS chunk_id, embedding AS vector FROM embeddings),
cv AS (
  SELECT 'q' || (vec_id // 2) AS query_id, (vec_id % 2)::INT AS concept_idx,
         embedding AS qv
  FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT cv.query_id, cv.concept_idx, s.chunk_id,
         list_cosine_similarity(s.vector::DOUBLE[], cv.qv::DOUBLE[]) AS raw
  FROM store s, cv
), perc AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, concept_idx
                                 ORDER BY raw DESC, chunk_id ASC) AS crank
    FROM scored) WHERE crank <= 2
), dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, chunk_id
                                 ORDER BY concept_idx, crank) AS rn
    FROM perc) WHERE rn = 1
), densr AS (
  SELECT query_id, chunk_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY concept_idx, crank) AS vrank
  FROM dedup
), parts AS (
  SELECT query_id, chunk_id, 1.0 / (60 + vrank) AS part FROM densr
  UNION ALL
  SELECT query_id, chunk_id, 0.5 / (60 + krank) AS part
  FROM bm25r WHERE krank <= 5
), fused AS (
  SELECT query_id, chunk_id, sum(part) AS score FROM parts GROUP BY 1, 2
), fr AS (
  SELECT query_id, chunk_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, chunk_id ASC) AS frank
  FROM fused
), sel AS (
  SELECT f.query_id, f.chunk_id, f.frank, c.text
  FROM fr f JOIN chunks c USING (chunk_id)
  WHERE f.frank <= 5
)
SELECT query_id,
       string_agg(chunk_id, ',' ORDER BY frank) AS chunk_ids,
       md5(string_agg(text, chr(10) || chr(10) ORDER BY frank)) AS context_md5,
       count(*)::BIGINT AS n_chunks
FROM sel
GROUP BY query_id
"""
    )

    # query-variant ontology matcher: the analytically-derived selection —
    # each question's segments match exactly the device class at cosine
    # 1.0 (verified against a HashEmbedder replica at fixture-build time);
    # enhancements follow the question type deterministically
    sql["onto_match_query"] = """
SELECT * FROM (VALUES
  ('ret', 'kb', 'class', 'device', 'selected', 1.0),
  ('ret', 'kb', 'objectProperty', 'connects', 'traversal', CAST(NULL AS DOUBLE)),
  ('ret', 'kb', 'objectProperty', 'linkswith', 'traversal', CAST(NULL AS DOUBLE)),
  ('ret', 'kb', 'datatypeProperty', 'sensorcount', 'traversal', CAST(NULL AS DOUBLE)),
  ('rel', 'kb', 'class', 'device', 'selected', 1.0),
  ('rel', 'kb', 'objectProperty', 'connects', 'traversal', CAST(NULL AS DOUBLE)),
  ('rel', 'kb', 'objectProperty', 'linkswith', 'traversal', CAST(NULL AS DOUBLE)),
  ('rel', 'kb', 'objectProperty', 'attached', 'traversal', CAST(NULL AS DOUBLE)),
  ('agg', 'kb', 'class', 'device', 'selected', 1.0),
  ('agg', 'kb', 'datatypeProperty', 'sensorcount', 'traversal', CAST(NULL AS DOUBLE))
) AS t(question_id, ontology_id, element_type, element_id, role, score)
"""

    # NL->SPARQL executed leg: 'find all Device' compiles to the retrieval
    # template (?entity rdf:type :device OPTIONAL label) over the planted
    # typed graph — devices are the doc_id % 3 <> 0 rows
    sql["nl2sparql_exec"] = """
SELECT 'http://example.org/dev' || doc_id AS entity,
       'device ' || doc_id AS label
FROM documents
WHERE doc_id % 3 <> 0
"""

    # OntoRAG text segmentation + key terms: the deterministic sentence
    # splitter and the stopword/bigram term extraction replayed over the
    # planted punctuated corpus (NLTK stopword list inlined as a literal)
    from trustgraph_spark.operators.ontology import NLTK_EN_STOPWORDS

    _stop_sql = "[" + ", ".join(
        "'" + w.replace("'", "''") + "'" for w in NLTK_EN_STOPWORDS
    ) + "]"
    sql["onto_segments"] = f"""
WITH planted AS (
  SELECT doc_id,
    trim(regexp_replace(
      substr(text,1,20) || '. ' || substr(text,21,20) || '! '
        || substr(text,41,20) || '?',
      '\\s+', ' ', 'g')) AS t
  FROM documents
), seg AS (
  SELECT doc_id,
    list_filter(
      list_transform(string_split_regex(t, '[.!?]+\\s+'),
                     s -> trim(regexp_replace(s, '[.!?]+$', ''))),
      s -> s <> '') AS segs
  FROM planted
), ex AS (
  SELECT doc_id, idx - 1 AS position, segs[idx] AS segment
  FROM seg, LATERAL (SELECT unnest(generate_series(1, len(segs))) AS idx) u
), terms AS (
  SELECT doc_id, position, segment,
    list_filter(
      list_filter(string_split_regex(lower(segment), '\\W+'), w -> w <> ''),
      w -> len(w) > 2 AND NOT list_contains({_stop_sql}, w)) AS singles,
    list_filter(string_split_regex(lower(segment), '\\W+'), w -> w <> '') AS words
  FROM ex
), bi AS (
  SELECT doc_id, position, segment, singles,
    list_filter(
      list_transform(generate_series(1, len(words)-1),
        i -> CASE WHEN NOT list_contains({_stop_sql}, words[i])
                   AND NOT list_contains({_stop_sql}, words[i+1])
             THEN words[i] || ' ' || words[i+1] END),
      x -> x IS NOT NULL) AS bigrams
  FROM terms
)
SELECT doc_id, position, segment,
       len(singles) + len(bigrams) AS n_terms,
       md5(array_to_string(list_concat(singles, bigrams), ' ')) AS terms_md5
FROM bi
"""

    # MMR pool prefix: dense candidates at fetch_count=10 (per-concept 5,
    # first-seen dedup), chunk-text join, per-query min-max normalization
    # (all-equal -> 0.5)
    sql["doc_rag_mmr_pool"] = """
WITH store AS (SELECT 'c' || vec_id AS chunk_id, embedding AS vector FROM embeddings),
chunks AS (SELECT 'c' || doc_id AS chunk_id, text FROM documents),
cv AS (
  SELECT 'q' || (vec_id // 2) AS query_id, (vec_id % 2)::INT AS concept_idx,
         embedding AS qv
  FROM embeddings WHERE vec_id < 10
), scored AS (
  SELECT cv.query_id, cv.concept_idx, s.chunk_id,
         list_cosine_similarity(s.vector::DOUBLE[], cv.qv::DOUBLE[]) AS raw
  FROM store s, cv
), perc AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, concept_idx
                                 ORDER BY raw DESC, chunk_id ASC) AS crank
    FROM scored) WHERE crank <= 5
), dedup AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY query_id, chunk_id
                                 ORDER BY concept_idx, crank) AS rn
    FROM perc) WHERE rn = 1
), pool AS (
  SELECT d.query_id, d.chunk_id, d.raw
  FROM dedup d JOIN chunks c USING (chunk_id)
), mm AS (
  SELECT query_id, min(raw) AS lo, max(raw) AS hi FROM pool GROUP BY 1
)
SELECT p.query_id, p.chunk_id, round(p.raw, 4) AS score,
       round(CASE WHEN m.hi = m.lo THEN 0.5
                  ELSE (p.raw - m.lo) / (m.hi - m.lo) END, 4) AS norm_score
FROM pool p JOIN mm m USING (query_id)
"""

    # OntoRAG extraction conversion: replay the planted three-format
    # responses analytically — per-doc triples depend only on doc_id and
    # the fixed kb ontology (device > sensor > meter chain). fmt0 (JSONL)
    # yields 6 triples, fmt1 (legacy) 4 (unknown class + domain violation
    # skipped), fmt2 (snake_case) 3 (unknown relation skipped, bool value
    # stringified); doc % 11 responses are malformed -> no rows
    _OE = "https://trustgraph.ai/ontology/kb#"
    _OB = "https://trustgraph.ai/kb/"
    sql["onto_extract_convert"] = f"""
WITH d AS (
  SELECT doc_id AS n FROM documents WHERE doc_id % 11 <> 0
), f0 AS (SELECT n FROM d WHERE n % 3 = 0),
   f1 AS (SELECT n FROM d WHERE n % 3 = 1),
   f2 AS (SELECT n FROM d WHERE n % 3 = 2)
SELECT '{_OB}device-dev-' || n AS s, '{RDF_TYPE}' AS p,
       '{_OE}device' AS o, 'u' AS otype FROM f0
UNION ALL SELECT '{_OB}device-dev-' || n, '{RDF_LABEL}', 'dev ' || n, 'l' FROM f0
UNION ALL SELECT '{_OB}sensor-sen-' || n, '{RDF_TYPE}', '{_OE}sensor', 'u' FROM f0
UNION ALL SELECT '{_OB}sensor-sen-' || n, '{RDF_LABEL}', 'sen ' || n, 'l' FROM f0
UNION ALL SELECT '{_OB}device-dev-' || n, '{_OE}connects',
                 '{_OB}sensor-sen-' || n, 'u' FROM f0
UNION ALL SELECT '{_OB}sensor-sen-' || n, '{_OE}reading', n::VARCHAR, 'l' FROM f0
UNION ALL SELECT '{_OB}device-dev-' || n, '{RDF_TYPE}', '{_OE}device', 'u' FROM f1
UNION ALL SELECT '{_OB}device-dev-' || n, '{RDF_LABEL}', 'dev ' || n, 'l' FROM f1
UNION ALL SELECT '{_OB}sensor-sen-' || n, '{_OE}connects',
                 '{_OB}meter-met-' || n, 'u' FROM f1
UNION ALL SELECT '{_OB}device-dev-' || n, '{_OE}serial', 's ' || n, 'l' FROM f1
UNION ALL SELECT '{_OB}meter-met-' || n, '{RDF_TYPE}', '{_OE}meter', 'u' FROM f2
UNION ALL SELECT '{_OB}meter-met-' || n, '{RDF_LABEL}', 'met ' || n, 'l' FROM f2
UNION ALL SELECT '{_OB}meter-met-' || n, '{_OE}reading', 'True', 'l' FROM f2
"""

    # ReAct scripted-session trace: every row reconstructed analytically —
    # sessions are doc_id%10==3, the decade index d drives tool / format /
    # error rotation; observations replay the two batched tool joins
    # (mention-label degree over ALL documents, order-status counts); the
    # __parse_error__ observation is the pinned json.loads message for
    # '{not json}' (trustgraph_spark.agent.BAD_ARGS_ERROR)
    from trustgraph_spark.agent import BAD_ARGS_ERROR

    _bad = BAD_ARGS_ERROR.replace("'", "''")
    _bad_noprefix = BAD_ARGS_ERROR[len("Error: "):].replace("'", "''")
    _REACT_CTE = f"""
WITH sess AS (
  SELECT doc_id, doc_id // 10 AS d FROM documents WHERE doc_id % 10 = 3
), mentions AS (
  SELECT CASE WHEN doc_id % 3 = 0 THEN 'entity ' || (doc_id % 40) || 's'
              ELSE 'entity ' || (doc_id % 40) END AS lbl
  FROM documents
), deg AS (
  SELECT lbl, count(*)::BIGINT AS n_mentions FROM mentions GROUP BY lbl
), ostat AS (
  SELECT o_orderstatus AS st, count(*)::BIGINT AS n_orders
  FROM orders GROUP BY 1
), enr AS (
  SELECT s.doc_id, s.d,
    'urn:trustgraph:agent:s' || s.doc_id AS session_id,
    CASE WHEN s.d % 2 = 1 THEN 'knowledge_query'
         ELSE 'structured_query' END AS tool_name,
    CASE WHEN s.d % 2 = 1 THEN 'entity' ELSE 'status' END AS arg_key,
    CASE WHEN s.d % 2 = 1
         THEN CASE WHEN s.doc_id % 3 = 0
                   THEN 'entity ' || (s.doc_id % 40) || 's'
                   ELSE 'entity ' || (s.doc_id % 40) END
         ELSE CASE WHEN s.doc_id % 3 = 0 THEN 'F'
                   WHEN s.doc_id % 3 = 1 THEN 'O' ELSE 'P' END
    END AS arg_val,
    CASE WHEN s.doc_id % 3 = 0 THEN 'F'
         WHEN s.doc_id % 3 = 1 THEN 'O' ELSE 'P' END AS status,
    s.d % 10 = 1 AS two_step,
    s.d % 10 = 7 AS bad_args,
    s.d % 10 = 9 AS fail,
    CASE WHEN s.d % 10 = 0
         THEN 'knowledge_query,structured_query,audit_log'
         ELSE 'knowledge_query,structured_query' END AS tool_candidates
  FROM sess s
), obs AS (
  SELECT e.*,
    CASE WHEN e.bad_args THEN '{_bad}'
         WHEN e.fail THEN 'Error: backend unavailable'
         WHEN e.tool_name = 'knowledge_query'
           THEN e.arg_val || ' has ' || coalesce(dg.n_mentions, 0)
                || ' mentions'
         ELSE '{{"status": "' || e.status || '", "n_orders": '
              || coalesce(o.n_orders, 0) || '}}'
    END AS observation,
    '{{"status": "' || e.status || '", "n_orders": '
        || coalesce(o.n_orders, 0) || '}}' AS obs2
  FROM enr e
  LEFT JOIN deg dg ON dg.lbl = e.arg_val
  LEFT JOIN ostat o ON o.st = e.status
)
"""
    sql["react_tool_trace"] = _REACT_CTE + f"""
SELECT session_id, 1 AS step, arg_val AS question,
  CASE WHEN bad_args THEN ''
       ELSE 'Need ' || tool_name || ' for ' || arg_val || '.' END AS thought,
  CASE WHEN bad_args THEN '__parse_error__' ELSE tool_name END AS action,
  CASE WHEN bad_args THEN '{{}}'
       ELSE '{{"' || arg_key || '": "' || arg_val || '"}}' END AS args_json,
  observation,
  CASE WHEN bad_args THEN '{_bad_noprefix}'
       WHEN fail THEN 'backend unavailable'
       ELSE NULL END AS tool_error,
  'action' AS kind, tool_candidates
FROM obs
UNION ALL
SELECT session_id, 2, arg_val,
       'Need structured_query for ' || status || '.',
       'structured_query',
       '{{"status": "' || status || '"}}',
       obs2, NULL, 'action', tool_candidates
FROM obs WHERE two_step
UNION ALL
SELECT session_id, CASE WHEN two_step THEN 3 ELSE 2 END, arg_val,
       'Observation received.', '', '',
       'Concluded: ' || observation
         || CASE WHEN two_step THEN ' | ' || obs2 ELSE '' END,
       NULL, 'final', tool_candidates
FROM obs
"""

    # Agent provenance triples for the scripted sessions: every session
    # has exactly one Analysis iteration and one Conclusion, so the
    # reference emitters (provenance/agent.py session/iteration/
    # observation/final) unroll to a fixed per-session triple set,
    # generated here programmatically over the same obs CTE
    _TGP = "https://trustgraph.ai/ns/"
    _PROVNS = "http://www.w3.org/ns/prov#"
    _S = "session_id"
    _I = "session_id || '/i1'"
    _T = "session_id || '/i1/thought'"
    _O = "session_id || '/i1/observation'"
    _I2 = "session_id || '/i2'"
    _T2 = "session_id || '/i2/thought'"
    _O2 = "session_id || '/i2/observation'"
    _FU = "session_id || '/final'"
    _act = "CASE WHEN bad_args THEN '__parse_error__' ELSE tool_name END"
    _args = ("CASE WHEN bad_args THEN '{}' ELSE "
             "'{\"' || arg_key || '\": \"' || arg_val || '\"}' END")
    _errtext = ("CASE WHEN bad_args THEN '" + _bad_noprefix
                + "' ELSE 'backend unavailable' END")

    def _pt(s, p, o, otype, where=""):
        return (f"SELECT {s} AS s, '{p}' AS p, {o} AS o, '{otype}' AS otype"
                f" FROM obs{where}")

    _prov_selects = [
        # session (Question activity)
        _pt(_S, RDF_TYPE, f"'{_PROVNS}Entity'", "u"),
        _pt(_S, RDF_TYPE, f"'{_TGP}Question'", "u"),
        _pt(_S, RDF_TYPE, f"'{_TGP}AgentQuestion'", "u"),
        _pt(_S, RDF_LABEL, "'Agent Question'", "l"),
        _pt(_S, f"{_PROVNS}startedAtTime", "'2026-01-01T00:00:00Z'", "l"),
        _pt(_S, f"{_TGP}query", "arg_val", "l"),
        # iteration (Analysis + ToolUse)
        _pt(_I, RDF_TYPE, f"'{_PROVNS}Entity'", "u"),
        _pt(_I, RDF_TYPE, f"'{_TGP}Analysis'", "u"),
        _pt(_I, RDF_TYPE, f"'{_TGP}ToolUse'", "u"),
        _pt(_I, RDF_LABEL, f"'Analysis: ' || {_act}", "l"),
        _pt(_I, f"{_TGP}action", _act, "l"),
        _pt(_I, f"{_TGP}arguments", _args, "l"),
        _pt(_I, f"{_TGP}stepNumber", "'1'", "l"),
        _pt(_I, f"{_PROVNS}wasDerivedFrom", _S, "u"),
        _pt(_I, f"{_TGP}thought", _T, "u"),
        # thought sub-entity
        _pt(_T, RDF_TYPE, f"'{_TGP}Reflection'", "u"),
        _pt(_T, RDF_TYPE, f"'{_TGP}Thought'", "u"),
        _pt(_T, RDF_LABEL, "'Thought'", "l"),
        _pt(_T, f"{_PROVNS}wasDerivedFrom", _I, "u"),
        # observation
        _pt(_O, RDF_TYPE, f"'{_PROVNS}Entity'", "u"),
        _pt(_O, RDF_TYPE, f"'{_TGP}Observation'", "u"),
        _pt(_O, RDF_LABEL, "'Observation'", "l"),
        _pt(_O, f"{_PROVNS}wasDerivedFrom", _I, "u"),
        # tool candidates (audit_log only for the review-state decades)
        _pt(_I, f"{_TGP}toolCandidate", "'knowledge_query'", "l"),
        _pt(_I, f"{_TGP}toolCandidate", "'structured_query'", "l"),
        _pt(_I, f"{_TGP}toolCandidate", "'audit_log'", "l",
            " WHERE d % 10 = 0"),
        # error mixin on failed observations
        _pt(_O, f"{_TGP}toolError", _errtext, "l",
            " WHERE bad_args OR fail"),
        _pt(_O, RDF_TYPE, f"'{_TGP}Error'", "u", " WHERE bad_args OR fail"),
        # conclusion (two-step sessions derive from iteration 2)
        _pt(_FU, RDF_TYPE, f"'{_PROVNS}Entity'", "u"),
        _pt(_FU, RDF_TYPE, f"'{_TGP}Conclusion'", "u"),
        _pt(_FU, RDF_TYPE, f"'{_TGP}Answer'", "u"),
        _pt(_FU, RDF_LABEL, "'Conclusion'", "l"),
        _pt(_FU, f"{_PROVNS}wasDerivedFrom",
            f"CASE WHEN two_step THEN {_I2} ELSE {_I} END", "u"),
        _pt(_FU, f"{_TGP}terminationReason", "'final-answer'", "l"),
    ]
    # iteration 2 of the two-step sessions: plain structured follow-up,
    # derived from iteration 1's OBSERVATION (the multi-iteration lineage
    # branch, react/service.py:535-545)
    _act2 = "'structured_query'"
    _args2 = "'{\"status\": \"' || status || '\"}'"
    _W2 = " WHERE two_step"
    _prov_selects += [
        _pt(_I2, RDF_TYPE, f"'{_PROVNS}Entity'", "u", _W2),
        _pt(_I2, RDF_TYPE, f"'{_TGP}Analysis'", "u", _W2),
        _pt(_I2, RDF_TYPE, f"'{_TGP}ToolUse'", "u", _W2),
        _pt(_I2, RDF_LABEL, f"'Analysis: ' || {_act2}", "l", _W2),
        _pt(_I2, f"{_TGP}action", _act2, "l", _W2),
        _pt(_I2, f"{_TGP}arguments", _args2, "l", _W2),
        _pt(_I2, f"{_TGP}stepNumber", "'2'", "l", _W2),
        _pt(_I2, f"{_PROVNS}wasDerivedFrom", _O, "u", _W2),
        _pt(_I2, f"{_TGP}thought", _T2, "u", _W2),
        _pt(_T2, RDF_TYPE, f"'{_TGP}Reflection'", "u", _W2),
        _pt(_T2, RDF_TYPE, f"'{_TGP}Thought'", "u", _W2),
        _pt(_T2, RDF_LABEL, "'Thought'", "l", _W2),
        _pt(_T2, f"{_PROVNS}wasDerivedFrom", _I2, "u", _W2),
        _pt(_O2, RDF_TYPE, f"'{_PROVNS}Entity'", "u", _W2),
        _pt(_O2, RDF_TYPE, f"'{_TGP}Observation'", "u", _W2),
        _pt(_O2, RDF_LABEL, "'Observation'", "l", _W2),
        _pt(_O2, f"{_PROVNS}wasDerivedFrom", _I2, "u", _W2),
        _pt(_I2, f"{_TGP}toolCandidate", "'knowledge_query'", "l", _W2),
        _pt(_I2, f"{_TGP}toolCandidate", "'structured_query'", "l", _W2),
    ]
    sql["react_prov_triples"] = (
        _REACT_CTE + "\nUNION ALL\n".join(_prov_selects)
    )

    # stdlib media decode: sawtooth PCM samples and gradient luma pixels
    # rebuilt with the same integer formulas, features quantized through
    # REAL (float32, matching the feature schema) before rounding
    sql["media_stdlib_features"] = """
WITH wav_samples AS (
  SELECT d.doc_id, t.i // 250 AS band,
         ((t.i * (200 + (d.doc_id % 8) * 100)) % 8000) * 65535 // 8000
           - 32768 AS v
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 3999)) AS i) t
  WHERE d.doc_id % 2 = 0
), wav_feat AS (
  SELECT 'm' || doc_id AS media_id, 'audio' AS kind, band::INT AS band,
         round(CAST(sqrt(avg((v / 32768.0) * (v / 32768.0))) AS REAL)::DOUBLE,
               4) AS value
  FROM wav_samples GROUP BY doc_id, band
), bmp_pix AS (
  SELECT d.doc_id,
         ((p.x * 16 + p.y * 2 + (d.doc_id % 7) * 3) % 256) // 16 AS bin
  FROM documents d
  CROSS JOIN (SELECT tx.x, ty.y
              FROM (SELECT unnest(generate_series(0, 7)) AS x) tx,
                   (SELECT unnest(generate_series(0, 7)) AS y) ty) p
  WHERE d.doc_id % 2 = 1
), bmp_counts AS (
  SELECT doc_id, bin, count(*) AS c FROM bmp_pix GROUP BY 1, 2
), bmp_feat AS (
  SELECT 'm' || d.doc_id AS media_id, 'image' AS kind, b.band::INT AS band,
         round(CAST(coalesce(c.c, 0) / 64.0 AS REAL)::DOUBLE, 4) AS value
  FROM documents d
  CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS band) b
  LEFT JOIN bmp_counts c ON c.doc_id = d.doc_id AND c.bin = b.band
  WHERE d.doc_id % 2 = 1
)
SELECT * FROM wav_feat UNION ALL SELECT * FROM bmp_feat
"""

    # N-Quads export: every line rebuilt with the same ECHAR escape chain
    # (backslash first) and grammar gates; cases 4 (bad IRI) and 5
    # (RDF-star) yield NULL lines with encodable=false
    _NQ_CTE = """
WITH t AS (
  SELECT doc_id, doc_id % 6 AS m,
    CASE WHEN doc_id % 6 = 0 THEN 'urn:graph:g' || (doc_id % 3) ELSE '' END AS g,
    CASE WHEN doc_id % 6 = 4 THEN 'http://ex/bad subj' || doc_id
         ELSE 'http://ex/s' || doc_id END AS s,
    'http://ex/p' || (doc_id % 5) AS p,
    CASE WHEN doc_id % 6 = 0 THEN 'http://ex/o' || doc_id
         WHEN doc_id % 6 = 1 THEN 'say "hi"' || chr(10) || 'tab' || chr(9)
                                   || 'back' || chr(92) || doc_id
         WHEN doc_id % 6 = 2 THEN 'tagged ' || doc_id
         WHEN doc_id % 6 = 3 THEN doc_id::VARCHAR
         WHEN doc_id % 6 = 4 THEN 'x'
         ELSE '{"s": "a", "p": "b", "o": "c"}' END AS o,
    CASE WHEN doc_id % 6 = 0 THEN 'u' WHEN doc_id % 6 = 5 THEN 't'
         ELSE 'l' END AS otype,
    CASE WHEN doc_id % 6 = 3
         THEN 'http://www.w3.org/2001/XMLSchema#integer' ELSE '' END AS dtype,
    CASE WHEN doc_id % 6 = 2
         THEN CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'fr' END
         ELSE '' END AS lang
  FROM documents
)
"""
    sql["nquads_export"] = _NQ_CTE + """
SELECT
  CASE WHEN m IN (4, 5) THEN NULL
       ELSE '<' || s || '> <' || p || '> '
         || CASE WHEN otype = 'u' THEN '<' || o || '>'
                 ELSE '"' ||
                   replace(replace(replace(replace(replace(o,
                     chr(92), chr(92)||chr(92)), '"', chr(92)||'"'),
                     chr(10), chr(92)||'n'), chr(13), chr(92)||'r'),
                     chr(9), chr(92)||'t')
                   || '"'
                   || CASE WHEN lang <> '' THEN '@' || lang
                           WHEN dtype <> '' THEN '^^<' || dtype || '>'
                           ELSE '' END
            END
         || CASE WHEN g <> '' THEN ' <' || g || '>' ELSE '' END
         || ' .'
  END AS line,
  m NOT IN (4, 5) AS encodable
FROM t
"""
    # roundtrip oracle: the planted encodable subset verbatim — the parse
    # must undo the escape chain exactly
    sql["nquads_roundtrip"] = _NQ_CTE + """
SELECT g, s, p, o, otype, dtype, lang FROM t WHERE m NOT IN (4, 5)
"""

    # Flow topic closure: interpolation as nested replace, ownership =
    # template contains '{', stopping flows excluded, refcount per topic
    sql["flow_topic_sweep"] = """
WITH flows AS (
  SELECT
    'ws' || (doc_id % 3) AS ws,
    'f' || doc_id AS fid,
    'bp' || (doc_id % 4) AS bp,
    CASE WHEN doc_id % 11 = 0 THEN 'stopping' ELSE 'running' END AS status,
    'm' || (doc_id % 2) AS model,
    't' || (doc_id % 3) AS tier
  FROM documents
), tpl AS (
  SELECT 'bp' || s.i AS bp, v.t AS t
  FROM generate_series(0, 3) AS s(i), (VALUES
    ('persistent://tg/flow/chunk-{id}'),
    ('request:{workspace}:rag-{model}-{tier}'),
    ('shared-{blueprint}'),
    ('request:tg:librarian')) AS v(t)
), resolved AS (
  SELECT DISTINCT ws, fid,
    replace(replace(replace(replace(replace(t,
      '{workspace}', ws), '{blueprint}', flows.bp), '{id}', fid),
      '{model}', model), '{tier}', tier) AS topic
  FROM flows JOIN tpl ON flows.bp = tpl.bp
  WHERE status <> 'stopping' AND t LIKE '%{%'
)
SELECT topic, COUNT(*)::BIGINT AS refs
FROM resolved GROUP BY topic
"""

    # Config store: the same append log + window argmax in SQL —
    # last write per (workspace, type, key), tombstones dropped
    # Token metering: price tables re-resolved analytically (the JSON
    # values are planted from doc_id, so the winning write's prices are
    # pure doc_id arithmetic); costs exact in integer micro-USD
    sql["metering_costs"] = """
WITH cfg AS (
  SELECT doc_id,
    'ws' || (doc_id % 2) AS workspace,
    CASE doc_id % 3 WHEN 0 THEN 'gpt-a' WHEN 1 THEN 'gpt-b'
         ELSE 'gpt-c' END AS model,
    doc_id % 4 + 1 AS in_micro,
    doc_id % 4 + 2 AS out_micro
  FROM documents
  WHERE doc_id < 12 AND doc_id % 6 <> 4 AND doc_id % 3 <> 2
), price AS (
  SELECT workspace, model, in_micro, out_micro FROM (
    SELECT *, row_number() OVER (
      PARTITION BY workspace, model ORDER BY doc_id DESC) AS rn
    FROM cfg) WHERE rn = 1
), comp AS (
  SELECT
    'ws' || (doc_id % 2) AS workspace,
    CASE doc_id % 5 WHEN 0 THEN 'gpt-a' WHEN 1 THEN 'gpt-b'
         WHEN 2 THEN 'unpriced' ELSE 'unknown' END AS model,
    CASE WHEN doc_id % 11 = 0 THEN 0 ELSE doc_id % 1000 END AS num_in,
    CASE WHEN doc_id % 13 = 0 THEN 0 ELSE doc_id * 3 % 800 END AS num_out
  FROM documents
), joined AS (
  SELECT c.workspace, c.model, c.num_in, c.num_out,
         p.in_micro, p.out_micro
  FROM comp c LEFT JOIN price p USING (workspace, model)
), unpivoted AS (
  SELECT workspace, model, 'input' AS direction, num_in AS tokens,
         COALESCE(num_in * in_micro, 0) AS cost_micro FROM joined
  UNION ALL
  SELECT workspace, model, 'output', num_out,
         COALESCE(num_out * out_micro, 0) FROM joined
)
SELECT workspace, model, direction,
       SUM(tokens)::BIGINT AS tokens,
       SUM(cost_micro)::BIGINT AS cost_micro
FROM unpivoted GROUP BY workspace, model, direction
"""

    sql["config_resolve_state"] = """
WITH log AS (
  SELECT
    'ws' || (doc_id % 3) AS workspace,
    CASE WHEN doc_id % 2 = 0 THEN 'prompt' ELSE 'flow' END AS type,
    'k' || (doc_id % 10) AS key,
    CASE WHEN doc_id % 7 = 0 THEN NULL
         ELSE 'v' || doc_id END AS value,
    doc_id::BIGINT AS seq,
    doc_id % 7 = 0 AS deleted
  FROM documents
), ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY workspace, type, key ORDER BY seq DESC) AS rn
  FROM log
)
SELECT workspace, type, key, value, seq
FROM ranked WHERE rn = 1 AND NOT deleted
"""

    # Prompt templating: every rendered prompt rebuilt in SQL —
    # list_transform/list_aggregate mirror the native transform +
    # array_join lowering, CASE WHEN the if/else branches
    sql["prompt_render"] = """
SELECT doc_id,
  'Doc ' || doc_id || ': T' || doc_id || chr(10)
  || CASE WHEN doc_id % 4 >= 1 THEN 'Items:' || chr(10) ||
       list_aggregate(
         list_transform(generate_series(1, doc_id % 4),
                        i -> '- it' || i || ' x' || (i * 2) || chr(10)),
         'string_agg', '')
     ELSE 'No items' || chr(10) END
  || CASE WHEN doc_id % 5 = 0 THEN 'FLAGGED' ELSE '' END AS rendered
FROM documents
"""

    # Turtle roundtrip: export -> parse must reproduce every
    # Turtle-encodable planted row (m=4 bad-IRI skipped; m=5 RDF-star IS
    # Turtle-encodable via << >> and parses back to the REAL provenance
    # JSON, so the oracle writes it inline rather than reusing the
    # _NQ_CTE placeholder)
    sql["turtle_roundtrip"] = """
SELECT
  'http://ex/s' || doc_id AS s,
  'http://ex/p' || (doc_id % 5) AS p,
  CASE WHEN doc_id % 6 = 0 THEN 'http://ex/o' || doc_id
       WHEN doc_id % 6 = 1 THEN 'say "hi"' || chr(10) || 'tab' || chr(9)
                                 || 'back' || chr(92) || doc_id
       WHEN doc_id % 6 = 2 THEN 'tagged ' || doc_id
       WHEN doc_id % 6 = 3 THEN doc_id::VARCHAR
       ELSE '{"s":{"type":"i","iri":"http://ex/a' || (doc_id % 9)
            || '"},"p":{"type":"i","iri":"http://ex/b"},'
            || '"o":{"type":"l","value":"v ' || doc_id || '"}}' END AS o,
  CASE WHEN doc_id % 6 = 0 THEN 'u' WHEN doc_id % 6 = 5 THEN 't'
       ELSE 'l' END AS otype,
  CASE WHEN doc_id % 6 = 3
       THEN 'http://www.w3.org/2001/XMLSchema#integer' ELSE '' END AS dtype,
  CASE WHEN doc_id % 6 = 2
       THEN CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'fr' END
       ELSE '' END AS lang
FROM documents
WHERE doc_id % 6 <> 4
"""

    # Turtle export: header rows + one block per subject (every planted
    # subject carries exactly one predicate-object pair); literals reuse
    # the same escape chain, xsd:integer compresses, case 5 renders the
    # RDF-star quoted triple, case 4 (bad IRI) is skipped entirely
    sql["turtle_export"] = _NQ_CTE + """
SELECT '@prefix ex: <http://ex/> .' AS line
UNION ALL SELECT '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .'
UNION ALL
SELECT 'ex:s' || doc_id || ' ex:p' || (doc_id % 5) || ' ' ||
  CASE WHEN m = 0 THEN 'ex:o' || doc_id
       WHEN m = 1 THEN '"' ||
         replace(replace(replace(replace(replace(o,
           chr(92), chr(92)||chr(92)), '"', chr(92)||'"'),
           chr(10), chr(92)||'n'), chr(13), chr(92)||'r'),
           chr(9), chr(92)||'t') || '"'
       WHEN m = 2 THEN '"tagged ' || doc_id || '"@'
         || CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'fr' END
       WHEN m = 3 THEN '"' || doc_id || '"^^xsd:integer'
       ELSE '<< ex:a' || (doc_id % 9) || ' ex:b "v ' || doc_id || '" >>'
  END || ' .' AS line
FROM t WHERE m <> 4
"""

    # document-library schema.org triples: URIs re-minted with the same
    # Knowledge-core msgpack roundtrip: pack -> unpack must reproduce the
    # planted frame byte-for-byte, so the oracle is the planted set itself
    # — including the grammar-invalid IRI (m=4) and RDF-star (m=5) rows
    # the N-Quads oracles exclude; the m=5 object is the REAL planted
    # RDF-star JSON (the _NQ_CTE placeholder is never selected by the
    # nquads/turtle oracles)
    sql["kg_core_msgpack"] = """
SELECT
  'doc-' || (doc_id % 7) AS id,
  'default' AS collection,
  CASE WHEN doc_id % 6 = 0 THEN 'urn:graph:g' || (doc_id % 3) ELSE '' END AS g,
  CASE WHEN doc_id % 6 = 4 THEN 'http://ex/bad subj' || doc_id
       ELSE 'http://ex/s' || doc_id END AS s,
  'http://ex/p' || (doc_id % 5) AS p,
  CASE WHEN doc_id % 6 = 0 THEN 'http://ex/o' || doc_id
       WHEN doc_id % 6 = 1 THEN 'say "hi"' || chr(10) || 'tab' || chr(9)
                                 || 'back' || chr(92) || doc_id
       WHEN doc_id % 6 = 2 THEN 'tagged ' || doc_id
       WHEN doc_id % 6 = 3 THEN doc_id::VARCHAR
       WHEN doc_id % 6 = 4 THEN 'x'
       ELSE '{"s":{"type":"i","iri":"http://ex/a' || (doc_id % 9)
            || '"},"p":{"type":"i","iri":"http://ex/b"},'
            || '"o":{"type":"l","value":"v ' || doc_id || '"}}' END AS o,
  CASE WHEN doc_id % 6 = 0 THEN 'u' WHEN doc_id % 6 = 5 THEN 't'
       ELSE 'l' END AS otype,
  CASE WHEN doc_id % 6 = 3
       THEN 'http://www.w3.org/2001/XMLSchema#integer' ELSE '' END AS dtype,
  CASE WHEN doc_id % 6 = 2
       THEN CASE WHEN doc_id % 2 = 0 THEN 'en' ELSE 'fr' END
       ELSE '' END AS lang
FROM documents
"""

    # GE-record roundtrip: dyadic-rational vectors are exact in float64
    # wire bytes AND in the oracle's double arithmetic
    sql["kg_core_ge_msgpack"] = """
SELECT 'doc-' || (doc_id % 7) AS id,
       'default' AS collection,
       'http://ex/e' || doc_id AS entity,
       u.pos, u.value
FROM documents,
  LATERAL (
    SELECT 0 AS pos, doc_id / 4.0 AS value
    UNION ALL SELECT 1, -doc_id / 8.0
    UNION ALL SELECT 2, (doc_id % 16) / 2.0
  ) u
"""

    # Structured ingest: the planted CSV text is synthesized from doc_id,
    # so every parsed + transformed output value is reconstructed
    # analytically — trim/upper/title/to_int/to_float results written
    # out directly, the quoted-comma field proving the seam ran a real
    # CSV parser (a naive split would shear 'beta, N' apart)
    sql["structured_ingest"] = """
WITH r AS (
  SELECT doc_id, u.rec_idx,
    CASE WHEN u.rec_idx = 0 THEN 'ALPHA ' || doc_id
         ELSE 'BETA, ' || doc_id END AS name,
    CASE WHEN u.rec_idx = 0 THEN (doc_id % 100)::VARCHAR
         ELSE 'bad' || doc_id END AS quantity,
    CASE WHEN u.rec_idx = 0 THEN doc_id || '.5' ELSE '' END AS price,
    CASE WHEN u.rec_idx = 0 THEN 'Mixed Case Text ' || doc_id
         ELSE 'Second Row ' || doc_id END AS label,
    NULL::VARCHAR AS ghost
  FROM documents, (SELECT 0 AS rec_idx UNION ALL SELECT 1) u
)
SELECT 'parsed-' || row_number() OVER (ORDER BY doc_id, rec_idx) AS object_id,
  'item' AS schema_name, 'kb' AS collection,
  CAST(0.75 AS DOUBLE) AS confidence,
  doc_id, CAST(rec_idx AS BIGINT) AS rec_idx,
  name, quantity, price, label, ghost
FROM r
"""

    # sha256 -> every-2nd-hex-char -> UUID formula, presence gates
    # replayed per field (the reference's builtin-id identifier bug is
    # fixed on both sides: subject = document URI)
    _SO = "https://schema.org/"
    sql["doc_library_triples"] = r"""
WITH ku AS (
  SELECT doc_id, source,
    'https://trustgraph.ai/doc/' || concat(
      substr(h,1,8),'-',substr(h,9,4),'-',substr(h,13,4),'-',
      substr(h,17,4),'-',substr(h,21,12)) AS doc_uri,
    CASE WHEN doc_id % 2 = 0 THEN 'https://trustgraph.ai/pubev/' || concat(
      substr(hp,1,8),'-',substr(hp,9,4),'-',substr(hp,13,4),'-',
      substr(hp,17,4),'-',substr(hp,21,12)) END AS pub_uri,
    CASE WHEN doc_id % 2 = 0 AND doc_id % 4 = 0
         THEN 'https://trustgraph.ai/org/' || concat(
      substr(ho,1,8),'-',substr(ho,9,4),'-',substr(ho,13,4),'-',
      substr(ho,17,4),'-',substr(ho,21,12)) END AS org_uri
  FROM (
    SELECT *,
      regexp_replace(sha256('document-' || doc_id), '(.)(.)', '\1', 'g') AS h,
      regexp_replace(sha256('pub-' || doc_id), '(.)(.)', '\1', 'g') AS hp,
      regexp_replace(sha256('org-' || (doc_id % 7)), '(.)(.)', '\1', 'g') AS ho
    FROM documents
  )
)
SELECT doc_uri AS s, '{IS_A}' AS p, '{SO}DigitalDocument' AS o, 'u' AS otype FROM ku
UNION ALL SELECT doc_uri, '{LABEL}', 'Document ' || doc_id, 'l' FROM ku WHERE doc_id % 11 <> 0
UNION ALL SELECT doc_uri, '{SO}name', 'Document ' || doc_id, 'l' FROM ku WHERE doc_id % 11 <> 0
UNION ALL SELECT doc_uri, '{SO}identifier', 'ident-' || doc_id, 'l' FROM ku WHERE doc_id % 7 <> 0
UNION ALL SELECT doc_uri, '{SO}description', 'from ' || source, 'l' FROM ku WHERE doc_id % 3 <> 0
UNION ALL SELECT doc_uri, '{SO}copyrightHolder', 'Holder ' || (doc_id % 5), 'l' FROM ku WHERE doc_id % 2 = 0
UNION ALL SELECT doc_uri, '{SO}copyrightYear', (1990 + doc_id % 30)::VARCHAR, 'l' FROM ku WHERE doc_id % 4 <> 0
UNION ALL SELECT doc_uri, '{SO}license', CASE WHEN doc_id % 3 = 0 THEN 'CC-BY' ELSE 'MIT' END, 'l' FROM ku WHERE doc_id % 3 <> 2
UNION ALL SELECT doc_uri, '{SO}keywords', 'kw' || (doc_id % 9), 'l' FROM ku WHERE doc_id % 13 <> 0
UNION ALL SELECT doc_uri, '{SO}keywords', 'topic' || (doc_id % 4), 'l' FROM ku WHERE doc_id % 13 <> 0
UNION ALL SELECT doc_uri, '{SO}publication', pub_uri, 'u' FROM ku WHERE pub_uri IS NOT NULL
UNION ALL SELECT doc_uri, '{SO}url', 'https://example.org/doc/' || doc_id, 'u' FROM ku WHERE doc_id % 5 <> 0
UNION ALL SELECT pub_uri, '{IS_A}', '{SO}PublicationEvent', 'u' FROM ku WHERE pub_uri IS NOT NULL
UNION ALL SELECT pub_uri, '{LABEL}', 'Pub ' || (doc_id % 17), 'l' FROM ku WHERE pub_uri IS NOT NULL
UNION ALL SELECT pub_uri, '{SO}name', 'Pub ' || (doc_id % 17), 'l' FROM ku WHERE pub_uri IS NOT NULL
UNION ALL SELECT pub_uri, '{SO}publishedBy', org_uri, 'u' FROM ku WHERE org_uri IS NOT NULL
UNION ALL SELECT pub_uri, '{SO}startDate', (1970 + doc_id % 30)::VARCHAR, 'l' FROM ku WHERE pub_uri IS NOT NULL
UNION ALL SELECT pub_uri, '{SO}endDate', '2001', 'l' FROM ku WHERE pub_uri IS NOT NULL AND doc_id % 6 = 0
UNION ALL SELECT org_uri, '{IS_A}', '{SO}Organization', 'u' FROM ku WHERE org_uri IS NOT NULL
UNION ALL SELECT org_uri, '{LABEL}', 'Org ' || (doc_id % 7), 'l' FROM ku WHERE org_uri IS NOT NULL
UNION ALL SELECT org_uri, '{SO}name', 'Org ' || (doc_id % 7), 'l' FROM ku WHERE org_uri IS NOT NULL
UNION ALL SELECT org_uri, '{SO}description', 'descr ' || (doc_id % 7), 'l' FROM ku WHERE org_uri IS NOT NULL AND doc_id % 8 = 0
""".replace("{IS_A}", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type") \
   .replace("{LABEL}", RDF_LABEL).replace("{SO}", _SO)

    _gopher_stops = ", ".join(
        f"'{w}'" for w in
        ("the", "be", "to", "of", "and", "that", "have", "with"))

    def _sdiv(num, den):
        return (f"round(CASE WHEN {den} > 0 THEN ({num})::DOUBLE / ({den}) "
                f"ELSE 0.0 END, 4)")

    sql["gopher_metrics"] = f"""
WITH t AS (
  SELECT doc_id, text,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w,
         list_filter(list_transform(string_split(text, chr(10)),
                                    x -> trim(x)), x -> x <> '') AS ln
  FROM documents
), m AS (
  SELECT doc_id,
         len(w) AS nw,
         coalesce(list_sum(list_transform(w, x -> length(x))), 0) AS wc,
         len(ln) AS nl,
         coalesce(list_sum(list_transform(ln, x -> length(x))), 0) AS lc,
         coalesce(list_sum(list_transform(list_distinct(ln),
                                          x -> length(x))), 0) AS dlc,
         len(list_distinct(ln)) AS ndl,
         length(text) - length(replace(text, '#', ''))
           + len(regexp_extract_all(text, '\\.\\.\\.'))
           + length(text) - length(replace(text, '…', '')) AS nsym,
         len(list_filter(ln, x -> regexp_matches(x, '^[•‣▶*\\-]')))
           AS nbul,
         len(list_filter(ln, x -> ends_with(x, '...') OR ends_with(x, '…')))
           AS nell,
         len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]'))) AS nalpha,
         len(list_filter([{_gopher_stops}],
                         s -> list_contains(w, s))) AS swh
  FROM t
), r AS (
  SELECT doc_id,
         nw::BIGINT AS n_words,
         {_sdiv('wc', 'nw')} AS mean_word_len,
         {_sdiv('nsym', 'nw')} AS symbol_word_ratio,
         {_sdiv('nbul', 'nl')} AS bullet_line_fraction,
         {_sdiv('nell', 'nl')} AS ellipsis_line_fraction,
         {_sdiv('nalpha', 'nw')} AS alpha_word_fraction,
         swh::BIGINT AS stopword_hits,
         {_sdiv('nl - ndl', 'nl')} AS duplicate_line_fraction,
         {_sdiv('lc - dlc', 'lc')} AS duplicate_line_char_fraction
  FROM m
)
SELECT *,
       (n_words BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND symbol_word_ratio <= 0.1
        AND bullet_line_fraction <= 0.9
        AND ellipsis_line_fraction <= 0.3
        AND alpha_word_fraction >= 0.8
        AND stopword_hits >= 2) AS gopher_pass
FROM r
"""

    from trustgraph_spark.operators.pii import CC_PATTERN, PII_PATTERNS

    _pii_base = """
  SELECT doc_id,
         text || ' mail u' || doc_id || '@ex' || (doc_id % 7) || '.org'
         || CASE WHEN doc_id % 3 = 0 THEN ' ph (555) 86' || (doc_id % 10)
              || '-' || lpad((doc_id % 10000)::VARCHAR, 4, '0')
            ELSE '' END
         || CASE WHEN doc_id % 4 = 1 THEN ' ip 10.' || (doc_id % 256)
              || '.' || ((doc_id * 7) % 256) || '.' || (doc_id % 100)
            ELSE '' END
         || CASE WHEN doc_id % 5 = 2 THEN ' ssn '
              || lpad((doc_id % 1000)::VARCHAR, 3, '0') || '-'
              || lpad((doc_id % 100)::VARCHAR, 2, '0') || '-'
              || lpad((doc_id % 10000)::VARCHAR, 4, '0')
            ELSE '' END
         || CASE WHEN doc_id % 2 = 0 THEN ' card '
              || (['4111 1111 1111 1111', '5500-0000-0000-0004',
                   '4539148803436467', '378282246310005',
                   '1234 5678 9012 3456'])[(doc_id % 5) + 1]
            ELSE '' END AS text
  FROM documents
"""

    # Luhn over a candidate string <C>, separators stripped
    _luhn = (
        "(length(regexp_replace(<C>, '[ -]', '', 'g')) >= 13 AND "
        "list_sum(list_transform("
        "generate_series(1, length(regexp_replace(<C>, '[ -]', '', 'g'))), "
        "i -> CASE WHEN i % 2 = 0 THEN "
        "CASE WHEN substr(regexp_replace(<C>, '[ -]', '', 'g'), "
        "length(regexp_replace(<C>, '[ -]', '', 'g')) - i + 1, 1)::INT * 2 > 9 "
        "THEN substr(regexp_replace(<C>, '[ -]', '', 'g'), "
        "length(regexp_replace(<C>, '[ -]', '', 'g')) - i + 1, 1)::INT * 2 - 9 "
        "ELSE substr(regexp_replace(<C>, '[ -]', '', 'g'), "
        "length(regexp_replace(<C>, '[ -]', '', 'g')) - i + 1, 1)::INT * 2 END "
        "ELSE substr(regexp_replace(<C>, '[ -]', '', 'g'), "
        "length(regexp_replace(<C>, '[ -]', '', 'g')) - i + 1, 1)::INT END"
        ")) % 10 = 0)"
    )

    sql["pii_profile"] = ("""
WITH d AS (<BASE>),
cc AS (SELECT doc_id, text,
              regexp_extract_all(text, '<CC>') AS cands
       FROM d)
SELECT doc_id,
       len(regexp_extract_all(text, '<EMAIL>'))::BIGINT AS n_email,
       len(regexp_extract_all(text, '<PHONE>'))::BIGINT AS n_phone,
       len(regexp_extract_all(text, '<IPV4>'))::BIGINT AS n_ipv4,
       len(regexp_extract_all(text, '<SSN>'))::BIGINT AS n_ssn,
       len(cands)::BIGINT AS n_cc_shaped,
       len(list_filter(cands, c -> <LUHN_C>))::BIGINT AS n_cc_valid,
       (len(regexp_extract_all(text, '<EMAIL>'))
        + len(regexp_extract_all(text, '<PHONE>'))
        + len(regexp_extract_all(text, '<IPV4>'))
        + len(regexp_extract_all(text, '<SSN>'))
        + len(cands)) > 0 AS has_pii
FROM cc
"""
        .replace("<BASE>", _pii_base)
        .replace("<LUHN_C>", _luhn.replace("<C>", "c"))
        .replace("<EMAIL>", PII_PATTERNS["email"])
        .replace("<PHONE>", PII_PATTERNS["phone"])
        .replace("<IPV4>", PII_PATTERNS["ipv4"])
        .replace("<SSN>", PII_PATTERNS["ssn"])
        .replace("<CC>", CC_PATTERN))

    sql["pii_redact"] = ("""
WITH d AS (<BASE>),
r AS (SELECT doc_id, text,
             regexp_replace(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(text,
                 '<EMAIL>', '[AT]', 'g'),
                 '<PHONE>', '[PH]', 'g'),
                 '<IPV4>', '[IP]', 'g'),
                 '<SSN>', '[ID]', 'g'),
                 '<CC>', '[CD]', 'g') AS step
      FROM d)
SELECT doc_id,
       replace(replace(replace(replace(replace(step,
         '[AT]', '<EMAIL_PH>'), '[PH]', '<PHONE_PH>'), '[IP]', '<IP_PH>'),
         '[ID]', '<SSN_PH>'), '[CD]', '<CARD_PH>') AS redacted,
       (length(text) - length(replace(replace(replace(replace(replace(step,
         '[AT]', '<EMAIL_PH>'), '[PH]', '<PHONE_PH>'), '[IP]', '<IP_PH>'),
         '[ID]', '<SSN_PH>'), '[CD]', '<CARD_PH>')))::BIGINT AS chars_delta
FROM r
"""
        .replace("<BASE>", _pii_base)
        .replace("<EMAIL>", PII_PATTERNS["email"])
        .replace("<PHONE>", PII_PATTERNS["phone"])
        .replace("<IPV4>", PII_PATTERNS["ipv4"])
        .replace("<SSN>", PII_PATTERNS["ssn"])
        .replace("<CC>", CC_PATTERN)
        .replace("<EMAIL_PH>", "<EMAIL>")
        .replace("<PHONE_PH>", "<PHONE>")
        .replace("<IP_PH>", "<IP>")
        .replace("<SSN_PH>", "<SSN>")
        .replace("<CARD_PH>", "<CARD>"))

    _lined_base = """
  SELECT doc_id,
         concat_ws(chr(10),
           'COOKIE NOTICE please accept',
           substr(text, 1, 120),
           'footer ' || (doc_id % 7),
           CASE WHEN doc_id % 3 = 0 THEN '  '
                ELSE 'tail ' || doc_id END)
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || 'COOKIE NOTICE please accept'
                 ELSE '' END AS text
  FROM documents
"""

    _lined_lines = """
  SELECT doc_id, i - 1 AS line_pos, ln[i] AS line, trim(ln[i]) AS key
  FROM (SELECT doc_id, string_split(text, chr(10)) AS ln FROM d),
       unnest(generate_series(1, len(ln))) AS u(i)
"""

    _toks_expr = ("len(list_filter(regexp_split_to_array(text, '\\s+'), "
                  "x -> x <> ''))")
    _mix_case = ("CASE source "
                 + " ".join(f"WHEN '{s}' THEN {f}::DOUBLE"
                            for s, f in _MIX_TARGETS.items())
                 + " ELSE 0.0::DOUBLE END")

    sql["source_stats"] = f"""
WITH per AS (
  SELECT source, count(*) AS n_docs, sum({_toks_expr}) AS n_tokens,
         sum(length(text)) AS n_chars
  FROM documents GROUP BY source
), tot AS (SELECT sum(n_docs) AS td, sum(n_tokens) AS tt FROM per)
SELECT source, n_docs::BIGINT AS n_docs, n_tokens::BIGINT AS n_tokens,
       n_chars::BIGINT AS n_chars,
       round(n_docs / td, 6) AS doc_frac,
       round(n_tokens / tt, 6) AS token_frac
FROM per, tot
"""

    sql["sample_to_mix"] = f"""
WITH toks AS (
  SELECT doc_id, source, {_toks_expr} AS toks FROM documents
), per AS (
  SELECT source, sum(toks) AS src_tokens FROM toks GROUP BY source
), tot AS (SELECT sum(src_tokens)::DOUBLE AS budget FROM per),
rates AS (
  SELECT source, ({_mix_case} * budget) / src_tokens AS rate
  FROM per, tot
), d AS (
  SELECT t.doc_id, t.source, r.rate,
         ('0x' || substr(md5('mix' || t.doc_id), 1, 8))::UBIGINT::DOUBLE
           / 4294967296.0 AS u
  FROM toks t JOIN rates r USING (source)
), n AS (
  SELECT doc_id, source, rate,
         (floor(rate) + CASE WHEN u < rate - floor(rate) THEN 1 ELSE 0 END)
           ::INT AS n_copies
  FROM d
)
SELECT doc_id, source, e.epoch::BIGINT AS epoch,
       round(rate, 6) AS rate
FROM n, unnest(generate_series(1, n_copies)) AS e(epoch)
WHERE n_copies > 0
"""

    sql["span_dedup"] = """
WITH d AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 4 = 0
           THEN ' shared span alpha beta gamma delta epsilon zeta eta theta'
           ELSE '' END AS text
  FROM documents
), t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM d
), tok AS (
  SELECT doc_id, i - 1 AS idx, w[i] AS token
  FROM t, unnest(generate_series(1, len(w))) AS u(i)
), occ AS (
  SELECT doc_id, i - 1 AS start,
         md5(array_to_string(w[i:i+7], ' ')) AS h
  FROM t, unnest(generate_series(1, greatest(len(w) - 7, 0))) AS u(i)
), dup AS (
  SELECT h, min(doc_id * 100000 + start) AS ford
  FROM occ GROUP BY h HAVING count(*) >= 2
), cov AS (
  SELECT DISTINCT o.doc_id, o.start + k.k AS idx
  FROM occ o JOIN dup ON o.h = dup.h,
       unnest(generate_series(0, 7)) AS k(k)
  WHERE o.doc_id * 100000 + o.start <> dup.ford
), kept AS (
  SELECT tok.doc_id, tok.idx, tok.token
  FROM tok LEFT JOIN cov
    ON tok.doc_id = cov.doc_id AND tok.idx = cov.idx
  WHERE cov.idx IS NULL
), ka AS (
  SELECT doc_id, string_agg(token, ' ' ORDER BY idx) AS text,
         count(*) AS nk
  FROM kept GROUP BY doc_id
), tt AS (SELECT doc_id, len(w) AS nt FROM t)
SELECT tt.doc_id, coalesce(ka.text, '') AS text,
       coalesce(ka.nk, 0)::BIGINT AS n_tokens_kept,
       (tt.nt - coalesce(ka.nk, 0))::BIGINT AS n_tokens_removed
FROM tt LEFT JOIN ka USING (doc_id)
"""

    sql["iam_authorise"] = """
WITH u AS (
  SELECT 'u' || doc_id AS uid,
         'ws' || (doc_id % 4) AS assigned,
         doc_id % 5 AS rg,
         (doc_id % 7 <> 0) AS enabled
  FROM documents
), c AS (
  SELECT doc_id AS check_id,
         CASE WHEN doc_id % 11 = 0 THEN 'missing' || doc_id
              ELSE 'u' || doc_id END AS uid,
         doc_id % 4 AS cg,
         CASE WHEN doc_id % 6 = 0 THEN NULL
              ELSE 'ws' || (doc_id % 3) END AS target
  FROM documents
)
SELECT c.check_id AS check_id,
       COALESCE(u.enabled AND (
             (c.cg = 0 AND ((u.rg IN (0, 1, 3)
                             AND (c.target IS NULL
                                  OR c.target = u.assigned))
                            OR u.rg = 2))
          OR (c.cg = 1 AND ((u.rg = 1
                             AND (c.target IS NULL
                                  OR c.target = u.assigned))
                            OR u.rg = 2))
          OR (c.cg = 2 AND u.rg = 2)
       ), FALSE) AS allow,
       CAST(60 AS INTEGER) AS ttl
FROM c LEFT JOIN u ON c.uid = u.uid
"""

    sql["iam_resolve_keys"] = """
WITH u AS (
  SELECT 'u' || doc_id AS uid,
         'ws' || (doc_id % 3) AS ws,
         CASE WHEN doc_id % 5 = 0 THEN 'reader,writer'
              WHEN doc_id % 5 = 1 THEN 'admin'
              WHEN doc_id % 5 <= 3 THEN 'reader'
              ELSE '' END AS roles_csv,
         (doc_id % 7 <> 0) AS enabled
  FROM documents
), k AS (
  SELECT sha256('tg_key' || doc_id) AS key_hash,
         CASE WHEN doc_id % 13 = 0 THEN 'nouser' || doc_id
              ELSE 'u' || doc_id END AS owner,
         CASE WHEN doc_id % 6 = 0 THEN 1000
              WHEN doc_id % 6 = 4 THEN 4102444800 END AS expires_epoch
  FROM documents WHERE doc_id % 2 = 0
), w AS (
  SELECT 'ws' || i AS wid, (i <> 2) AS enabled
  FROM (VALUES (0), (1), (2)) t(i)
), r AS (
  SELECT doc_id AS req_id,
         CASE WHEN doc_id % 2 = 0 THEN 'tg_key' || doc_id
              WHEN doc_id % 4 = 1 THEN 'tg_missing' || doc_id END AS api_key
  FROM documents
), j AS (
  SELECT r.req_id, r.api_key, k.key_hash, k.owner, k.expires_epoch,
         u.ws, u.roles_csv, u.enabled AS u_enabled,
         w.enabled AS w_enabled
  FROM r LEFT JOIN k ON sha256(r.api_key) = k.key_hash
         LEFT JOIN u ON k.owner = u.uid
         LEFT JOIN w ON u.ws = w.wid
), v AS (
  SELECT *,
         CASE WHEN api_key IS NULL OR api_key = '' THEN 'no api key'
              WHEN key_hash IS NULL THEN 'unknown api key'
              WHEN expires_epoch IS NOT NULL
                   AND expires_epoch < 1700000000 THEN 'api key expired'
              WHEN u_enabled IS NULL THEN 'owning user missing'
              WHEN NOT u_enabled THEN 'owning user disabled'
              WHEN w_enabled IS NULL OR NOT w_enabled
                   THEN 'owning workspace disabled'
              ELSE '' END AS error
  FROM j
)
SELECT req_id, error,
       CASE WHEN error = '' THEN owner ELSE '' END AS user_id,
       CASE WHEN error = '' THEN ws ELSE '' END AS default_workspace,
       CASE WHEN error = '' THEN roles_csv ELSE '' END AS roles_csv
FROM v
"""

    sql["bootstrap_state"] = """
WITH log AS (
  SELECT 'd' || (doc_id % 40) AS deployment,
         CASE doc_id % 3 WHEN 0 THEN 'template-seed'
              WHEN 1 THEN 'workspace-init'
              ELSE 'default-flow' END AS name,
         CASE WHEN doc_id % 2 = 0 THEN '"v1"' ELSE 'v2' END AS value,
         doc_id AS seq,
         (doc_id % 17 = 0) AS deleted
  FROM documents
), cur AS (
  SELECT deployment, name,
         CASE WHEN json_valid(value)
              THEN json_extract_string(value, '$')
              ELSE value END AS value
  FROM (
    SELECT *, row_number() OVER (
      PARTITION BY deployment, name ORDER BY seq DESC) AS rn
    FROM log)
  WHERE rn = 1 AND NOT deleted
), specs(name, flag) AS (
  VALUES ('template-seed', 'v1'), ('workspace-init', 'v2'),
         ('default-flow', 'v1')
), deps AS (
  SELECT DISTINCT deployment FROM log
), verd AS (
  SELECT d.deployment, s.name,
         CASE WHEN c.value = s.flag THEN 'skip'
              ELSE 'run' END AS verdict
  FROM deps d CROSS JOIN specs s
  LEFT JOIN cur c ON c.deployment = d.deployment AND c.name = s.name
), cad AS (
  SELECT deployment,
         CASE WHEN bool_or(verdict = 'run') THEN 15
              ELSE 300 END AS sleep_for
  FROM verd GROUP BY deployment
)
SELECT v.deployment, v.name, v.verdict,
       CAST(c.sleep_for AS INTEGER) AS sleep_for
FROM verd v JOIN cad c USING (deployment)
"""

    sql["pack_blocks"] = """
WITH t AS (
  SELECT doc_id,
         len(list_filter(regexp_split_to_array(lower(text), '\\s+'),
                         x -> x <> ''))::BIGINT AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, n_tokens,
         (sum(n_tokens) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          - n_tokens)::BIGINT AS start_tok
  FROM t
)
SELECT doc_id, n_tokens, start_tok,
       (start_tok // 2048)::BIGINT AS start_block,
       CASE WHEN n_tokens > 0
            THEN ((start_tok + n_tokens - 1) // 2048)::BIGINT
            ELSE (start_tok // 2048)::BIGINT END AS end_block
FROM c
"""

    sql["lm_quality"] = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), tok AS (
  SELECT doc_id, tk FROM t, unnest(w) AS u(tk)
), freq AS (
  SELECT tk AS token, count(*) AS cnt FROM tok
  GROUP BY tk ORDER BY cnt DESC, token LIMIT 30
), tot AS (SELECT count(*)::DOUBLE AS total FROM tok),
scored AS (
  SELECT s.doc_id, f.cnt,
         CASE WHEN f.cnt IS NOT NULL THEN ln(f.cnt / total)
              ELSE ln(0.5 / total) END AS logp
  FROM tok s LEFT JOIN freq f ON s.tk = f.token, tot
), agg AS (
  SELECT doc_id, count(*) AS n_tokens,
         sum(CASE WHEN cnt IS NULL THEN 1 ELSE 0 END) AS n_oov,
         round(avg(logp), 6) AS mean_logprob
  FROM scored GROUP BY doc_id
)
SELECT t.doc_id,
       coalesce(agg.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(agg.n_oov, 0)::BIGINT AS n_oov,
       coalesce(agg.mean_logprob, 0.0) AS mean_logprob
FROM t LEFT JOIN agg USING (doc_id)
"""

    sql["dedup_resolve"] = """
WITH RECURSIVE d AS (SELECT doc_id FROM documents),
p AS (
  SELECT doc_id AS a, doc_id - 1 AS b FROM d
  WHERE doc_id % 10 IN (1, 2, 3, 4)
),
bidir AS (
  SELECT a AS u, b AS v FROM p UNION ALL SELECT b, a FROM p
),
reach(node, comp) AS (
  SELECT u, u FROM bidir
  UNION
  SELECT b.v, r.comp FROM reach r JOIN bidir b ON b.u = r.node
),
cc AS (SELECT node, min(comp) AS canonical FROM reach GROUP BY node),
res AS (
  SELECT d.doc_id, coalesce(cc.canonical, d.doc_id) AS canonical_id
  FROM d LEFT JOIN cc ON cc.node = d.doc_id
),
sizes AS (
  SELECT canonical_id, count(*) AS cluster_size FROM res
  GROUP BY canonical_id
)
SELECT r.doc_id, r.canonical_id::BIGINT AS canonical_id,
       s.cluster_size::BIGINT AS cluster_size,
       r.doc_id = r.canonical_id AS is_canonical
FROM res r JOIN sizes s USING (canonical_id)
"""

    sql["decontam_13gram"] = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), dg AS (
  SELECT doc_id,
         list_distinct(list_transform(
           generate_series(1, greatest(len(w) - 12, 0)),
           i -> md5(array_to_string(w[i:i+12], ' ')))) AS gs
  FROM t
), eg AS (
  SELECT doc_id // 25 AS eval_id, w[6:25] AS ew FROM t
  WHERE doc_id % 25 = 0
), egx AS (
  SELECT DISTINCT eval_id, g
  FROM (SELECT eval_id,
               list_transform(
                 generate_series(1, greatest(len(ew) - 12, 0)),
                 i -> md5(array_to_string(ew[i:i+12], ' '))) AS gs
        FROM eg), unnest(gs) AS u(g)
), dgx AS (
  SELECT doc_id, g FROM dg, unnest(gs) AS u(g)
), agg AS (
  SELECT d.doc_id,
         count(DISTINCT d.g) AS n_grams,
         count(DISTINCT CASE WHEN e.eval_id IS NOT NULL THEN d.g END)
           AS n_overlap,
         count(DISTINCT e.eval_id) AS n_eval_docs
  FROM dgx d LEFT JOIN egx e ON d.g = e.g
  GROUP BY d.doc_id
)
SELECT dg.doc_id,
       coalesce(agg.n_grams, 0)::BIGINT AS n_grams,
       coalesce(agg.n_overlap, 0)::BIGINT AS n_overlap,
       round(CASE WHEN coalesce(agg.n_grams, 0) > 0
                  THEN agg.n_overlap / agg.n_grams ELSE 0.0 END, 6)
         AS overlap_frac,
       coalesce(agg.n_eval_docs, 0)::BIGINT AS n_eval_docs,
       coalesce(agg.n_overlap, 0) > 0 AS contaminated
FROM dg LEFT JOIN agg USING (doc_id)
"""

    sql["line_dedup_clean"] = f"""
WITH d AS ({_lined_base}),
l AS ({_lined_lines}),
c AS (
  SELECT key AS k2, count(*) AS cnt,
         min(doc_id * 100000 + line_pos) AS first_ord
  FROM l WHERE key <> '' GROUP BY key
),
f AS (
  SELECT l.doc_id, l.line_pos, l.line,
         CASE WHEN l.key = '' THEN false
              WHEN c.cnt IS NULL THEN false
              ELSE (l.doc_id * 100000 + l.line_pos) <> c.first_ord
         END AS dropped
  FROM l LEFT JOIN c ON l.key = c.k2 AND c.cnt >= 2
)
SELECT doc_id,
       coalesce(string_agg(CASE WHEN NOT dropped THEN line END, chr(10)
                           ORDER BY line_pos), '') AS text,
       (count(*) FILTER (WHERE NOT dropped))::BIGINT AS n_lines_kept,
       (count(*) FILTER (WHERE dropped))::BIGINT AS n_lines_dropped
FROM f GROUP BY doc_id
"""

    sql["line_dedup_stats"] = f"""
WITH d AS ({_lined_base}),
l AS ({_lined_lines})
SELECT key AS line_key,
       count(*)::BIGINT AS n_occurrences,
       (min(doc_id * 100000 + line_pos) // 100000)::BIGINT AS first_doc_id,
       (min(doc_id * 100000 + line_pos) % 100000)::BIGINT AS first_line_pos
FROM l WHERE key <> ''
GROUP BY key HAVING count(*) >= 2
"""

    sql["ngram_repetition"] = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(lower(text), '\\s+'),
                     x -> x <> '') AS w
  FROM documents
), b AS (
  SELECT doc_id, length(array_to_string(w, ' ')) AS denom, w FROM t
), g AS (
  SELECT b.doc_id, b.denom, u.n AS n,
         array_to_string(b.w[v.i:v.i + u.n - 1], ' ') AS gram
  FROM b,
       unnest([2, 3, 4]) AS u(n),
       unnest(generate_series(1, len(b.w) - u.n + 1)) AS v(i)
  WHERE len(b.w) >= u.n
), c AS (
  SELECT doc_id, denom, n, gram, count(*) AS cnt
  FROM g GROUP BY ALL
), r AS (
  SELECT doc_id, denom, n,
         max(cnt * length(gram)) AS top_chars,
         sum(CASE WHEN cnt > 1 THEN cnt * length(gram) ELSE 0 END)
           AS dup_chars
  FROM c GROUP BY ALL
)
SELECT doc_id, n::BIGINT AS n,
       {_sdiv('top_chars', 'denom')} AS top_ngram_char_frac,
       {_sdiv('dup_chars', 'denom')} AS dup_ngram_char_frac
FROM r
"""

    return sql
