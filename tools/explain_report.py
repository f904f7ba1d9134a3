"""Generate EXPLAIN.md: formatted physical plans of the key operators, with
commentary on the plan properties that matter at 100 TB (pushdown, pruning,
broadcast, codegen, shuffle placement)."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F


def main() -> None:
    from trustgraph_spark.constants import RDF_LABEL
    from trustgraph_spark.operators.algebra import Var, bgp
    from trustgraph_spark.operators.chunking import assemble_turn_chunks
    from trustgraph_spark.operators.extract import (
        RuleExtractor,
        definitions_to_triples,
        extract_definitions,
    )
    from trustgraph_spark.operators.materialize import (
        materialize_edges,
        materialize_quads_by_entity,
    )
    from trustgraph_spark.operators.triples_query import match_triples
    from trustgraph_spark.session import get_spark
    from trustgraph_spark.synth import SynthSpec, synth_transcripts

    spark = get_spark(cores=8)
    import tempfile

    tmp = tempfile.mkdtemp()
    tr = synth_transcripts(spark, SynthSpec(n_convs=50, turns_per_conv=10, hot_factor=2))
    edges = materialize_edges(
        definitions_to_triples(
            extract_definitions(assemble_turn_chunks(tr), RuleExtractor())
        )
    )
    edges.write.mode("overwrite").parquet(f"{tmp}/edges")
    e = spark.read.parquet(f"{tmp}/edges")

    sections = []

    def add(title: str, note: str, df) -> None:
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        sections.append(f"## {title}\n\n{note}\n\n```\n{plan.strip()}\n```\n")

    add(
        "Triple-pattern query (Q1)",
        "Both equality predicates reach the parquet scan (`PushedFilters`), "
        "and only the projected columns are read (`ReadSchema`) — at 100 TB "
        "this is the difference between a partition-pruned point read and a "
        "full scan.",
        match_triples(e, p=RDF_LABEL, g="").select("s", "o"),
    )

    add(
        "SPARQL BGP two-pattern join (A1)",
        "Each pattern is a filtered scan; the shared variable becomes the "
        "join key. No cartesian product; Catalyst picks the join strategy "
        "(AQE re-plans by runtime size).",
        bgp(
            e,
            [
                (Var("x"), RDF_LABEL, Var("l")),
                (Var("x"), "http://www.w3.org/2004/02/skos/core#definition", Var("d")),
            ],
        ),
    )

    add(
        "Edges manifest dedup (M2)",
        "PK-upsert dedup as a hash aggregate on a 128-bit fixed-width key "
        "(two chained xxhash64) — partial aggregation map-side, one shuffle "
        "of the quad rows, no variable-length multi-column grouping key.",
        materialize_edges(e.select("collection", "g", "s", "p", "o", "otype", "dtype", "lang")),
    )

    add(
        "Entity-centric role explosion (M1)",
        "A single narrow Generate (explode) inside whole-stage codegen — "
        "4/5x write amplification with zero shuffle.",
        materialize_quads_by_entity(e),
    )

    from trustgraph_spark.operators.linking import canonicalize_triples

    mapping = spark.createDataFrame(
        [("http://x", "http://y")], "uri string, canonical_uri string"
    )
    add(
        "Canonical URI rewrite",
        "The mapping is a broadcast dimension: two BroadcastHashJoins, the "
        "triple fact side never shuffles.",
        canonicalize_triples(e, mapping),
    )

    from trustgraph_spark.sparql import sparql_select

    add(
        "SPARQL string query (parser + compiler, one Catalyst plan)",
        "A SPARQL SELECT string compiles to the same pushed-down scans and "
        "joins as the programmatic combinators — the string front-end adds "
        "zero plan overhead: constants in the BGP reach the parquet scan as "
        "PushedFilters, the FILTER becomes a Catalyst Filter, the aggregate "
        "hash-aggregates with map-side partial combine.",
        sparql_select(
            e,
            f"SELECT ?x (COUNT(?l) AS ?n) WHERE {{ ?x <{RDF_LABEL}> ?l }} "
            "GROUP BY ?x",
        ),
    )

    from trustgraph_spark.pipeline import Warehouse

    wh = Warehouse(spark, f"{tmp}/wh")
    bt = wh.write_bucketed(e, "kg_edges_bucketed_x", ["s"], buckets=8,
                           sort_cols=["s", "p", "o"])
    old_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    add(
        "Bucketed quad store self-join (entity-PK layout)",
        "The edges table bucketed by `s` (the Spark analog of the "
        "reference's entity-partition-key Cassandra layout): an entity-"
        "keyed self-join reads co-located buckets — NO Exchange anywhere "
        "in the plan. At 100 TB this removes the dominant shuffle from "
        "every per-entity access pattern.",
        bt.alias("a").join(
            bt.select(F.col("s"), F.col("o").alias("o2")).alias("b"), "s"
        ),
    )
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
    spark.sql("DROP TABLE IF EXISTS kg_edges_bucketed_x")

    from trustgraph_spark.operators.dedup import embedding_near_dup_pairs

    emb = spark.createDataFrame(
        [(i, [float(i % 7), 1.0, 0.5, -0.25] * 16) for i in range(50)],
        "vec_id long, embedding array<double>",
    )
    add(
        "Embedding near-dup (hyperplane-bucketed self-join)",
        "Candidate generation is an equi-join on the 8-bit hyperplane "
        "signature — the self-join is bounded by bucket sizes, never "
        "all-pairs; the cosine verify runs only inside buckets.",
        embedding_near_dup_pairs(emb, threshold=0.9),
    )

    from trustgraph_spark.operators.dedup import ngram_jaccard_pairs_prefix

    docs = spark.createDataFrame(
        [(i, f"text body number {i % 9} repeated tokens {i % 5}") for i in range(60)],
        "doc_id long, text string",
    )
    add(
        "n-gram Jaccard near-dup (PPJoin prefix index, hashed shingles)",
        "Shingles are hashed to 64-bit keys immediately (every shuffle "
        "moves longs, not strings); the inverted index holds only each "
        "document's rarest-first PREFIX, the join applies the AllPairs "
        "length filter before the candidate distinct, and verification is "
        "one array_intersect over the two kept-shingle arrays — no "
        "pair-x-shingle shuffle anywhere.",
        ngram_jaccard_pairs_prefix(docs, threshold=0.5, max_shingle_freq=100),
    )

    # --- DocumentRAG dense retrieve -----------------------------------------
    from trustgraph_spark.operators.docrag import (
        bm25_topk,
        document_rag_retrieve,
        keyword_index,
        store_chunk_embeddings,
    )
    from trustgraph_spark.operators.embeddings import HashEmbedder

    chunks_txt = docs.selectExpr("concat('c', doc_id) AS chunk_id", "text")
    chunk_store = store_chunk_embeddings(chunks_txt, embedder=HashEmbedder(dim=16))
    chunk_store.write.mode("overwrite").parquet(f"{tmp}/chunk_store")
    cs = spark.read.parquet(f"{tmp}/chunk_store")
    rag_q = spark.createDataFrame(
        [("q0", "alpha beta")], "query_id string, query string"
    )
    add(
        "DocumentRAG dense retrieve (DR3)",
        "The query batch (tiny) is BROADCAST against the chunk store — one "
        "corpus scan for the whole batch, no corpus shuffle; per-query "
        "ranking is a window over the broadcast-joined result. The chunk "
        "store scan reads only (collection, chunk_id, vector).",
        document_rag_retrieve(
            rag_q, cs, chunks_txt, doc_limit=3, embedder=HashEmbedder(dim=16)
        ),
        )

    add(
        "BM25 keyword query (DR4)",
        "Query terms (broadcast) semi-restrict the postings equi-join; df / "
        "n_docs / avgdl were denormalized onto the postings at index build, "
        "so query time is one join plus one per-chunk hash aggregate — no "
        "corpus-stats pass. Stored bucketed by term, the join also prunes "
        "to the query terms' buckets.",
        bm25_topk(keyword_index(chunks_txt), rag_q, limit=5),
    )

    # --- rows store point lookup --------------------------------------------
    from trustgraph_spark.operators.extract_extras import validate_rows
    from trustgraph_spark.operators.rows import rows_query, rows_store

    rfields = [
        {"name": "sku", "type": "string", "primary": True},
        {"name": "price", "type": "string", "indexed": True},
    ]
    objs = docs.selectExpr(
        "concat('{\"sku\": \"s', doc_id, '\", \"price\": \"', doc_id % 50, '\"}')"
        " AS obj_json"
    )
    rows_store(validate_rows(objs, rfields), rfields, "product").write.mode(
        "overwrite"
    ).partitionBy("collection", "schema_name", "index_name").parquet(f"{tmp}/rows")
    rstore = spark.read.parquet(f"{tmp}/rows")
    add(
        "Rows-store point lookup (R2)",
        "The (collection, schema_name, index_name) partition layout turns "
        "the Cassandra partition key into parquet `PartitionFilters` — a "
        "point lookup touches exactly one directory; index_value equality "
        "is the only data filter.",
        rows_query(rstore, rfields, "product", {"sku": "s7"}),
    )

    # --- SPARQL property path -----------------------------------------------
    from trustgraph_spark.sparql import sparql_select

    add(
        "SPARQL property path closure (paths)",
        "One closure round: the semi-naive loop extends only the previous "
        "delta against the base pairs (localCheckpoint truncates lineage "
        "between rounds, so each round's plan stays this size regardless "
        "of iteration count). Shown: the final identity-union for `*` "
        "zero-length semantics over the closure result.",
        sparql_select(
            e, f"SELECT ?x ?y WHERE {{ ?x <{RDF_LABEL}>* ?y }}"
        ),
    )

    # --- NL question -> generated SPARQL, executed --------------------------
    from trustgraph_spark.nlquery import (
        analyze_question,
        generate_sparql,
    )

    gen = generate_sparql(
        analyze_question("find all label"),
        {"classes": {"label": {}}},
        namespace="http://www.w3.org/2000/01/rdf-schema#",
    )
    add(
        "NL question -> generated SPARQL, executed (nl2sparql)",
        "The deterministic retrieval template compiles through the same "
        "Catalyst path as hand-written SPARQL: the rdf:type constant "
        "reaches the scan as a PushedFilter and the OPTIONAL label is a "
        "left outer join — question answering pays zero plan tax over "
        "the equivalent direct query.",
        sparql_select(e, gen.query),
    )

    # --- ReAct batched tool execution (agent) -------------------------------
    from trustgraph_spark.agent import agent_prov_triples, react_trace_sessions

    docs = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), F.lit("x").alias("text"),
        F.lit("en").alias("lang"), F.lit("s").alias("source"),
        F.lit(10).alias("n_chars"),
    )
    orders_df = spark.createDataFrame(
        [(0, "F"), (1, "O")], "o_orderkey long, o_orderstatus string")
    sessions = react_trace_sessions(docs, orders_df)
    add(
        "ReAct batched tool execution (react_tool_trace sessions)",
        "Tool execution for the whole agent-session batch is two "
        "map-side-combinable aggregations feeding BroadcastHashJoins "
        "against the session corpus — one plan regardless of session "
        "count, where the reference calls its backends once per request. "
        "The mapInPandas parse/dispatch seam then runs narrowly over the "
        "joined rows.",
        sessions,
    )

    from trustgraph_spark.agent import run_react_traces

    add(
        "Agent provenance emission (react_prov_triples)",
        "PROV-O triples are an inline array build + Generate explode "
        "over the trace — no exchange of its own, no Python evaluation; "
        "the only Python in the lineage is the sanctioned ReAct parse "
        "seam upstream.",
        agent_prov_triples(
            run_react_traces(sessions), timestamp="2026-01-01T00:00:00Z"
        ),
    )

    # --- Ontology-constrained extraction conversion -------------------------
    from trustgraph_spark.operators.ontology import convert_extraction_triples

    elements2 = spark.createDataFrame(
        [
            ("kb", "class", "device", None, None, None, None, None, None),
            ("kb", "class", "sensor", None, None, "device", None, None, None),
            ("kb", "objectProperty", "connects", None, None, None,
             "device", "sensor", None),
            ("kb", "datatypeProperty", "reading", None, None, None,
             "sensor", None, None),
        ],
        "ontology_id string, element_type string, element_id string, "
        "label string, comment string, subclass_of string, domain string, "
        "range string, inverse_of string",
    )
    parsed = spark.createDataFrame(
        [("c1", "relationship", None, None, "d1", "device", "connects",
          "s1", "sensor", None, None)],
        "chunk_id string, kind string, entity string, entity_type string, "
        "subject string, subject_type string, relation string, "
        "object string, object_type string, attribute string, value string",
    )
    add(
        "Ontology-constrained triple conversion (onto_extract_convert)",
        "Classes, properties, and the subClassOf ancestor closure are "
        "broadcast dimensions; domain/range enforcement is a filter over "
        "broadcast left joins, so the extraction-row corpus never "
        "shuffles and URI minting stays whole-stage codegen.",
        convert_extraction_triples(parsed, elements2, "kb"),
    )

    # --- Corpus-hygiene family (round 5b) -----------------------------------
    import __spark_entry__ as entry
    from trustgraph_spark.operators.decontam import ngram_contamination
    from trustgraph_spark.operators.linededup import corpus_line_dedup
    from trustgraph_spark.operators.mixing import sample_to_mix
    from trustgraph_spark.operators.quality import gopher_doc_metrics

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")

    add(
        "Gopher doc metrics (gopher_metrics)",
        "ONE narrow Project over the scan — no Exchange, no Python, every "
        "rule inside whole-stage codegen; at 100 TB this runs at scan "
        "speed. pii_profile/pii_redact compile to the same shape (their "
        "plan gates live in test_pii).",
        gopher_doc_metrics(docs),
    )

    add(
        "Corpus line dedup (line_dedup_clean)",
        "The duplicated-key build side (count >= 2 after a map-side-"
        "combinable partial aggregate on xxhash64(line)) broadcasts; the "
        "corpus side is Generate -> BroadcastHashJoin -> one doc_id "
        "exchange for reassembly. Hot boilerplate lines cannot skew the "
        "count shuffle: partial aggregation compacts them per map task.",
        corpus_line_dedup(entry._lined_plant(docs)),
    )

    add(
        "Mixture sampling (sample_to_mix)",
        "The per-source rate table (a tiny aggregate) broadcasts back; "
        "the md5-hash Bernoulli and explode(sequence) epoch expansion are "
        "pure column work — the corpus never shuffles.",
        sample_to_mix(docs, {"src0": 0.5, "src1": 0.5}),
    )

    from trustgraph_spark.operators.mixing import shard_layout, shuffle_shards

    add(
        "Seeded corpus shuffle + sharding (corpus_shards)",
        "The permutation (order_key = md5(seed:doc_id)) and the shard "
        "assignment (hex-prefix mod n) are a narrow projection; the "
        "writer layout is ONE hash Exchange on shard_id with an "
        "in-partition sort — no rangepartitioning (a global ORDER BY "
        "random() would range-exchange and sample the whole corpus).",
        shard_layout(shuffle_shards(docs, 16, seed="r5"), 16),
    )

    add(
        "Eval-set decontamination (decontam_13gram)",
        "The eval 13-gram set is deduped and broadcast; the training side "
        "is scan -> Generate -> BroadcastHashJoin -> partial-agg rollup on "
        "doc_id. No SortMergeJoin, no corpus-side gram shuffle.",
        ngram_contamination(
            docs, docs.limit(5).selectExpr("doc_id AS eval_id", "text")),
    )

    from trustgraph_spark.operators.packing import pack_blocks
    from trustgraph_spark.operators.spandedup import exact_substring_dedup

    add(
        "Sequence packing (pack_blocks)",
        "Two-phase prefix sum: the window partitions by bucket (parallel "
        "sort within ranges, one exchange), never a global-order window "
        "that would drag the corpus through a single partition; bucket "
        "offsets come back as a literal map built from n_buckets driver "
        "scalars.",
        pack_blocks(docs, seq_len=2048),
    )

    add(
        "Exact-substring span dedup (span_dedup)",
        "The duplicated-anchor table (count >= 2) is the join build side; "
        "covered-position Generate amplifies only duplicated occurrences; "
        "final anti-join + doc rollup. No suffix structure, no cartesian.",
        exact_substring_dedup(docs, n=8),
    )

    from trustgraph_spark.operators.dsir import dsir_weights
    from trustgraph_spark.operators.semdedup import semdedup

    add(
        "DSIR importance weights (dsir_sample)",
        "Both hashed-n-gram model fits are map-side-combinable aggregates "
        "on a CONSTANT-cardinality bucket key; the fitted models and their "
        "smoothing floors broadcast back, so scoring is scan -> Generate "
        "-> BroadcastHashJoin x2 -> partial-agg rollup on doc_id. No "
        "SortMergeJoin, no Python; the top-k in dsir_sample lowers to "
        "TakeOrderedAndProject.",
        dsir_weights(docs, docs.where("lang = 'en'"), n_buckets=256),
    )

    import numpy as np

    _cents = [[float(x) for x in r]
              for r in np.random.RandomState(5).randn(4, 64)]
    add(
        "SemDedup (semdedup_keep)",
        "Cluster assignment is the sanctioned Arrow-GEMM seam "
        "(MapInPandas); everything after is native: broadcast centroid "
        "join, per-cluster window rank, and the upper-triangular pair "
        "test as a cluster-key SortMergeJoin (both sides are corpus-"
        "sized — one exchange on cluster_id each) with the rank/eps "
        "predicates as join filters — quadratic only within a cluster, "
        "no CartesianProduct anywhere.",
        semdedup(
            spark.read.parquet(
                "/root/testdata/sf0.001/embeddings.parquet"),
            _cents, eps=0.95),
    )

    import __spark_entry__ as entrymod
    from trustgraph_spark.operators.explain import (
        explain_entities,
        rag_traces,
    )

    _store = entrymod._explain_store(spark, "/root/testdata/sf0.001")
    add(
        "Explainability entity parse (explain_entities)",
        "EVERY provenance entity in the store parsed at once: one "
        "HashAggregate pair (partial -> final, map-side combinable) on "
        "the subject key carrying all typed-field conditional aggregates, "
        "then the 13-type dispatch and field masking as a codegen'd "
        "projection. The only Python in the tree is the upstream "
        "emit-side RDF-star JSON seam (ArrowEvalPython); the read path "
        "itself is pure codegen — the reference does this with up to "
        "~100 round-trip triple queries per trace.",
        explain_entities(_store),
    )
    add(
        "Whole-store trace reconstruction (rag_traces)",
        "Question -> Grounding -> Exploration -> Focus -> Synthesis "
        "assembled for every session at once. One pass over the store "
        "materializes two small shared frames — the parsed entity frame "
        "and the (parent, type) -> min-child derivation frame (the "
        "ExistingRDD scans below) — and each chain step is then two "
        "equi-joins over them, so the store and its aggregate subtree "
        "execute exactly once regardless of chain depth (27s -> 5s at "
        "sf0.1 before/after). All joins key on URIs (high-cardinality, "
        "skew-free by construction); left-preserving so partial traces "
        "surface with null tails.",
        rag_traces(_store),
    )

    from trustgraph_spark.operators.unstructured import (
        assign_sections,
        decode_universal,
    )

    _els = entrymod._universal_elements(spark, "/root/testdata/sf0.001")
    add(
        "Universal decoder: heading sections + assembly "
        "(universal_sections)",
        "Section assignment is window arithmetic over (doc_id ORDER BY "
        "element_idx) — no shuffle beyond the one partitioning — and "
        "assembly is a single subject-keyed ObjectHashAggregate whose "
        "transform/filter/array_join all stay codegen. No Python "
        "anywhere downstream of the partition seam.",
        decode_universal(_els, strategy="heading")["sections"],
    )
    add(
        "Universal decoder: size-strategy fold (assign_sections)",
        "The accumulate-until-char-limit strategy is genuinely "
        "sequential per document, so it lowers to ONE Catalyst "
        "`aggregate` fold over the per-document length array "
        "(collect_list -> aggregate -> explode -> join back by "
        "position) — per-document state without a UDF and without a "
        "corpus-wide window.",
        assign_sections(
            _els.where("category <> 'Image'"), "size", max_size=40),
    )


    # --- extraction hierarchy + wire execution (round-5 session 2) ---
    from trustgraph_spark.operators.explain import extraction_hierarchy
    from trustgraph_spark.operators.wire import (
        decode_triples_requests,
        execute_triples_requests,
    )

    add(
        "Extraction hierarchy: final metadata pass",
        "The BFS itself runs over two pushdown projections "
        "(wasDerivedFrom edges and rdf:type rows) with broadcast "
        "localCheckpointed frontiers; the label/title/format resolution "
        "shown here is ONE pass over the store, predicate-pushed on the "
        "five metadata predicates and semi-join-reduced to the "
        "discovered nodes via BroadcastHashJoin — the reference runs 2 "
        "store queries per node.",
        extraction_hierarchy(e, "urn:doc:root", graph=None, max_depth=2),
    )
    _reqs = spark.createDataFrame(
        [("r0", '{"p": {"t": "i", "i": "%s"}, "limit": 5}' % RDF_LABEL),
         ("r1", '{"g": ""}')],
        "req_id string, request string")
    add(
        "Wire-format batched triples-query execution",
        "Each bound-term mask present in the batch becomes one "
        "BroadcastHashJoin of the (bounded, broadcast) request side "
        "against the store scan — at most 8 store passes per batch "
        "regardless of batch size, wire JSON decoded by from_json "
        "inside codegen, per-request limits as one window. No "
        "CartesianProduct anywhere.",
        execute_triples_requests(decode_triples_requests(_reqs), e),
    )

    from trustgraph_spark.operators.iam import (
        USERS_SCHEMA,
        authorise_batch,
    )

    _users = spark.createDataFrame(
        [("u1", "default", "x", "x", "", "", ["reader"], True, False, "")],
        USERS_SCHEMA)
    _checks = spark.createDataFrame(
        [(0, "u1", "triples:read", None)],
        "check_id long, user_id string, capability string, "
        "target_workspace string")
    add(
        "IAM batch authorisation (gateway hot path)",
        "A micro-batch of authorisation checks joins the broadcast "
        "~120-row role-capability vocabulary and the broadcast user "
        "dim; every _decide rule (enabled, capability-in-role, "
        "workspace scope) is a native boolean, the verdict one "
        "map-side-combinable max per check. The reference evaluates "
        "one Cassandra point-read per request; here cost tracks the "
        "request scan at any traffic volume. No Python, no "
        "CartesianProduct.",
        authorise_batch(spark, _checks, _users),
    )

    with open("/root/repo/EXPLAIN.md", "w") as f:
        f.write(
            "# EXPLAIN — physical plans of the core operators\n\n"
            "Generated by tools/explain_report.py over a parquet edges table; "
            "the properties asserted in tests/test_plans.py, shown in full.\n\n"
            + "\n".join(sections)
        )
    print("wrote EXPLAIN.md")
    spark.stop()


if __name__ == "__main__":
    main()
