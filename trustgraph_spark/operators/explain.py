"""Query-time explainability provenance: emit the GraphRAG / DocumentRAG
trace chains and reconstruct every trace in the store with one plan.

Reference:
- Emit: trustgraph-base/trustgraph/provenance/triples.py:372-833
  (question/grounding/exploration/focus/synthesis + the docrag_* twins)
  and :97-280 (document_triples / derived_entity_triples), with the URI
  dialects from provenance/uris.py.
- Read: trustgraph-base/trustgraph/api/explainability.py — the
  ``ExplainEntity.from_triples`` type dispatch (:85-118), the per-type
  field parsers (:121-416), ``parse_edge_selection_triples`` (:419-443),
  and the chained per-request trace walks ``fetch_graphrag_trace`` /
  ``fetch_docrag_trace`` / ``list_sessions`` (:735-1150).

The reference reconstructs ONE trace per request with up to a dozen
round-trip triple queries (plus quiescence retries).  Here the store is a
DataFrame, so the whole read side is set-oriented: `explain_entities` is
one map-side-combinable groupBy over the provenance graph that parses
EVERY entity at once, and `rag_traces` assembles EVERY session's
Question -> Grounding -> Exploration [-> Focus] -> Synthesis chain with
fixed-depth joins on the prov:wasDerivedFrom edge frame — no per-session
loop, no collect, no UDF anywhere in the read path.

Determinism notes (documented divergences):
- List fields (concepts, entities, selectedEdge URIs, goals, steps) are
  sort_array'd; the reference preserves triple-store iteration order,
  which no distributed store guarantees.
- Where the reference's trace walk takes the FIRST type-matching child
  and breaks (storage order), we take the min-URI child per parent.
- The eventual-consistency machinery (retry/quiescence, :500-569) is a
  transport artifact of the reference's async store and has no batch
  analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..constants import (
    GRAPH_RETRIEVAL,
    GRAPH_SOURCE,
    OTYPE_LITERAL,
    OTYPE_TRIPLE,
    OTYPE_URI,
    PROV_ENTITY,
    PROV_STARTED_AT_TIME,
    PROV_WAS_DERIVED_FROM,
    RDF_LABEL,
    RDF_TYPE,
)
from .provenance import QT_SCHEMA as _QT_SCHEMA  # shared wire schema

TG = "https://trustgraph.ai/ns/"

# Predicates (provenance/namespaces.py:63-82)
TG_QUERY = TG + "query"
TG_CONCEPT = TG + "concept"
TG_ENTITY = TG + "entity"
TG_EDGE_COUNT = TG + "edgeCount"
TG_SELECTED_EDGE = TG + "selectedEdge"
TG_EDGE = TG + "edge"
TG_REASONING = TG + "reasoning"
TG_SCORE = TG + "score"
TG_DOCUMENT = TG + "document"
TG_CHUNK_COUNT = TG + "chunkCount"
TG_SELECTED_CHUNK = TG + "selectedChunk"
TG_THOUGHT = TG + "thought"
TG_ACTION = TG + "action"
TG_ARGUMENTS = TG + "arguments"
TG_SUBAGENT_GOAL = TG + "subagentGoal"
TG_PLAN_STEP = TG + "planStep"
TG_IN_TOKEN = TG + "inToken"
TG_OUT_TOKEN = TG + "outToken"
TG_LLM_MODEL = TG + "llmModel"

# Entity types (namespaces.py:100-123)
TG_QUESTION = TG + "Question"
TG_GROUNDING = TG + "Grounding"
TG_EXPLORATION = TG + "Exploration"
TG_FOCUS = TG + "Focus"
TG_SYNTHESIS = TG + "Synthesis"
TG_ANALYSIS = TG + "Analysis"
TG_CONCLUSION = TG + "Conclusion"
TG_ANSWER_TYPE = TG + "Answer"
TG_REFLECTION_TYPE = TG + "Reflection"
TG_THOUGHT_TYPE = TG + "Thought"
TG_OBSERVATION_TYPE = TG + "Observation"
TG_EDGE_SELECTION = TG + "EdgeSelection"
TG_CHUNK_SELECTION = TG + "ChunkSelection"
TG_DECOMPOSITION = TG + "Decomposition"
TG_FINDING = TG + "Finding"
TG_PLAN_TYPE = TG + "Plan"
TG_STEP_RESULT = TG + "StepResult"
TG_GRAPH_RAG_QUESTION = TG + "GraphRagQuestion"
TG_DOC_RAG_QUESTION = TG + "DocRagQuestion"
TG_AGENT_QUESTION = TG + "AgentQuestion"

# Dublin Core + extraction-provenance vocab (namespaces.py:19-60, 85-97)
DC = "http://purl.org/dc/elements/1.1/"
DC_TITLE = DC + "title"
DC_SOURCE = DC + "source"
DC_DATE = DC + "date"
DC_CREATOR = DC + "creator"
TG_PAGE_COUNT = TG + "pageCount"
TG_MIME_TYPE = TG + "mimeType"
TG_PAGE_NUMBER = TG + "pageNumber"
TG_CHUNK_INDEX = TG + "chunkIndex"
TG_CHAR_OFFSET = TG + "charOffset"
TG_CHAR_LENGTH = TG + "charLength"
TG_DOCUMENT_TYPE = TG + "Document"
TG_PAGE_TYPE = TG + "Page"
TG_SECTION_TYPE = TG + "Section"
TG_CHUNK_TYPE = TG + "Chunk"
TG_IMAGE_TYPE = TG + "Image"
TG_ELEMENT_TYPES = TG + "elementTypes"
TG_TABLE_COUNT = TG + "tableCount"
TG_IMAGE_COUNT = TG + "imageCount"
TG_CONTAINS = TG + "contains"

_ROW_T = "array<struct<s:string,p:string,o:string,otype:string>>"


def _t(s, p, o, otype: str = OTYPE_URI):
    """One (s, p, o, otype) struct; str args become literal columns."""
    return F.struct(
        (F.lit(s) if isinstance(s, str) else s).alias("s"),
        (F.lit(p) if isinstance(p, str) else p).alias("p"),
        (F.lit(o) if isinstance(o, str) else o).alias("o"),
        F.lit(otype).alias("otype"),
    )


def _opt(cond, *entries):
    """Entries included only when ``cond`` holds (the reference's
    ``if value is not None: triples.append(...)`` arms)."""
    return F.when(cond, F.array(*entries)).otherwise(F.array().cast(_ROW_T))


def _each(col_name: str, fn):
    """``transform`` with a NULL-array guard: a null list contributes
    ZERO entries rather than null-poisoning the enclosing ``concat``
    (which would silently drop the session's whole triple set at the
    explode).  The reference iterates ``for x in lst`` over lists that
    are always present; a Spark upstream left join can make them NULL."""
    return F.transform(
        F.coalesce(F.col(col_name), F.array().cast("array<string>")), fn)


def _tokens(uri):
    """_append_token_triples (triples.py:86-94): in/out token counts and
    model, each emitted only when present."""
    return F.concat(
        _opt(F.col("in_token").isNotNull(),
             _t(uri, TG_IN_TOKEN, F.col("in_token").cast("string"),
                OTYPE_LITERAL)),
        _opt(F.col("out_token").isNotNull(),
             _t(uri, TG_OUT_TOKEN, F.col("out_token").cast("string"),
                OTYPE_LITERAL)),
        _opt(F.col("model").isNotNull(),
             _t(uri, TG_LLM_MODEL, F.col("model"), OTYPE_LITERAL)),
    )


def _emit(rows_df, collection: str, graph: str = GRAPH_RETRIEVAL) -> DataFrame:
    """Explode an array<struct> column ``tr`` into the triples contract."""
    return rows_df.select(F.explode("tr").alias("tr")).select(
        F.lit(collection).alias("collection"),
        F.lit(graph).alias("g"),
        F.col("tr.s").alias("s"),
        F.col("tr.p").alias("p"),
        F.col("tr.o").alias("o"),
        F.col("tr.otype").alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )


def graphrag_session_triples(
    sessions: DataFrame, collection: str = "default"
) -> DataFrame:
    """Emit the full GraphRAG query-time trace chain per session row —
    the Spark twin of question_triples + grounding_triples +
    exploration_triples + focus_triples + synthesis_triples
    (triples.py:372-634) with the urn:trustgraph URI dialect
    (uris.py:85-165).

    Input columns: session_id, query, ts (caller-supplied event time —
    the reference defaults to now(), which a deterministic data plane
    cannot), concepts array<string>, entities array<string> (seed
    entity IRIs), edge_count int, selected_edges
    array<struct<s,p,o,concept,score,reasoning>> (score/reasoning
    already stringified; empty-string concept/score/reasoning = absent,
    matching the reference's falsy checks), document_id (nullable),
    in_token / out_token (nullable long), model (nullable string).

    One inline array + explode per session for the scalar rows and one
    posexplode over selected_edges for the per-edge rows: narrow,
    codegen'd, no shuffle. The per-edge quoted triple reuses the
    sanctioned byte-exact RDF-star JSON seam (focus edges are plain
    IRI-tupled edges, _quoted_triple treats strings as IRIs —
    triples.py:493-505)."""
    from .provenance import quoted_triple_json

    sid = F.col("session_id")
    q_uri = F.concat(F.lit("urn:trustgraph:question:"), sid)
    g_uri = F.concat(F.lit("urn:trustgraph:prov:grounding:"), sid)
    e_uri = F.concat(F.lit("urn:trustgraph:prov:exploration:"), sid)
    f_uri = F.concat(F.lit("urn:trustgraph:prov:focus:"), sid)
    syn_uri = F.concat(F.lit("urn:trustgraph:prov:synthesis:"), sid)

    scalar = sessions.select(
        F.concat(
            F.array(
                # question_triples (:372-412)
                _t(q_uri, RDF_TYPE, PROV_ENTITY),
                _t(q_uri, RDF_TYPE, TG_QUESTION),
                _t(q_uri, RDF_TYPE, TG_GRAPH_RAG_QUESTION),
                _t(q_uri, RDF_LABEL, "GraphRAG Question", OTYPE_LITERAL),
                _t(q_uri, PROV_STARTED_AT_TIME, F.col("ts"), OTYPE_LITERAL),
                _t(q_uri, TG_QUERY, F.col("query"), OTYPE_LITERAL),
                # grounding_triples (:415-451)
                _t(g_uri, RDF_TYPE, PROV_ENTITY),
                _t(g_uri, RDF_TYPE, TG_GROUNDING),
                _t(g_uri, RDF_LABEL, "Grounding", OTYPE_LITERAL),
                _t(g_uri, PROV_WAS_DERIVED_FROM, q_uri),
                # exploration_triples (:454-490)
                _t(e_uri, RDF_TYPE, PROV_ENTITY),
                _t(e_uri, RDF_TYPE, TG_EXPLORATION),
                _t(e_uri, RDF_LABEL, "Exploration", OTYPE_LITERAL),
                _t(e_uri, PROV_WAS_DERIVED_FROM, g_uri),
                _t(e_uri, TG_EDGE_COUNT,
                   F.col("edge_count").cast("string"), OTYPE_LITERAL),
                # focus_triples envelope (:508-544)
                _t(f_uri, RDF_TYPE, PROV_ENTITY),
                _t(f_uri, RDF_TYPE, TG_FOCUS),
                _t(f_uri, RDF_LABEL, "Focus", OTYPE_LITERAL),
                _t(f_uri, PROV_WAS_DERIVED_FROM, e_uri),
                # synthesis_triples (:597-634)
                _t(syn_uri, RDF_TYPE, PROV_ENTITY),
                _t(syn_uri, RDF_TYPE, TG_SYNTHESIS),
                _t(syn_uri, RDF_TYPE, TG_ANSWER_TYPE),
                _t(syn_uri, RDF_LABEL, "Synthesis", OTYPE_LITERAL),
                _t(syn_uri, PROV_WAS_DERIVED_FROM, f_uri),
            ),
            _each("concepts",
                  lambda c: _t(g_uri, TG_CONCEPT, c, OTYPE_LITERAL)),
            _each("entities", lambda e: _t(e_uri, TG_ENTITY, e)),
            _opt(F.col("document_id").isNotNull(),
                 _t(syn_uri, TG_DOCUMENT, F.col("document_id"))),
            _tokens(syn_uri),
        ).alias("tr")
    )

    edge = sessions.select(
        sid, f_uri.alias("_f"),
        F.posexplode("selected_edges").alias("idx", "e"),
    ).withColumn(
        "_sel",
        F.concat(F.lit("urn:trustgraph:prov:edge:"), sid, F.lit(":"),
                 F.col("idx").cast("string")),
    )
    edge_rows = edge.select(
        F.concat(
            F.array(
                _t(F.col("_f"), TG_SELECTED_EDGE, F.col("_sel")),
                _t(F.col("_sel"), RDF_TYPE, TG_EDGE_SELECTION),
                _t(F.col("_sel"), TG_EDGE,
                   quoted_triple_json(F.col("e.s"), F.col("e.p"),
                                      F.col("e.o"), F.lit(OTYPE_URI)),
                   OTYPE_TRIPLE),
            ),
            _opt(F.col("e.concept") != "",
                 _t(F.col("_sel"), TG_CONCEPT, F.col("e.concept"),
                    OTYPE_LITERAL)),
            _opt(F.col("e.score") != "",
                 _t(F.col("_sel"), TG_SCORE, F.col("e.score"),
                    OTYPE_LITERAL)),
            _opt(F.col("e.reasoning") != "",
                 _t(F.col("_sel"), TG_REASONING, F.col("e.reasoning"),
                    OTYPE_LITERAL)),
        ).alias("tr")
    )

    return _emit(scalar, collection).unionByName(_emit(edge_rows, collection))


def docrag_session_triples(
    sessions: DataFrame, collection: str = "default"
) -> DataFrame:
    """Emit the DocumentRAG trace chain per session — docrag_question /
    grounding / docrag_exploration / docrag_chunk_selection /
    docrag_synthesis (triples.py:644-833) with the urn:trustgraph:docrag
    URI dialect (uris.py:318-417). Synthesis derives from EXPLORATION
    (the chain has no mandatory Focus step, :795-833); the chunk-selection
    Focus is emitted only when ``reranked`` is non-empty, mirroring the
    reranker-only call site.

    Input columns: session_id, query, ts, concepts array<string>,
    chunk_count int, chunk_ids array<string>, reranked
    array<struct<chunk_id,score>> (score stringified), document_id,
    in_token/out_token/model (nullable)."""
    sid = F.col("session_id")
    q_uri = F.concat(F.lit("urn:trustgraph:docrag:"), sid)
    g_uri = F.concat(q_uri, F.lit("/grounding"))
    e_uri = F.concat(q_uri, F.lit("/exploration"))
    f_uri = F.concat(q_uri, F.lit("/focus"))
    syn_uri = F.concat(q_uri, F.lit("/synthesis"))

    scalar = sessions.select(
        F.concat(
            F.array(
                # docrag_question_triples (:644-684)
                _t(q_uri, RDF_TYPE, PROV_ENTITY),
                _t(q_uri, RDF_TYPE, TG_QUESTION),
                _t(q_uri, RDF_TYPE, TG_DOC_RAG_QUESTION),
                _t(q_uri, RDF_LABEL, "DocumentRAG Question", OTYPE_LITERAL),
                _t(q_uri, PROV_STARTED_AT_TIME, F.col("ts"), OTYPE_LITERAL),
                _t(q_uri, TG_QUERY, F.col("query"), OTYPE_LITERAL),
                # grounding (shared emitter, :415-451)
                _t(g_uri, RDF_TYPE, PROV_ENTITY),
                _t(g_uri, RDF_TYPE, TG_GROUNDING),
                _t(g_uri, RDF_LABEL, "Grounding", OTYPE_LITERAL),
                _t(g_uri, PROV_WAS_DERIVED_FROM, q_uri),
                # docrag_exploration_triples (:687-723)
                _t(e_uri, RDF_TYPE, PROV_ENTITY),
                _t(e_uri, RDF_TYPE, TG_EXPLORATION),
                _t(e_uri, RDF_LABEL, "Exploration", OTYPE_LITERAL),
                _t(e_uri, PROV_WAS_DERIVED_FROM, g_uri),
                _t(e_uri, TG_CHUNK_COUNT,
                   F.col("chunk_count").cast("string"), OTYPE_LITERAL),
                # docrag_synthesis_triples (:795-833) — derives from
                # exploration, skipping the focus step
                _t(syn_uri, RDF_TYPE, PROV_ENTITY),
                _t(syn_uri, RDF_TYPE, TG_SYNTHESIS),
                _t(syn_uri, RDF_TYPE, TG_ANSWER_TYPE),
                _t(syn_uri, RDF_LABEL, "Synthesis", OTYPE_LITERAL),
                _t(syn_uri, PROV_WAS_DERIVED_FROM, e_uri),
            ),
            _each("concepts",
                  lambda c: _t(g_uri, TG_CONCEPT, c, OTYPE_LITERAL)),
            _each("chunk_ids", lambda c: _t(e_uri, TG_SELECTED_CHUNK, c)),
            # docrag_chunk_selection_triples envelope (:756-761), only
            # when the reranker ran
            _opt(F.size("reranked") > 0,
                 _t(f_uri, RDF_TYPE, PROV_ENTITY),
                 _t(f_uri, RDF_TYPE, TG_FOCUS),
                 _t(f_uri, RDF_LABEL, "Chunk Selection", OTYPE_LITERAL),
                 _t(f_uri, PROV_WAS_DERIVED_FROM, e_uri)),
            _opt(F.col("document_id").isNotNull(),
                 _t(syn_uri, TG_DOCUMENT, F.col("document_id"))),
            _tokens(syn_uri),
        ).alias("tr")
    )

    sel = sessions.select(
        sid, f_uri.alias("_f"),
        F.posexplode("reranked").alias("idx", "c"),
    ).where(
        # the reference skips entries without a chunk_id (:763-766)
        F.col("c.chunk_id").isNotNull() & (F.col("c.chunk_id") != "")
    ).withColumn(
        "_sel",
        F.concat(F.lit("urn:trustgraph:prov:chunk:"), sid, F.lit(":"),
                 F.col("idx").cast("string")),
    )
    sel_rows = sel.select(
        F.concat(
            F.array(
                _t(F.col("_f"), TG_SELECTED_CHUNK, F.col("_sel")),
                _t(F.col("_sel"), RDF_TYPE, TG_CHUNK_SELECTION),
                _t(F.col("_sel"), TG_DOCUMENT, F.col("c.chunk_id")),
            ),
            _opt(F.col("c.score") != "",
                 _t(F.col("_sel"), TG_SCORE, F.col("c.score"),
                    OTYPE_LITERAL)),
        ).alias("tr")
    )

    return _emit(scalar, collection).unionByName(_emit(sel_rows, collection))


def document_prov_triples(
    docs: DataFrame, collection: str = "default"
) -> DataFrame:
    """Source-document PROV entities — document_triples
    (triples.py:97-145): typed prov:Entity + tg:Document, each metadata
    triple emitted only when the field is present/truthy (dc:title also
    mirrored to rdfs:label; dc:source is an IRI object).

    Input columns: doc_uri, title, source, date, creator (nullable
    strings; empty string = absent, matching the reference's truthiness
    checks), page_count (nullable int), mime_type (nullable string).

    Tagged g=urn:graph:source: the reference librarian emits these
    UNTAGGED (librarian/service.py:349-377 never calls set_graph) while
    the extraction-hierarchy CLI reads document metadata from
    urn:graph:source (show_extraction_provenance.py:45,124) — a latent
    read/write drift; we tag the graph the reader queries."""
    d = F.col("doc_uri")
    nonempty = lambda c: F.col(c).isNotNull() & (F.col(c) != "")  # noqa: E731
    rows = docs.select(
        F.concat(
            F.array(
                _t(d, RDF_TYPE, PROV_ENTITY),
                _t(d, RDF_TYPE, TG_DOCUMENT_TYPE),
            ),
            _opt(nonempty("title"),
                 _t(d, DC_TITLE, F.col("title"), OTYPE_LITERAL),
                 _t(d, RDF_LABEL, F.col("title"), OTYPE_LITERAL)),
            _opt(nonempty("source"), _t(d, DC_SOURCE, F.col("source"))),
            _opt(nonempty("date"),
                 _t(d, DC_DATE, F.col("date"), OTYPE_LITERAL)),
            _opt(nonempty("creator"),
                 _t(d, DC_CREATOR, F.col("creator"), OTYPE_LITERAL)),
            _opt(F.col("page_count").isNotNull(),
                 _t(d, TG_PAGE_COUNT,
                    F.col("page_count").cast("string"), OTYPE_LITERAL)),
            _opt(nonempty("mime_type"),
                 _t(d, TG_MIME_TYPE, F.col("mime_type"), OTYPE_LITERAL)),
        ).alias("tr")
    )
    return _emit(rows, collection, graph=GRAPH_SOURCE)


def derived_entity_prov_triples(
    entities: DataFrame,
    component_name: str,
    component_version: str,
    timestamp: str,
    collection: str = "default",
) -> DataFrame:
    """Derived-entity (page/section/chunk/image) PROV scaffolding —
    derived_entity_triples (triples.py:148-280): entity declaration with
    the parameter-driven specific type (image > section > page > chunk,
    :207-217), wasDerivedFrom parent, generation activity with agent
    association, and the optional positional metadata.

    The reference mints a uuid4 activity per CALL (uris.py:52-56) and a
    now() timestamp; as with subgraph_provenance_triples we mint a
    deterministic sha256 activity keyed on (entity_uri, component) and
    take caller-supplied event time, so reruns are idempotent.

    Input columns: entity_uri, parent_uri, label (nullable), page_number
    / chunk_index / char_offset / char_length (nullable int), section /
    image (boolean), mime_type (nullable). Optional extra columns (the
    universal decoder's metadata, triples.py:271-278, emitted when the
    column is present AND non-null): element_types (string),
    table_count / image_count (int)."""
    from ..constants import (
        PROV_ACTIVITY,
        PROV_AGENT,
        PROV_USED,
        PROV_WAS_ASSOCIATED_WITH,
        PROV_WAS_GENERATED_BY,
        TG_COMPONENT_VERSION,
        TRUSTGRAPH_BASE,
    )

    e = F.col("entity_uri")
    act = F.concat(
        F.lit(f"{TRUSTGRAPH_BASE}/activity/"),
        F.sha2(F.concat(e, F.lit(":"), F.lit(component_name)), 256),
    )
    agt = f"{TRUSTGRAPH_BASE}/agent/{component_name}"

    specific = (
        F.when(F.col("image"), F.lit(TG_IMAGE_TYPE))
        .when(F.col("section"), F.lit(TG_SECTION_TYPE))
        .when(F.col("page_number").isNotNull(), F.lit(TG_PAGE_TYPE))
        .when(F.col("chunk_index").isNotNull(), F.lit(TG_CHUNK_TYPE))
    )
    num = lambda c, p: _opt(  # noqa: E731
        F.col(c).isNotNull(),
        _t(e, p, F.col(c).cast("string"), OTYPE_LITERAL))

    rows = entities.select(
        F.concat(
            F.array(_t(e, RDF_TYPE, PROV_ENTITY)),
            _opt(specific.isNotNull(), _t(e, RDF_TYPE, specific)),
            F.array(
                _t(e, PROV_WAS_DERIVED_FROM, F.col("parent_uri")),
                _t(e, PROV_WAS_GENERATED_BY, act),
                _t(act, RDF_TYPE, PROV_ACTIVITY),
                _t(act, RDF_LABEL, f"{component_name} extraction",
                   OTYPE_LITERAL),
                _t(act, PROV_USED, F.col("parent_uri")),
                _t(act, PROV_WAS_ASSOCIATED_WITH, agt),
                _t(act, PROV_STARTED_AT_TIME, timestamp, OTYPE_LITERAL),
                _t(act, TG_COMPONENT_VERSION, component_version,
                   OTYPE_LITERAL),
                _t(agt, RDF_TYPE, PROV_AGENT),
                _t(agt, RDF_LABEL, component_name, OTYPE_LITERAL),
            ),
            _opt(F.col("label").isNotNull() & (F.col("label") != ""),
                 _t(e, RDF_LABEL, F.col("label"), OTYPE_LITERAL)),
            num("page_number", TG_PAGE_NUMBER),
            num("chunk_index", TG_CHUNK_INDEX),
            num("char_offset", TG_CHAR_OFFSET),
            num("char_length", TG_CHAR_LENGTH),
            _opt(F.col("mime_type").isNotNull() & (F.col("mime_type") != ""),
                 _t(e, TG_MIME_TYPE, F.col("mime_type"), OTYPE_LITERAL)),
            *([_opt(F.col("element_types").isNotNull()
                    & (F.col("element_types") != ""),
                    _t(e, TG_ELEMENT_TYPES, F.col("element_types"),
                       OTYPE_LITERAL))]
              if "element_types" in entities.columns else []),
            *([num("table_count", TG_TABLE_COUNT)]
              if "table_count" in entities.columns else []),
            *([num("image_count", TG_IMAGE_COUNT)]
              if "image_count" in entities.columns else []),
        ).alias("tr")
    )
    return _emit(rows, collection, graph=GRAPH_SOURCE)


# ---------------------------------------------------------------------------
# Read side: reconstruct every explainability entity / trace in one plan
# ---------------------------------------------------------------------------


def _filtered(triples: DataFrame, graph: str | None) -> DataFrame:
    """Named-graph filter (fetch_entity's g= argument); tolerated absent
    on narrow emitter frames that carry no g column."""
    if graph is not None and "g" in triples.columns:
        return triples.where(F.col("g") == graph)
    return triples


def explain_entities(
    triples: DataFrame, graph: str | None = GRAPH_RETRIEVAL
) -> DataFrame:
    """Parse EVERY explainability entity in the store at once — the
    set-oriented twin of ExplainEntity.from_triples
    (api/explainability.py:85-118) and the 13 per-type parsers
    (:121-416). One groupBy(subject) with conditional aggregates
    (map-side combinable, codegen'd, no UDF); the type dispatch is the
    reference's exact priority CASE over the collected rdf:type set.

    Output: one wide row per subject with entity_type plus the typed
    fields, each masked to the entity types whose parser reads it (a
    stray tg:query on a Grounding is ignored, exactly as the reference's
    per-type parsers ignore unknown predicates). Defaults mirror the
    dataclass defaults: '' strings, [] lists, 0 counts, null score.
    List fields are sorted (see module docstring)."""
    t = _filtered(triples, graph)
    p, o = F.col("p"), F.col("o")

    def when_p(pred):
        return F.when(p == pred, o)

    ag = t.groupBy(F.col("s").alias("uri")).agg(
        F.collect_set(when_p(RDF_TYPE)).alias("_types"),
        F.max(when_p(TG_QUERY)).alias("_query"),
        F.max(when_p(PROV_STARTED_AT_TIME)).alias("_ts"),
        F.sort_array(F.collect_list(when_p(TG_CONCEPT))).alias("_concepts"),
        F.max(when_p(TG_EDGE_COUNT)).alias("_edge_count"),
        F.max(when_p(TG_CHUNK_COUNT)).alias("_chunk_count"),
        F.sort_array(F.collect_list(when_p(TG_ENTITY))).alias("_entities"),
        F.sort_array(F.collect_list(
            F.when((p == TG_SELECTED_EDGE) & (F.col("otype") == OTYPE_URI), o)
        )).alias("_sel_edges"),
        F.max(when_p(TG_DOCUMENT)).alias("_document"),
        F.max(when_p(TG_ACTION)).alias("_action"),
        F.max(when_p(TG_ARGUMENTS)).alias("_arguments"),
        F.max(when_p(TG_THOUGHT)).alias("_thought"),
        F.sort_array(F.collect_list(when_p(TG_SUBAGENT_GOAL))).alias("_goals"),
        F.sort_array(F.collect_list(when_p(TG_PLAN_STEP))).alias("_steps"),
    )

    has = lambda ty: F.array_contains("_types", ty)  # noqa: E731
    is_question = (
        has(TG_GRAPH_RAG_QUESTION) | has(TG_DOC_RAG_QUESTION)
        | has(TG_AGENT_QUESTION)
    )
    # from_triples dispatch priority (:90-118), verbatim order
    entity_type = (
        F.when(is_question, "question")
        .when(has(TG_GROUNDING), "grounding")
        .when(has(TG_EXPLORATION), "exploration")
        .when(has(TG_FOCUS), "focus")
        .when(has(TG_DECOMPOSITION), "decomposition")
        .when(has(TG_FINDING), "finding")
        .when(has(TG_PLAN_TYPE), "plan")
        .when(has(TG_STEP_RESULT), "step-result")
        .when(has(TG_SYNTHESIS), "synthesis")
        .when(has(TG_OBSERVATION_TYPE) & ~has(TG_REFLECTION_TYPE),
              "observation")
        .when(has(TG_REFLECTION_TYPE), "reflection")
        .when(has(TG_ANALYSIS), "analysis")
        .when(has(TG_CONCLUSION), "conclusion")
        .otherwise("unknown")
    )

    et = F.col("entity_type")
    out = ag.withColumn("entity_type", entity_type)
    empty_arr = F.array().cast("array<string>")
    return out.select(
        "uri",
        "entity_type",
        # Question (:128-154)
        F.when(et == "question",
               F.when(has(TG_GRAPH_RAG_QUESTION), "graph-rag")
                .when(has(TG_DOC_RAG_QUESTION), "document-rag")
                .when(has(TG_AGENT_QUESTION), "agent")
                .otherwise("unknown"))
         .otherwise("").alias("question_type"),
        F.when(et == "question", F.coalesce("_query", F.lit("")))
         .otherwise("").alias("query"),
        F.when(et == "question", F.coalesce("_ts", F.lit("")))
         .otherwise("").alias("timestamp"),
        # Grounding (:162-174)
        F.when(et == "grounding", F.col("_concepts"))
         .otherwise(empty_arr).alias("concepts"),
        # Exploration (:184-210) — int() with parse-failure fallback 0
        F.when(et == "exploration",
               F.coalesce(F.col("_edge_count").try_cast("int"), F.lit(0)))
         .otherwise(0).alias("edge_count"),
        F.when(et == "exploration",
               F.coalesce(F.col("_chunk_count").try_cast("int"), F.lit(0)))
         .otherwise(0).alias("chunk_count"),
        F.when(et == "exploration", F.col("_entities"))
         .otherwise(empty_arr).alias("entities"),
        # Focus (:219-232) — IRI objects only
        F.when(et == "focus", F.col("_sel_edges"))
         .otherwise(empty_arr).alias("selected_edge_uris"),
        # document: Synthesis / Reflection / Observation / Conclusion /
        # Finding / StepResult all read tg:document
        F.when(et.isin("synthesis", "reflection", "observation",
                       "conclusion", "finding", "step-result"),
               F.coalesce("_document", F.lit("")))
         .otherwise("").alias("document"),
        # Reflection (:262-282)
        F.when(et == "reflection",
               F.when(has(TG_THOUGHT_TYPE), "thought")
                .when(has(TG_OBSERVATION_TYPE), "observation")
                .otherwise(""))
         .otherwise("").alias("reflection_type"),
        # Analysis (:293-312)
        F.when(et == "analysis", F.coalesce("_action", F.lit("")))
         .otherwise("").alias("action"),
        F.when(et == "analysis", F.coalesce("_arguments", F.lit("")))
         .otherwise("").alias("arguments"),
        F.when(et == "analysis", F.coalesce("_thought", F.lit("")))
         .otherwise("").alias("thought"),
        # Decomposition / Finding (:361-384)
        F.when(et == "decomposition", F.col("_goals"))
         .otherwise(empty_arr).alias("goals"),
        F.when(et == "finding",
               F.coalesce(F.element_at("_goals", 1), F.lit("")))
         .otherwise("").alias("goal"),
        # Plan / StepResult (:393-416)
        F.when(et == "plan", F.col("_steps"))
         .otherwise(empty_arr).alias("steps"),
        F.when(et == "step-result",
               F.coalesce(F.element_at("_steps", 1), F.lit("")))
         .otherwise("").alias("step"),
    )




def _term_value(term):
    """extract_term_value (:446-464) over the long-key wire form the
    repo's RDF-star JSON seam emits: IRI -> iri, literal -> value."""
    return F.when(term.getField("type") == "i", term.getField("iri")) \
        .otherwise(term.getField("value"))


def edge_selections(
    triples: DataFrame, graph: str | None = GRAPH_RETRIEVAL
) -> DataFrame:
    """Parse every tg:EdgeSelection entity — the set twin of
    parse_edge_selection_triples (:419-443) + fetch_edge_selection: the
    quoted edge (RDF-star JSON decoded natively with from_json, no UDF),
    reasoning, concept, and float score (null on parse failure)."""
    t = _filtered(triples, graph)
    p, o = F.col("p"), F.col("o")
    ag = t.groupBy(F.col("s").alias("uri")).agg(
        F.max(F.when(p == RDF_TYPE, o) == TG_EDGE_SELECTION).alias("_is"),
        F.max(F.when((p == TG_EDGE) & (F.col("otype") == OTYPE_TRIPLE), o)
              ).alias("_edge_json"),
        F.max(F.when(p == TG_REASONING, o)).alias("_reasoning"),
        F.max(F.when(p == TG_CONCEPT, o)).alias("_concept"),
        F.max(F.when(p == TG_SCORE, o)).alias("_score"),
    ).where(F.col("_is"))
    qt = F.from_json("_edge_json", _QT_SCHEMA)
    return ag.select(
        "uri",
        F.when(F.col("_edge_json").isNotNull(), F.struct(
            _term_value(qt.getField("s")).alias("s"),
            _term_value(qt.getField("p")).alias("p"),
            _term_value(qt.getField("o")).alias("o"),
        )).alias("edge"),
        F.coalesce("_reasoning", F.lit("")).alias("reasoning"),
        F.coalesce("_concept", F.lit("")).alias("concept"),
        F.col("_score").try_cast("double").alias("score"),
    )


def chunk_selections(
    triples: DataFrame, graph: str | None = GRAPH_RETRIEVAL
) -> DataFrame:
    """Parse every tg:ChunkSelection entity (the DocumentRAG focus
    sub-entities, triples.py:763-792): chunk reference + float score."""
    t = _filtered(triples, graph)
    p, o = F.col("p"), F.col("o")
    return t.groupBy(F.col("s").alias("uri")).agg(
        F.max(F.when(p == RDF_TYPE, o) == TG_CHUNK_SELECTION).alias("_is"),
        F.max(F.when(p == TG_DOCUMENT, o)).alias("_chunk"),
        F.max(F.when(p == TG_SCORE, o)).alias("_score"),
    ).where(F.col("_is")).select(
        "uri",
        F.coalesce("_chunk", F.lit("")).alias("chunk_id"),
        F.col("_score").try_cast("double").alias("score"),
    )


def _first_child(typed_children: DataFrame, parents: DataFrame,
                 parent_col: str, ents: DataFrame, ent_type: str,
                 out_prefix: str, fields: list[str]) -> DataFrame:
    """One step of the trace walk: for each parent URI, the min-URI child
    of the requested entity type (the reference takes the first
    type-matching child in storage order and breaks,
    explainability.py:784-793 — storage order is nondeterministic, so we
    take the min URI). Left-preserving: parents without a child keep
    null step columns, matching the reference's early-return traces.
    ``typed_children`` is the (parent, entity_type) -> min child frame
    computed once for all steps."""
    child = typed_children.where(
        F.col("entity_type") == ent_type
    ).select(F.col("parent").alias(parent_col),
             F.col("child_uri").alias(f"{out_prefix}_uri"))
    step = child.join(
        ents.select(F.col("uri").alias(f"{out_prefix}_uri"),
                    *[F.col(f).alias(f"{out_prefix}_{f}") for f in fields]),
        f"{out_prefix}_uri",
    )
    return parents.join(step, parent_col, "left")


def rag_traces(
    triples: DataFrame,
    graph: str | None = GRAPH_RETRIEVAL,
    question_type: str | None = None,
) -> DataFrame:
    """Reconstruct the COMPLETE retrieval trace for every RAG session in
    the store with one plan — the set-oriented twin of
    fetch_graphrag_trace (:735-864, Question -> Grounding -> Exploration
    -> Focus -> Synthesis) and fetch_docrag_trace (:866-972, synthesis
    derived from exploration, no focus requirement). Each chain step is
    one join on the prov:wasDerivedFrom edge frame; all steps are
    left-preserving so partially-written traces surface with null tails
    exactly as the reference returns partial trace dicts.

    GraphRAG traces additionally follow Focus -> Synthesis; DocumentRAG
    traces follow Exploration -> Synthesis. Both are computed from the
    same entity frame; ``question_type`` filters to 'graph-rag' or
    'document-rag' (None = both).

    Scale note: the entity frame and the (parent, type) -> min-child
    frame are each referenced by every chain step, so both are
    materialized once (localCheckpoint) — one pass over the store
    builds two small frames (one row per entity / per typed
    derivation), and each step is then two joins over those. Without
    this the aggregate subtree — including whatever produced the
    triples — re-executes per step (measured 27s at sf0.1 on the
    emit-fed driver query; ~3s with the shared frames)."""
    t = _filtered(triples, graph)
    ents = explain_entities(t, graph=None).localCheckpoint()
    derived = t.where(F.col("p") == PROV_WAS_DERIVED_FROM).select(
        F.col("s").alias("child"), F.col("o").alias("parent"))
    # one (parent, type) -> min-child aggregation feeds every step
    typed_children = derived.join(
        ents.select(F.col("uri").alias("child"), "entity_type"), "child"
    ).groupBy("parent", "entity_type").agg(
        F.min("child").alias("child_uri")).localCheckpoint()

    q = ents.where(F.col("entity_type") == "question")
    if question_type is not None:
        q = q.where(F.col("question_type") == question_type)
    else:
        q = q.where(F.col("question_type").isin("graph-rag", "document-rag"))
    trace = q.select(
        F.col("uri").alias("question_uri"),
        "question_type", "query", "timestamp",
    )

    trace = _first_child(typed_children, trace, "question_uri", ents,
                         "grounding", "grounding", ["concepts"])
    trace = _first_child(typed_children, trace, "grounding_uri", ents,
                         "exploration", "exploration",
                         ["edge_count", "chunk_count", "entities"])
    trace = _first_child(typed_children, trace, "exploration_uri", ents,
                         "focus", "focus", ["selected_edge_uris"])
    # GraphRAG synthesis hangs off focus; DocumentRAG off exploration.
    # Both resolve from the shared typed-children frame so the chain
    # subplan above appears exactly once in the final plan.
    syn = typed_children.where(
        F.col("entity_type") == "synthesis"
    ).select("parent", F.col("child_uri").alias("_syn_uri")).join(
        ents.select(F.col("uri").alias("_syn_uri"),
                    F.col("document").alias("_syn_doc")),
        "_syn_uri",
    )
    return (
        trace
        .join(syn.select(F.col("parent").alias("focus_uri"),
                         F.col("_syn_uri").alias("_g_uri"),
                         F.col("_syn_doc").alias("_g_doc")),
              "focus_uri", "left")
        .join(syn.select(F.col("parent").alias("exploration_uri"),
                         F.col("_syn_uri").alias("_d_uri"),
                         F.col("_syn_doc").alias("_d_doc")),
              "exploration_uri", "left")
        .select(
            *[c for c in trace.columns],
            F.when(F.col("question_type") == "graph-rag", F.col("_g_uri"))
             .otherwise(F.col("_d_uri")).alias("synthesis_uri"),
            F.when(F.col("question_type") == "graph-rag", F.col("_g_doc"))
             .otherwise(F.col("_d_doc")).alias("synthesis_document"),
        )
    )


def edge_source_provenance(
    selections: DataFrame,
    source_triples: DataFrame,
    graph: str | None = "urn:graph:source",
    max_depth: int = 10,
) -> DataFrame:
    """Trace every selected edge back to its source document — the
    set-oriented twin of tg-show-explain-trace's per-edge walk
    (cli/show_explain_trace.py:53-156): find the extraction subgraphs
    whose ``tg:contains <<s p o>>`` row matches the edge (term-typed
    per ``build_term``: http/urn strings are IRIs, else literals,
    :72-84), then follow the prov:wasDerivedFrom chain to the root
    (bounded ``max_depth``, stopping on missing or self parent),
    resolving each node's rdfs:label with URI fallback (:116-164).

    The reference runs ~2 store queries per chain hop per edge; here
    the containment match is ONE value-equality join of the parsed
    RDF-star terms (no byte-matching of JSON layouts), and the chain
    walk is ``max_depth`` joins of a shrinking frontier against the
    derivation edge frame (materialized once, as in rag_traces).

    ``selections`` is edge_selections() output (uri + edge struct).
    Returns one row per (selection, subgraph chain): selection_uri,
    stmt_uri, chain (array<struct<uri,label>> root-last),
    source_chain (' -> '-joined labels, format_provenance_chain
    :159-164), content_chunk (first urn:chunk: node, :219-224)."""
    t = _filtered(source_triples, graph)

    qt = F.from_json("o", _QT_SCHEMA)
    contains = t.where(
        (F.col("p") == TG_CONTAINS) & (F.col("otype") == OTYPE_TRIPLE)
    ).select(
        F.col("s").alias("stmt_uri"),
        _term_value(qt.getField("s")).alias("_cs"),
        _term_value(qt.getField("p")).alias("_cp"),
        _term_value(qt.getField("o")).alias("_co"),
        qt.getField("o").getField("type").alias("_cot"),
    )
    is_ref = lambda c: (  # noqa: E731  build_term (:72-75)
        c.startswith("http") | c.startswith("urn:"))
    sel = selections.select(
        F.col("uri").alias("selection_uri"),
        F.col("edge.s").alias("_cs"),
        F.col("edge.p").alias("_cp"),
        F.col("edge.o").alias("_co"),
        F.when(is_ref(F.col("edge.o")), "i").otherwise("l").alias("_cot"),
    ).where(F.col("_cs").isNotNull())
    hits = sel.join(contains, ["_cs", "_cp", "_co", "_cot"]).select(
        "selection_uri", "stmt_uri")

    # one parent per node: the reference queries with limit=1 and takes
    # the first row (:136-150) — storage order again, so min(parent)
    derived = t.where(F.col("p") == PROV_WAS_DERIVED_FROM).groupBy(
        F.col("s").alias("child")).agg(
        F.min("o").alias("parent")).localCheckpoint()
    labels = t.where(F.col("p") == RDF_LABEL).groupBy(
        F.col("s").alias("uri")).agg(F.min("o").alias("label"))

    frontier = hits.select(
        "selection_uri", "stmt_uri", F.lit(0).alias("depth"),
        F.col("stmt_uri").alias("uri"))
    chain = frontier
    for _ in range(max_depth - 1):
        nxt = frontier.join(
            derived, frontier["uri"] == derived["child"]
        ).where(
            F.col("parent").isNotNull() & (F.col("parent") != F.col("uri"))
        ).select(
            "selection_uri", "stmt_uri",
            (F.col("depth") + 1).alias("depth"),
            F.col("parent").alias("uri"),
        ).localCheckpoint()
        if nxt.isEmpty():
            break
        chain = chain.unionByName(nxt)
        frontier = nxt

    nodes = chain.join(labels, "uri", "left").select(
        "selection_uri", "stmt_uri", "depth", "uri",
        F.coalesce("label", "uri").alias("label"))
    agg = nodes.groupBy("selection_uri", "stmt_uri").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(
                F.col("depth").alias("d"),
                F.col("uri").alias("uri"),
                F.col("label").alias("label"),
            ))),
            lambda x: F.struct(x.getField("uri").alias("uri"),
                               x.getField("label").alias("label")),
        ).alias("chain"))
    return agg.select(
        "selection_uri", "stmt_uri", "chain",
        F.array_join(F.transform(
            "chain", lambda x: x.getField("label")), " -> ")
        .alias("source_chain"),
        F.try_element_at(F.filter(F.transform(
            "chain", lambda x: x.getField("uri")),
            lambda u: u.startswith("urn:chunk:")), F.lit(1))
        .alias("content_chunk"),
    )


def list_sessions(
    triples: DataFrame, graph: str | None = GRAPH_RETRIEVAL
) -> DataFrame:
    """All top-level explainability sessions — list_sessions
    (:1097-1150): every Question entity minus those with a
    prov:wasDerivedFrom parent (sub-traces embedded in an agent trace),
    newest-first. The reference discovers questions via a tg:query
    predicate scan then filters with one extra query per question; here
    both sides are one anti-join."""
    t = _filtered(triples, graph)
    ents = explain_entities(t, graph=None)
    q = ents.where(F.col("entity_type") == "question").select(
        F.col("uri"), "question_type", "query", "timestamp")
    parented = t.where(F.col("p") == PROV_WAS_DERIVED_FROM) \
        .select(F.col("s").alias("uri")).distinct()
    return q.join(parented, "uri", "left_anti") \
        .orderBy(F.col("timestamp").desc(), F.col("uri"))


# ---------------------------------------------------------------------------
# Extraction hierarchy: Document -> Pages -> Chunks -> Edges
# (cli/show_extraction_provenance.py)
# ---------------------------------------------------------------------------

# dcterms: the CLI reader's title/format vocabulary
# (show_extraction_provenance.py:33-34). The reference EMITS document
# metadata under dc/elements/1.1 (provenance/namespaces.py:19) and
# tg:mimeType — so the reference tree's Title:/Type: header lines never
# actually fire against extraction-emitted data. We read BOTH vocabularies
# (dcterms first, the emitter's second) so the reader works against the
# repo's own emitters; documented read/write-drift fix.
DCTERMS = "http://purl.org/dc/terms/"
DCTERMS_TITLE = DCTERMS + "title"
DCTERMS_FORMAT = DCTERMS + "format"

# TYPE_MAP (show_extraction_provenance.py:37-42). The reference classifies
# by the first rdf:type in store-arrival order; we use this fixed priority
# (declaration order of the reference's TYPE_MAP) — deterministic, and
# identical whenever a node carries a single tg: type, which every
# reference emitter guarantees.
_HIER_TYPES = [
    (TG_DOCUMENT_TYPE, "document"),
    (TG_PAGE_TYPE, "page"),
    (TG_CHUNK_TYPE, "chunk"),
    (TG + "Subgraph", "subgraph"),
]


def _hier_classify(types_col):
    expr = F.lit("unknown")
    for uri, name in reversed(_HIER_TYPES):
        expr = F.when(F.array_contains(types_col, uri), name).otherwise(expr)
    return expr


def extraction_hierarchy(
    triples: DataFrame,
    root_uri: str,
    graph: str | None = GRAPH_SOURCE,
    max_depth: int = 8,
) -> DataFrame:
    """Traverse Document -> Pages -> Chunks -> extracted Edges from one
    root document — build_hierarchy (show_extraction_provenance.py:175-230):
    children via ``child prov:wasDerivedFrom parent`` in urn:graph:source
    (:148-154), per-node rdf:type classification against TYPE_MAP
    (:140-145), subgraph-typed children never become nodes — their
    ``tg:contains <<s p o>>`` RDF-star edges inline onto the parent
    (:208-216) — and a visited-set guard (:180-182).

    Returns flat rows (depth int, node_uri, parent_uri, node_type,
    label, title, fmt): one row per hierarchy node, plus one
    node_type='edge' row per inlined edge whose node_uri is the decoded
    ``<<s p o>>`` form (extract_value semantics, :93-119: IRIs bare,
    literal values bare). The nested tree / rendered display are
    explain_render.hierarchy_to_tree / render_extraction_tree.

    Determinism (documented divergences): a node reachable from two
    parents attaches to its MIN parent URI at its MIN depth — the
    reference's visited-set attaches to whichever parent the store
    happened to return first (:202-225, unordered store iteration).

    Scale: the walk touches only two projections of the store — the
    wasDerivedFrom edge frame and the rdf:type frame (both
    predicate-pushdown scans, joined once up front) — with the
    per-level frontier broadcast and localCheckpointed
    (admin.trace_provenance discipline); label/title/format metadata is
    resolved in ONE semi-join-reduced pass at the end over just the
    discovered nodes, never per node like the reference's 2-queries-
    per-node loop."""
    t = _filtered(triples, graph)
    spark = triples.sparkSession

    derived = t.where(
        (F.col("p") == PROV_WAS_DERIVED_FROM) & (F.col("otype") == OTYPE_URI)
    ).select(F.col("s").alias("child"), F.col("o").alias("parent")).distinct()
    types = t.where(F.col("p") == RDF_TYPE).groupBy(
        F.col("s").alias("child")
    ).agg(F.collect_set("o").alias("_types"))
    # built once, probed once per BFS level: persist for the duration of
    # the (eagerly-checkpointed) loop so each level doesn't re-scan the
    # store — at 100 TB this is the wasDerivedFrom projection, orders of
    # magnitude smaller than the store itself
    typed_children = derived.join(types, "child", "left").select(
        "child", "parent", _hier_classify(F.col("_types")).alias("ctype"),
    ).persist()

    root = spark.createDataFrame([(root_uri, 0)], "node_uri string, depth int")
    node_frames = [
        root.join(
            types.select(F.col("child").alias("node_uri"), "_types"),
            "node_uri", "left"
        ).select(
            "depth", "node_uri",
            F.lit(None).cast("string").alias("parent_uri"),
            _hier_classify(F.col("_types")).alias("node_type"),
        )
    ]
    sub_frames = []
    frontier = root.localCheckpoint(eager=True)
    seen = frontier.select("node_uri")
    for depth in range(1, max_depth + 1):
        step = typed_children.join(
            F.broadcast(frontier.select(F.col("node_uri").alias("parent"))),
            "parent",
        ).join(
            F.broadcast(seen.withColumnRenamed("node_uri", "child")),
            "child", "left_anti",
        ).localCheckpoint(eager=True)
        if step.isEmpty():
            break
        subs = step.where(F.col("ctype") == "subgraph").select(
            F.col("child").alias("sg_uri"),
            F.col("parent").alias("parent_uri"),
        ).distinct()
        sub_frames.append(subs.withColumn("depth", F.lit(depth)))
        reg = step.where(F.col("ctype") != "subgraph").groupBy("child").agg(
            F.min("parent").alias("parent_uri"),
            F.min("ctype").alias("node_type"),
        ).withColumn("depth", F.lit(depth))
        node_frames.append(reg.select(
            "depth", F.col("child").alias("node_uri"),
            "parent_uri", "node_type"))
        # eager checkpoint is load-bearing: left lazy, every LATER
        # level's broadcast of `seen` re-derives all prior frontiers
        # (A/B'd in r6: lazy frontier measured ~25% slower end-to-end)
        frontier = reg.select(
            F.col("child").alias("node_uri"), "depth"
        ).localCheckpoint(eager=True)
        seen = seen.unionByName(frontier.select("node_uri"))

    # every level is checkpointed, so nothing downstream re-reads it
    typed_children.unpersist()

    from functools import reduce
    nodes = reduce(DataFrame.unionByName, node_frames)

    # one metadata pass over the store, semi-join-reduced to found nodes
    meta_preds = [RDF_LABEL, DC_TITLE, DCTERMS_TITLE,
                  DCTERMS_FORMAT, TG_MIME_TYPE]
    meta = t.where(F.col("p").isin(meta_preds)).join(
        F.broadcast(nodes.select(F.col("node_uri").alias("s"))), "s"
    ).groupBy(F.col("s").alias("node_uri")).agg(
        F.min(F.when(F.col("p") == RDF_LABEL, F.col("o"))).alias("label"),
        F.coalesce(
            F.min(F.when(F.col("p") == DCTERMS_TITLE, F.col("o"))),
            F.min(F.when(F.col("p") == DC_TITLE, F.col("o"))),
        ).alias("title"),
        F.coalesce(
            F.min(F.when(F.col("p") == DCTERMS_FORMAT, F.col("o"))),
            F.min(F.when(F.col("p") == TG_MIME_TYPE, F.col("o"))),
        ).alias("fmt"),
    )
    out_nodes = nodes.join(meta, "node_uri", "left").select(
        "depth", "node_uri", "parent_uri", "node_type",
        "label", "title", "fmt")

    if not sub_frames:
        return out_nodes

    all_subs = reduce(DataFrame.unionByName, sub_frames)
    qt = F.from_json(F.col("o"), _QT_SCHEMA)
    val = lambda term: F.coalesce(term["iri"], term["value"])  # noqa: E731
    contains = t.where(
        (F.col("p") == TG_CONTAINS) & (F.col("otype") == OTYPE_TRIPLE)
    ).select(
        F.col("s").alias("sg_uri"),
        F.concat(
            F.lit("<<"), val(qt["s"]), F.lit(" "), val(qt["p"]),
            F.lit(" "), val(qt["o"]), F.lit(">>"),
        ).alias("edge"),
    )
    edges = contains.join(F.broadcast(all_subs), "sg_uri").select(
        F.col("depth"),
        F.col("edge").alias("node_uri"),
        "parent_uri",
        F.lit("edge").alias("node_type"),
        F.lit(None).cast("string").alias("label"),
        F.lit(None).cast("string").alias("title"),
        F.lit(None).cast("string").alias("fmt"),
    )
    return out_nodes.unionByName(edges)
