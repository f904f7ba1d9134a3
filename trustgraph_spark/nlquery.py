"""NL-question answering over the triple store: question analysis,
query-variant ontology matching, template-first SPARQL generation (with a
pluggable LLM translator seam), execution through the Catalyst SPARQL
engine, and template answer shaping.

The triple-store twin of ``graphql.structured_query``.  Reference behavior
reproduced (not code):

- query/ontology/question_analyzer.py — fully deterministic regex
  decomposition of the question into QuestionComponents (type, entities,
  relationships, constraints, aggregations, expected answer type,
  keywords) and embedding segments (get_question_segments:340-364).
- query/ontology/ontology_matcher.py:26-44 — the query-variant ontology
  selector: the SAME subset selection as extraction-time OntoRAG but with
  top_k=15 / similarity_threshold=0.6 ("higher k for queries ... lower
  threshold for broader coverage"), over question segments instead of
  chunks; plus the query enhancements :109-218 (traversal properties by
  question type, inverse/sibling related properties, inference rules).
- query/ontology/sparql_generator.py — template-based generation for the
  retrieval / count / boolean shapes (:116-185), the LLM middle path as a
  pluggable seam (:187-220 — prompted generation is the LLM boundary),
  and the keyword-CONTAINS fallback (:274-305); complexity scoring
  (:459-489) and variable extraction (:446-457).
- query/ontology/answer_generator.py:52-212 — template answer shaping per
  question type (count / boolean / list / single / facts / none / error)
  with the URI-tail cleanup and supporting-facts extraction (:394-430,
  capped at 5 per :518).
- query/ontology/query_service.py:144-242 — the orchestration order
  (analyze -> match -> generate -> execute -> answer) and the error
  response shaping (error answer text, confidence 0.0, metadata error).

Scale shape: question analysis, SPARQL generation, and answer templating
are per-QUESTION driver-side work over bounded inputs (the reference
processes one request at a time; a question is a sentence and a subset is
<= ~50 ontology elements) — the DATA-plane stages are the ontology
matcher (segments x broadcast element embeddings, one window) and the
generated SPARQL itself, which executes through ``sparql_select`` as a
full Catalyst plan over the distributed edges table.  No Python touches
the triple scan.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from enum import Enum

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# question analysis (question_analyzer.py — deterministic, no LLM)
# ---------------------------------------------------------------------------


class QuestionType(Enum):
    """Question taxonomy (question_analyzer.py:15-25)."""

    FACTUAL = "factual"
    RETRIEVAL = "retrieval"
    AGGREGATION = "aggregation"
    COMPARISON = "comparison"
    RELATIONSHIP = "relationship"
    BOOLEAN = "boolean"
    PROCESS = "process"
    TEMPORAL = "temporal"
    SPATIAL = "spatial"


@dataclass
class QuestionComponents:
    """Semantic decomposition of a question (question_analyzer.py:28-38)."""

    original_question: str
    question_type: QuestionType
    entities: list[str] = field(default_factory=list)
    relationships: list[str] = field(default_factory=list)
    constraints: list[str] = field(default_factory=list)
    aggregations: list[str] = field(default_factory=list)
    expected_answer_type: str = "text"
    keywords: list[str] = field(default_factory=list)


# pattern tables (question_analyzer.py:47-107) — ORDER MATTERS: the first
# matching type wins, in this insertion order
_QUESTION_PATTERNS: list[tuple[QuestionType, list[str]]] = [
    (QuestionType.FACTUAL, [r"^what\s+(?:is|are)", r"^who\s+(?:is|are)", r"^which\s+"]),
    (QuestionType.RETRIEVAL,
     [r"^find\s+", r"^list\s+", r"^show\s+", r"^get\s+", r"^retrieve\s+"]),
    (QuestionType.AGGREGATION,
     [r"^how\s+many", r"^count\s+",
      r"^what\s+(?:is|are)\s+the\s+(?:number|total|sum)"]),
    (QuestionType.COMPARISON,
     [r"(?:better|worse|more|less|greater|smaller)\s+than", r"compare\s+",
      r"difference\s+between"]),
    (QuestionType.RELATIONSHIP,
     [r"^how\s+(?:is|are).*related", r"relationship\s+between",
      r"connection\s+between"]),
    (QuestionType.BOOLEAN,
     [r"^(?:is|are|was|were|do|does|did|can|could|will|would|should)",
      r"^has\s+", r"^have\s+"]),
    (QuestionType.PROCESS, [r"^how\s+(?:to|do)", r"^explain\s+how"]),
    (QuestionType.TEMPORAL, [r"^when\s+", r"what\s+time", r"what\s+date"]),
    (QuestionType.SPATIAL, [r"^where\s+", r"location\s+of"]),
]

_AGGREGATION_KEYWORDS = [
    "count", "sum", "total", "average", "mean", "median",
    "maximum", "minimum", "max", "min", "number of",
]

_CONSTRAINT_PATTERNS = [
    r"(?:with|having|where)\s+(.+?)(?:\s+and|\s+or|$)",
    r"(?:greater|less|more|fewer)\s+than\s+(\d+)",
    r"(?:between|from)\s+(.+?)\s+(?:and|to)\s+(.+)",
    r"(?:before|after|since|until)\s+(.+)",
]

_REL_PATTERNS = [
    r"(\w+)\s+(?:of|by|from|to|with|for)\s+",
    r"has\s+(\w+)",
    r"belongs?\s+to",
    r"(?:created|written|authored|owned)\s+by",
    r"related\s+to",
    r"connected\s+to",
    r"associated\s+with",
]

_STOP_WORDS = {
    "the", "a", "an", "and", "or", "but", "in", "on", "at", "to",
    "for", "of", "with", "by", "from", "as", "is", "was", "are",
    "were", "be", "been", "being", "have", "has", "had", "do",
    "does", "did", "will", "would", "could", "should", "may",
    "might", "must", "can", "shall", "what", "which", "who",
    "when", "where", "why", "how",
}


def _dedup(items: list[str]) -> list[str]:
    return list(dict.fromkeys(items))


def analyze_question(question: str) -> QuestionComponents:
    """Decompose a question into components (question_analyzer.py:109-151).
    Fully deterministic — no LLM anywhere on this path."""
    q = question.lower().strip()

    qtype = QuestionType.FACTUAL
    for t, patterns in _QUESTION_PATTERNS:
        if any(re.search(p, q) for p in patterns):
            qtype = t
            break

    # entities: consecutive-capitalized phrases + quoted strings (:170-201)
    entities = re.findall(r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b", question)
    entities += re.findall(r'"([^"]+)"', question)
    entities += re.findall(r"'([^']+)'", question)
    entities = _dedup(entities)

    relationships: list[str] = []
    for p in _REL_PATTERNS:
        relationships.extend(re.findall(p, q))
    relationships = sorted({r for r in relationships if len(r) > 2})

    constraints: list[str] = []
    for p in _CONSTRAINT_PATTERNS:
        m = re.findall(p, q)
        if m:
            # the reference consumes only the FIRST match per pattern,
            # flattening a tuple group (:244-250)
            if isinstance(m[0], tuple):
                constraints.extend(list(m[0]))
            else:
                constraints.extend(m)
    constraints = [c.strip() for c in constraints if c and c.strip()]

    aggregations = [k for k in _AGGREGATION_KEYWORDS if k in q]

    if aggregations and any(
        a in ("count", "number of", "total", "average", "mean", "median", "sum")
        for a in aggregations
    ):
        answer_type = "number"
    elif qtype == QuestionType.BOOLEAN:
        answer_type = "boolean"
    elif qtype == QuestionType.TEMPORAL:
        answer_type = "datetime"
    elif qtype == QuestionType.SPATIAL:
        answer_type = "location"
    elif qtype == QuestionType.RETRIEVAL:
        answer_type = "list"
    elif qtype == QuestionType.COMPARISON:
        answer_type = "comparison"
    else:
        answer_type = "text"

    words = re.findall(r"\b\w+\b", q)
    keywords = _dedup([w for w in words if w not in _STOP_WORDS and len(w) > 2])

    return QuestionComponents(
        original_question=question,
        question_type=qtype,
        entities=entities,
        relationships=relationships,
        constraints=constraints,
        aggregations=aggregations,
        expected_answer_type=answer_type,
        keywords=keywords,
    )


def question_segments(
    question: str, components: QuestionComponents | None = None
) -> list[str]:
    """Embedding segments for ontology matching
    (question_analyzer.py:340-364): the full question, its comma/semicolon
    clauses, the extracted entities, and the keywords — deduped in order.
    Pass the already-computed ``components`` to skip re-analysis (the
    batch matcher analyzes once per question)."""
    segs = [question]
    segs += [c.strip() for c in re.split(r"[,;]", question) if len(c.strip()) > 3]
    comp = components or analyze_question(question)
    segs += comp.entities
    segs += comp.keywords
    return _dedup(segs)


# ---------------------------------------------------------------------------
# query-variant ontology matcher (ontology_matcher.py)
# ---------------------------------------------------------------------------

#: query-time selector parameters (ontology_matcher.py:32-35): higher k
#: for queries, lower threshold for broader coverage
QUERY_TOP_K = 15
QUERY_SIMILARITY_THRESHOLD = 0.6
#: sibling-property cap shared with the traversal dict
#: (ontology_matcher.py:183 — len(traversal_properties) < 3)
_SIBLING_TRAVERSAL_CAP = 3


#: separator between question id and segment id inside the selector's
#: chunk_id (US control char — cannot occur in reasonable question ids)
_QSEP = "\x1f"


def match_questions_to_ontology(
    questions: list[tuple[str, str]],
    elements: DataFrame,
    embedder=None,
    top_k: int = QUERY_TOP_K,
    similarity_threshold: float = QUERY_SIMILARITY_THRESHOLD,
) -> DataFrame:
    """Match a BATCH of questions to their relevant ontology subsets —
    the query-time parameterization of ``select_ontology_subset`` (same
    embedding + broadcast-cosine machinery, top_k 15 / threshold 0.6 per
    ontology_matcher.py:32-35) over each question's SEGMENTS, enhanced
    for query processing (:75-184):

    - base: per-segment top-k element matches merged across a question's
      segments (an element keeps its best score; role 'selected')
    - RELATIONSHIP questions add object properties connecting selected
      classes (domain OR range in the subset) as role 'traversal'
    - RETRIEVAL questions add object+datatype properties whose domain is
      a selected class as 'traversal'
    - AGGREGATION questions add datatype properties with 'count'/'number'
      in the id as 'traversal'
    - inverse properties of selected object properties join the subset as
      role 'inverse' (:164-171 adds them to object_properties proper)
    - sibling object properties (same domain as a selected one) fill the
      traversal set up to 3 total per (question, ontology), ordered by
      element_id — the reference iterates dict insertion order, which
      Python does not make part of the contract; the sort makes our fill
      deterministic

    Spark-first: the unit of parallelism is the question BATCH (the
    reference matches one request at a time) — all questions share ONE
    embed pass, ONE selection window and ONE enhancement plan, so a
    thousand questions cost the same number of stages as one.

    questions: [(question_id, question_text)] — ids are analyzed
    driver-side (bounded regex work, as in the reference).
    elements: the ELEMENTS_DDL ontology dimension (small, broadcast).
    Returns (question_id, ontology_id, element_type, element_id, role,
    score) — score NULL for enhancement rows."""
    from .operators.ontology import select_ontology_subset

    spark = elements.sparkSession
    comps = {qid: analyze_question(q) for qid, q in questions}
    seg_rows = [
        (f"{qid}{_QSEP}seg:{i}", s)
        for qid, q in questions
        for i, s in enumerate(question_segments(q, comps[qid]))
    ]
    # a question yields a handful of segments; one partition keeps the
    # embed seam to a single Python task (repartition, NOT coalesce —
    # coalescing a many-partition local collection into the Python seam
    # costs a fixed per-parent-partition penalty on this runtime)
    seg_chunks = spark.createDataFrame(
        seg_rows, "chunk_id string, text string"
    ).repartition(1)
    per_seg = select_ontology_subset(
        seg_chunks, elements, embedder=embedder,
        top_k=top_k, similarity_threshold=similarity_threshold,
    ).withColumn("question_id", F.substring_index("chunk_id", _QSEP, 1))
    keys = ["ontology_id", "element_type", "element_id"]
    base = (
        per_seg.groupBy("question_id", *keys)
        .agg(F.max("score").alias("score"))
        .withColumn("role", F.lit("selected"))
        # the enhancement references the selection from ~8 branches;
        # unmaterialized, each re-runs the embed + cosine + window chain
        # (measured 2x the whole enhancement).  The frame is <= top_k x
        # n_questions x n_ontologies rows
        .localCheckpoint()
    )
    qtypes = spark.createDataFrame(
        [(qid, comps[qid].question_type.value) for qid, _ in questions],
        "question_id string, qtype string",
    )
    return enhance_subsets_for_query(base, elements, qtypes)


def match_question_to_ontology(
    question: str,
    elements: DataFrame,
    embedder=None,
    top_k: int = QUERY_TOP_K,
    similarity_threshold: float = QUERY_SIMILARITY_THRESHOLD,
) -> DataFrame:
    """Single-question wrapper over ``match_questions_to_ontology``;
    returns (ontology_id, element_type, element_id, role, score)."""
    return match_questions_to_ontology(
        [("q", question)], elements, embedder=embedder,
        top_k=top_k, similarity_threshold=similarity_threshold,
    ).drop("question_id")


def enhance_subset_for_query(
    base: DataFrame, elements: DataFrame, question_type: QuestionType
) -> DataFrame:
    """Single-subset wrapper over ``enhance_subsets_for_query`` — the
    query enhancement pass (ontology_matcher.py:75-184) over a hand-built
    base selection (ontology_id, element_type, element_id, role, score)
    with role 'selected'."""
    spark = elements.sparkSession
    qtypes = spark.createDataFrame(
        [("q", question_type.value)], "question_id string, qtype string"
    )
    return enhance_subsets_for_query(
        base.withColumn("question_id", F.lit("q")), elements, qtypes
    ).drop("question_id")


def enhance_subsets_for_query(
    base: DataFrame, elements: DataFrame, qtypes: DataFrame
) -> DataFrame:
    """Batched query-enhancement pass (ontology_matcher.py:75-184) — see
    match_questions_to_ontology for the rules.  base carries
    (question_id, ontology_id, element_type, element_id, role, score)
    with role 'selected'; qtypes is the per-question type table.  The
    question-type branching is columnar (the qtype joins the candidate
    sets), so every question flows through ONE plan."""
    keys = ["ontology_id", "element_type", "element_id"]
    qkeys = ["question_id", *keys]
    el = F.broadcast(elements)
    qt = F.broadcast(qtypes.select(
        F.col("question_id").alias("_qid"), F.col("qtype").alias("_qt")
    ))
    sel_classes = base.where(F.col("element_type") == "class").select(
        "question_id",
        F.col("ontology_id").alias("_ont"),
        F.col("element_id").alias("_cls"),
    )
    sel_keys = base.select(*qkeys)

    def _not_selected(df: DataFrame) -> DataFrame:
        return df.join(sel_keys, qkeys, "left_anti")

    props = el.where(F.col("element_type") != "class")
    # properties touching the selected classes, per question, deduped when
    # a property's domain AND range both hit the subset
    dom_hit = props.join(
        sel_classes,
        (F.col("_ont") == F.col("ontology_id")) & (F.col("domain") == F.col("_cls")),
    ).select(*qkeys)
    rng_hit = props.where(F.col("element_type") == "objectProperty").join(
        sel_classes,
        (F.col("_ont") == F.col("ontology_id")) & (F.col("range") == F.col("_cls")),
    ).select(*qkeys)

    # qtype-conditional traversal, as one union of tagged candidate sets
    rel_cand = (
        dom_hit.where(F.col("element_type") == "objectProperty")
        .unionByName(rng_hit)
        .withColumn("_q", F.lit(QuestionType.RELATIONSHIP.value))
    )
    ret_cand = dom_hit.withColumn("_q", F.lit(QuestionType.RETRIEVAL.value))
    # aggregation: count/number datatype props from ontologies already in
    # the question's subset (the reference walks each matched subset's
    # own ontology)
    agg_cand = (
        props.where(
            (F.col("element_type") == "datatypeProperty")
            & (F.lower(F.col("element_id")).contains("count")
               | F.lower(F.col("element_id")).contains("number"))
        )
        .join(
            base.select("question_id", "ontology_id").distinct(),
            "ontology_id",
        )
        .select(*qkeys)
        .withColumn("_q", F.lit(QuestionType.AGGREGATION.value))
    )
    traversal = (
        rel_cand.unionByName(ret_cand).unionByName(agg_cand)
        .join(qt, (F.col("question_id") == F.col("_qid"))
              & (F.col("_q") == F.col("_qt")), "left_semi")
        .select(*qkeys)
        .distinct()
    )
    # referenced by the sibling anti-join, the per-(question, ontology)
    # cap count and the final union — materialize the tiny frame once
    traversal = (
        _not_selected(traversal)
        .withColumn("role", F.lit("traversal"))
        .localCheckpoint()
    )

    # inverse properties of selected object properties (:164-171)
    sel_obj = base.where(F.col("element_type") == "objectProperty").select(
        "question_id",
        F.col("ontology_id").alias("_ont"),
        F.col("element_id").alias("_pid"),
    )
    inverse = (
        el.where(
            (F.col("element_type") == "objectProperty")
            & F.col("inverse_of").isNotNull()
        )
        .join(
            sel_obj,
            (F.col("_ont") == F.col("ontology_id"))
            & (F.col("_pid") == F.col("element_id")),
        )
        .select(
            "question_id",
            "ontology_id",
            F.lit("objectProperty").alias("element_type"),
            F.col("inverse_of").alias("element_id"),
        )
        # only properties that exist in the dimension survive (:168-169)
        .join(
            el.select(*keys).where(F.col("element_type") == "objectProperty"),
            keys,
            "left_semi",
        )
    )
    inverse = _not_selected(inverse.distinct()).withColumn("role", F.lit("inverse"))

    # sibling object properties: same domain as a selected object property,
    # filling traversal up to the cap per (question, ontology) — the
    # reference holds one subset per ontology per request (:173-184)
    sel_domains = (
        base.where(F.col("element_type") == "objectProperty")
        .join(el, keys)
        .where(F.col("domain").isNotNull())
        .select(
            "question_id",
            F.col("ontology_id").alias("_ont"),
            F.col("domain").alias("_dom"),
        )
        .distinct()
    )
    sib_pool = (
        props.where(F.col("element_type") == "objectProperty")
        .join(
            sel_domains,
            (F.col("_ont") == F.col("ontology_id"))
            & (F.col("_dom") == F.col("domain")),
        )
        .select(*qkeys)
    )
    sib_pool = (
        _not_selected(sib_pool.distinct())
        .join(traversal.select(*qkeys), qkeys, "left_anti")
        .join(inverse.select(*qkeys), qkeys, "left_anti")
    )
    n_trav = traversal.groupBy("question_id", "ontology_id").agg(
        F.count("*").cast("int").alias("_n_trav")
    )
    w_sib = Window.partitionBy("question_id", "ontology_id").orderBy("element_id")
    siblings = (
        sib_pool.withColumn("_rn", F.row_number().over(w_sib))
        .join(F.broadcast(n_trav), ["question_id", "ontology_id"], "left")
        .withColumn("_n_trav", F.coalesce(F.col("_n_trav"), F.lit(0)))
        .where(F.col("_rn") <= F.greatest(
            F.lit(0), F.lit(_SIBLING_TRAVERSAL_CAP) - F.col("_n_trav")
        ))
        .select(*qkeys)
        .withColumn("role", F.lit("sibling"))
    )

    enh = (
        traversal.unionByName(inverse).unionByName(siblings)
        .withColumn("score", F.lit(None).cast("double"))
    )
    return base.select(*qkeys, "role", "score").unionByName(
        enh.select(*qkeys, "role", "score")
    )


def inference_rules(subset: DataFrame, elements: DataFrame) -> list[dict]:
    """Reasoning hints for the matched subset
    (ontology_matcher.py:186-218): a transitivity rule when any selected
    class declares subclass_of, and one inverse rule per selected object
    property with inverse_of.  (The reference also emits a symmetry rule
    for owl:equivalentClass; the ELEMENTS_DDL dimension carries no
    equivalence axioms, so that rule has no trigger here.)  Bounded by the
    subset size — driver-side by design."""
    keys = ["ontology_id", "element_type", "element_id"]
    joined = subset.join(F.broadcast(elements), keys).select(
        "element_type", "element_id", "subclass_of", "inverse_of"
    ).collect()
    rules: list[dict] = []
    if any(r.element_type == "class" and r.subclass_of for r in joined):
        rules.append({
            "type": "transitivity",
            "property": "rdfs:subClassOf",
            "description": "Subclass relationships are transitive",
        })
    for r in joined:
        if r.element_type == "objectProperty" and r.inverse_of:
            rules.append({
                "type": "inverse",
                "property": r.element_id,
                "inverse": r.inverse_of,
                "description": f"{r.element_id} is inverse of {r.inverse_of}",
            })
    return rules


# ---------------------------------------------------------------------------
# SPARQL generation (sparql_generator.py — template-first, LLM as a seam)
# ---------------------------------------------------------------------------


@dataclass
class GeneratedSPARQL:
    """Generated query + metadata (sparql_generator.py:16-24)."""

    query: str
    variables: list[str]
    query_type: str  # SELECT | ASK | CONSTRUCT | DESCRIBE
    explanation: str
    complexity_score: float


_PREFIX_BLOCK = """PREFIX : <{namespace}>
PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
"""


def subset_to_dicts(subset: DataFrame, elements: DataFrame) -> dict:
    """Collect the matched subset (bounded: <= top_k + enhancements rows)
    into the classes / object_properties / datatype_properties dicts the
    generator templates consume — the reference's OntologySubset shape.
    Roles 'selected'/'inverse' land in the main dicts, 'traversal'/
    'sibling' in traversal_properties (ontology_matcher.py:87-96)."""
    keys = ["ontology_id", "element_type", "element_id"]
    rows = subset.join(F.broadcast(elements), keys).collect()
    out = {
        "classes": {},
        "object_properties": {},
        "datatype_properties": {},
        "traversal_properties": {},
    }
    for r in sorted(rows, key=lambda r: (r.element_type, r.element_id)):
        d = {
            "label": r.label, "comment": r.comment,
            "subclass_of": r.subclass_of, "domain": r.domain,
            "range": r.range, "inverse_of": r.inverse_of,
        }
        if r.role in ("traversal", "sibling"):
            out["traversal_properties"][r.element_id] = d
        elif r.element_type == "class":
            out["classes"][r.element_id] = d
        elif r.element_type == "objectProperty":
            out["object_properties"][r.element_id] = d
        else:
            out["datatype_properties"][r.element_id] = d
    return out


def _find_matching_class(entity: str, classes: dict) -> str | None:
    """Direct -> label -> partial class matching
    (sparql_generator.py:307-338)."""
    e = entity.lower()
    for cid in classes:
        if cid.lower() == e:
            return cid
    for cid, d in classes.items():
        if (d.get("label") or "").lower() == e:
            return cid
    for cid in classes:
        if e in cid.lower() or cid.lower() in e:
            return cid
    return None


def _build_constraints(components: QuestionComponents) -> str:
    """FILTER clauses from numeric constraints
    (sparql_generator.py:340-368)."""
    out = []
    for c in components.constraints:
        nums = re.findall(r"\d+", c)
        if "greater than" in c.lower() and nums:
            out.append(f"FILTER(?value > {nums[0]})")
        elif "less than" in c.lower() and nums:
            out.append(f"FILTER(?value < {nums[0]})")
    return "\n  ".join(out)


def _extract_variables(query: str) -> list[str]:
    return sorted(set(re.findall(r"\?(\w+)", query)))


def _complexity(query: str) -> float:
    """Feature-count complexity score (sparql_generator.py:459-489)."""
    score = 0.0
    qu = query.upper()
    if "JOIN" in qu or "UNION" in qu:
        score += 0.3
    if "FILTER" in qu:
        score += 0.2
    if "OPTIONAL" in qu:
        score += 0.1
    if "GROUP BY" in qu:
        score += 0.2
    if "ORDER BY" in qu:
        score += 0.1
    if "*" in query:
        score += 0.1
    score += len(_extract_variables(query)) * 0.05
    return min(score, 1.0)


def generate_sparql(
    components: QuestionComponents,
    subset: dict,
    namespace: str = "http://example.org/",
    translator=None,
) -> GeneratedSPARQL:
    """Template-first SPARQL generation (sparql_generator.py:87-114):
    try the deterministic templates, then the pluggable ``translator``
    seam (the LLM boundary — called with (question, subset), must return
    a SPARQL string or None; validated to start with a query keyword as
    :203-215 does), then the keyword-CONTAINS fallback."""
    t = _try_templates(components, subset, namespace)
    if t is not None:
        return t

    if translator is not None:
        q = translator(components.original_question, subset)
        if q:
            q = q.strip()
            head = q.split()[0].upper() if q.split() else ""
            if head in ("SELECT", "ASK", "CONSTRUCT", "DESCRIBE"):
                return GeneratedSPARQL(
                    query=q,
                    variables=_extract_variables(q),
                    query_type=head,
                    explanation="Generated by translator seam",
                    complexity_score=_complexity(q),
                )

    return _fallback_query(components, namespace)


def _try_templates(
    components: QuestionComponents, subset: dict, namespace: str
) -> GeneratedSPARQL | None:
    """The three deterministic template shapes
    (sparql_generator.py:116-185).  (The reference also defines
    property_query / hierarchy_query templates but its matcher never
    selects them — same here.)"""
    classes = subset.get("classes", {})
    prefix = _PREFIX_BLOCK.format(namespace=namespace)

    # retrieval: "find all X" where X IS a class (exact lower match — the
    # template intentionally requires a direct hit before the looser
    # _find_matching_class resolves the canonical id, :131-135)
    if (
        components.question_type == QuestionType.RETRIEVAL
        and len(components.entities) == 1
        and components.entities[0].lower() in {c.lower() for c in classes}
    ):
        cls = _find_matching_class(components.entities[0], classes)
        if cls:
            query = (
                f"{prefix}\nSELECT ?entity ?label WHERE {{\n"
                f"  ?entity rdf:type :{cls} .\n"
                f"  OPTIONAL {{ ?entity rdfs:label ?label }}\n}}"
            )
            return GeneratedSPARQL(
                query=query,
                variables=["entity", "label"],
                query_type="SELECT",
                explanation=f"Retrieve all instances of {cls}",
                complexity_score=0.3,
            )

    # aggregation: "how many X"
    if (
        components.question_type == QuestionType.AGGREGATION
        and "count" in components.aggregations
        and components.entities
    ):
        cls = _find_matching_class(components.entities[0], classes)
        if cls:
            extra = _build_constraints(components)
            body = f"  ?entity rdf:type :{cls} .\n"
            if extra:
                body += f"  {extra}\n"
            query = (
                f"{prefix}\nSELECT (COUNT(?entity) AS ?count) "
                f"WHERE {{\n{body}}}"
            )
            return GeneratedSPARQL(
                query=query,
                variables=["count"],
                query_type="SELECT",
                explanation=f"Count instances of {cls}",
                complexity_score=0.4,
            )

    # boolean: "is X a Y" / "is X <prop> Y"
    if components.question_type == QuestionType.BOOLEAN:
        if len(components.entities) >= 2:
            s, o = components.entities[0], components.entities[1]
            obj_props = subset.get("object_properties", {})
            if obj_props:
                # the reference takes the first property in the subset
                # (:387-388); dict order here is the sorted collect order
                p = next(iter(obj_props))
                pattern = f":{s} :{p} :{o} ."
            else:
                pattern = f":{s} rdf:type :{o} ."
            query = f"{prefix}\nASK {{\n  {pattern}\n}}"
            return GeneratedSPARQL(
                query=query,
                variables=[],
                query_type="ASK",
                explanation="Boolean query for fact checking",
                complexity_score=0.2,
            )

    return None


def _fallback_query(
    components: QuestionComponents, namespace: str
) -> GeneratedSPARQL:
    """Keyword-CONTAINS fallback (sparql_generator.py:274-305)."""
    kw = components.keywords[0] if components.keywords else "entity"
    prefix = _PREFIX_BLOCK.format(namespace=namespace)
    query = (
        f"{prefix}\nSELECT ?subject ?predicate ?object WHERE {{\n"
        f"  ?subject ?predicate ?object .\n"
        f'  FILTER(CONTAINS(STR(?subject), "{kw}"))\n}}\nLIMIT 10'
    )
    return GeneratedSPARQL(
        query=query,
        variables=["object", "predicate", "subject"],
        query_type="SELECT",
        explanation="Fallback query for basic pattern matching",
        complexity_score=0.1,
    )


# ---------------------------------------------------------------------------
# answer shaping (answer_generator.py — template path)
# ---------------------------------------------------------------------------

_ANSWER_TEMPLATES = {
    "count": "There are {count} {entity_type}.",
    "boolean_true": "Yes, {statement} is true.",
    "boolean_false": "No, {statement} is not true.",
    "list": "The {entity_type} are: {items}.",
    "single": "The {property} of {entity} is {value}.",
    "none": "No results were found for your query.",
    "error": "I encountered an error processing your query: {error}",
}


def _clean_uri(v) -> str:
    s = str(v)
    if s.startswith("http"):
        return s.split("/")[-1].split("#")[-1]
    return s


def _extract_items(rows: list[dict]) -> list[str]:
    """First value per binding, URI tails cleaned
    (answer_generator.py:356-392)."""
    items = []
    for r in rows:
        for _, v in r.items():
            items.append(_clean_uri(v))
            break
    return items


def _extract_facts(rows: list[dict]) -> list[str]:
    """var: value pairs per binding (answer_generator.py:394-430)."""
    return [
        ", ".join(f"{k}: {_clean_uri(v)}" for k, v in r.items()) for r in rows
    ]


def _boolean_statement(components: QuestionComponents) -> str:
    """Strip question words for the yes/no sentence
    (answer_generator.py:432-448)."""
    s = components.original_question.lower()
    s = s.replace("is ", "").replace("are ", "").replace("does ", "")
    return s.replace("?", "").strip()


def _infer_entity_type(components: QuestionComponents, classes: dict) -> str:
    """Entity-type noun for the count/list templates
    (answer_generator.py:450-473)."""
    for entity in components.entities:
        e = entity.lower()
        for cid in classes:
            if cid.lower() == e or e in cid.lower():
                return cid
    return components.entities[0] if components.entities else "entities"


def generate_answer(
    components: QuestionComponents,
    rows: list[dict],
    ask_result: bool | None = None,
    classes: dict | None = None,
) -> dict:
    """Template answer shaping (answer_generator.py:144-212 — the
    deterministic fallback the reference uses whenever no prompt service
    is wired; prompted generation is the LLM boundary).  rows: the
    executed query's bindings as plain dicts.  Returns {answer,
    supporting_facts (capped 5, :518), result_count}."""
    classes = classes or {}
    facts = _extract_facts(rows)
    base = {"supporting_facts": facts[:5], "result_count": len(rows)}

    if not rows and ask_result is None:
        return {**base, "answer": _ANSWER_TEMPLATES["none"]}

    if components.question_type == QuestionType.BOOLEAN and ask_result is not None:
        key = "boolean_true" if ask_result else "boolean_false"
        return {**base, "answer": _ANSWER_TEMPLATES[key].format(
            statement=_boolean_statement(components)
        )}

    if components.question_type == QuestionType.AGGREGATION:
        count = len(rows)
        if rows:
            for k, v in rows[0].items():
                if "count" in k.lower():
                    count = int(v)
                    break
        return {**base, "answer": _ANSWER_TEMPLATES["count"].format(
            count=count, entity_type=_infer_entity_type(components, classes)
        )}

    if components.question_type == QuestionType.RETRIEVAL:
        items = _extract_items(rows)
        if len(items) == 1:
            entity = components.entities[0] if components.entities else "entity"
            return {**base, "answer": _ANSWER_TEMPLATES["single"].format(
                property="value", entity=entity, value=items[0]
            )}
        return {**base, "answer": _ANSWER_TEMPLATES["list"].format(
            entity_type=_infer_entity_type(components, classes),
            items=", ".join(items),
        )}

    if components.question_type == QuestionType.FACTUAL:
        return {**base, "answer": ". ".join(facts) if facts
                else _ANSWER_TEMPLATES["none"]}

    items = _extract_items(rows)
    if items:
        return {**base, "answer": "Found: " + ", ".join(items[:5])
                + ("..." if len(items) > 5 else "")}
    return {**base, "answer": _ANSWER_TEMPLATES["none"]}


# ---------------------------------------------------------------------------
# orchestration (query_service.py process flow)
# ---------------------------------------------------------------------------


def nl_graph_query(
    edges: DataFrame,
    elements: DataFrame,
    question: str,
    translator=None,
    embedder=None,
    namespace: str = "http://example.org/",
    top_k: int = QUERY_TOP_K,
    similarity_threshold: float = QUERY_SIMILARITY_THRESHOLD,
    collection: str | None = None,
    answer_rows_limit: int = 1000,
    optimizer_hint=None,
) -> dict:
    """NL question over the triple store, end to end — the triple-store
    twin of ``graphql.structured_query`` (query_service.py:144-242 order:
    analyze -> match ontology -> generate -> execute -> answer):

    1. deterministic question analysis
    2. query-variant ontology matching (top_k 15 / threshold 0.6)
    3. template-first SPARQL generation with the ``translator`` LLM seam
       (+ the nlservice.QueryOptimizer pass when ``optimizer_hint`` is an
       OptimizationHint — LIMIT/OPTIONAL/DISTINCT/type-constraint
       rewrites, query_optimizer.py)
    4. execution through ``sparql_select`` (a full Catalyst plan over the
       distributed edges table — the data-plane leg)
    5. template answer shaping

    Returns {answer, confidence, components, subset, sparql, result (the
    executed DataFrame), supporting_facts, result_count, metadata}.  On
    failure, the reference's error shaping (:220-242): error answer text,
    confidence 0.0, metadata.error."""
    from .sparql import sparql_select

    try:
        comp = analyze_question(question)
        subset_df = match_question_to_ontology(
            question, elements, embedder=embedder,
            top_k=top_k, similarity_threshold=similarity_threshold,
        )
        subset = subset_to_dicts(subset_df, elements)
        gen = generate_sparql(comp, subset, namespace=namespace,
                              translator=translator)
        plan = None
        if optimizer_hint is not None:
            from .nlservice import QueryOptimizer

            gen, plan = QueryOptimizer().optimize_sparql(
                gen, comp, subset, optimizer_hint
            )
        result = sparql_select(edges, gen.query, collection=collection)
        if gen.query_type == "ASK":
            ask = bool(result.collect()[0]["ask"])
            rows: list[dict] = []
        else:
            ask = None
            # the TEMPLATED sentence collects a bounded prefix; ``result``
            # stays the full lazy DataFrame for callers who want the data
            # (the reference collects every binding — fine per-request,
            # not against a 100-TB store)
            rows = [r.asDict() for r in result.limit(answer_rows_limit).collect()]
        shaped = generate_answer(comp, rows, ask_result=ask,
                                 classes=subset["classes"])
        return {
            **shaped,
            "confidence": 0.8,  # template default (nlp_query service.py:279)
            "components": comp,
            "subset": subset,
            "sparql": gen,
            "result": result,
            "metadata": {
                "backend_used": "spark",
                "query_language": "sparql",
                "query_type": gen.query_type,
                **({"query_plan": plan} if plan is not None else {}),
            },
        }
    except Exception as e:  # error shaping per query_service.py:220-242
        return {
            "answer": _ANSWER_TEMPLATES["error"].format(error=str(e)),
            "confidence": 0.0,
            "components": analyze_question(question),
            "subset": None,
            "sparql": None,
            "result": None,
            "supporting_facts": [],
            "result_count": 0,
            "metadata": {"error": str(e)},
        }
