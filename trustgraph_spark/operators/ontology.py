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
    words = F.filter(
        F.split(F.lower(col), r"\W+"), lambda w: w != ""
    )
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
