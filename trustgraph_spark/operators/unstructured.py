"""Universal document decoder: element partitioning seam + native
section grouping, page grouping, and section-text assembly.

Reference: trustgraph-unstructured/trustgraph/decoding/universal/
- strategies.py:13-150 — the five section-grouping strategies
  (whole-document / heading / element-type / count / size).
- processor.py:73-115 ``assemble_section_text`` (text joined with
  blank lines, tables prefer their HTML form, images skipped from text
  but counted), :215-233 ``group_by_page`` (missing page -> 1, sorted),
  :235-373 the emit flow (empty sections skipped, 'Page N' /
  'Section i' labels with 1-based section indices, element-type csv
  sorted, table/image counts emitted only when > 0, images stored
  separately and parented to their page's section when that page
  produced text), :374-517 the page-based dispatch (mime in the
  page-based set OR any element carries a page number).

The reference walks one document at a time with Python loops around the
``unstructured`` library's ``partition()``.  Here ``partition()`` is the
sanctioned per-document decode seam (the library is not in this image;
plain text gets a REAL stdlib partitioner), and everything after the
seam — grouping, strategy assignment, assembly, skip rules — is native
column work: the order-dependent strategies lower to window functions
over (doc_id, element_idx), and the one genuinely sequential strategy
('size', accumulate-until-limit) lowers to a Catalyst ``aggregate``
fold over the per-document element-length array, still no UDF.

Determinism note: the reference mints uuid4 page/section/image URIs
(uris.py:32-49); we mint sha256 URIs keyed on (doc, page|index) so
reruns are idempotent, the same divergence documented for
subgraph/derived-entity activities.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

# processor.py:65-71
PAGE_BASED_FORMATS = (
    "application/pdf",
    "application/vnd.openxmlformats-officedocument."
    "presentationml.presentation",
    "application/vnd.openxmlformats-officedocument."
    "spreadsheetml.sheet",
    "application/vnd.ms-excel",
)

COMPONENT_NAME = "universal-decoder"
COMPONENT_VERSION = "1.0.0"

ELEMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("mime_type", T.StringType()),
    T.StructField("element_idx", T.IntegerType()),
    T.StructField("category", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("text_as_html", T.StringType()),
    T.StructField("page_number", T.IntegerType()),
])

STRATEGIES = ("whole-document", "heading", "element-type", "count", "size")


def text_partition(blob: bytes, mime_type: str | None) -> list[dict]:
    """REAL partitioner for text/plain — the stdlib-decodable arm of the
    decode seam (the reference delegates even .txt to ``unstructured``,
    which emits one NarrativeText per blank-line-separated block)."""
    text = blob.decode("utf-8", errors="replace")
    parts = [p.strip() for p in text.split("\n\n")]
    return [
        {"category": "NarrativeText", "text": p, "text_as_html": None,
         "page_number": None}
        for p in parts if p
    ]


def partition_documents(docs: DataFrame, partition_fn=None) -> DataFrame:
    """The ``partition()`` seam (processor.py:167-214): per-document
    element extraction as mapInPandas over (doc_id, content, mime_type)
    rows.  ``partition_fn(blob, mime) -> list[element dict]`` defaults
    to the stdlib text partitioner for text/* and raises for binary
    formats whose decoder library is absent from this image (declared
    stub, same policy as multimodal/PDF decode).

    Seam rationale: the element extraction itself is a third-party
    C-backed document parser (unstructured/poppler/libreoffice) with no
    column-expression form; everything downstream of the seam is
    native."""
    fn = partition_fn or _default_partition
    schema = ELEMENT_SCHEMA

    def run(batches):
        import pandas as pd

        for pdf in batches:
            out = []
            for doc_id, blob, mime in zip(
                pdf["doc_id"], pdf["content"], pdf["mime_type"]
            ):
                els = fn(bytes(blob), mime)
                for i, el in enumerate(els):
                    out.append({
                        "doc_id": str(doc_id),
                        "mime_type": mime,
                        "element_idx": i,
                        "category": el.get("category",
                                           "UncategorizedText"),
                        "text": el.get("text"),
                        "text_as_html": el.get("text_as_html"),
                        "page_number": el.get("page_number"),
                    })
            yield pd.DataFrame(
                out, columns=[f.name for f in schema.fields])

    return docs.select("doc_id", "content", "mime_type") \
        .mapInPandas(run, schema=schema)


def _default_partition(blob: bytes, mime_type: str | None) -> list[dict]:
    if mime_type is None or mime_type.startswith("text/"):
        return text_partition(blob, mime_type)
    raise NotImplementedError(
        f"no partitioner for {mime_type!r} in this image; pass "
        "partition_fn (the reference shells to unstructured.partition)"
    )


def assign_sections(
    elements: DataFrame,
    strategy: str = "whole-document",
    element_count: int = 20,
    max_size: int = 4000,
) -> DataFrame:
    """Assign a 1-based ``section_idx`` to every element, per document —
    the five reference strategies (strategies.py:13-150) over an
    (doc_id, element_idx, category, text, ...) frame.  The caller
    filters images out first, as the reference does (processor.py:
    483-498).

    whole-document / heading / element-type / count are window
    expressions over (doc_id ORDER BY element_idx): 'heading' opens a
    group at every Title except one in leading position (the
    current-group-empty guard), with the no-headings fallback to
    whole-document; 'element-type' breaks on narrative<->table
    transitions; 'count' is a fixed-size ruler.  'size'
    (accumulate-until-char-limit, never splitting an element) is a
    genuinely sequential fold, lowered to one Catalyst ``aggregate``
    over the per-document length array and joined back by position —
    per-document state, no UDF, no window over the corpus."""
    if strategy not in STRATEGIES:
        raise ValueError(
            f"Unknown section strategy: {strategy}. "
            f"Available: {', '.join(STRATEGIES)}")

    w = Window.partitionBy("doc_id").orderBy("element_idx")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("doc_id")

    if strategy == "whole-document":
        return elements.withColumn("section_idx", F.lit(1))

    if strategy == "heading":
        pos = F.row_number().over(w)
        boundary = ((F.col("category") == "Title") & (pos > 1)).cast("int")
        has_title = F.max(
            (F.col("category") == "Title").cast("int")).over(wall)
        e = elements.withColumn("_b", boundary).withColumn("_ht", has_title)
        return e.withColumn(
            "section_idx",
            F.when(F.col("_ht") == 0, F.lit(1))
            .otherwise(F.sum("_b").over(wcum) + 1),
        ).drop("_b", "_ht")

    if strategy == "element-type":
        is_t = (F.col("category") == "Table").cast("int")
        prev = F.lag(is_t).over(w)
        boundary = (prev.isNotNull() & (prev != is_t)).cast("int")
        return elements.withColumn("_b", boundary).withColumn(
            "section_idx", F.sum("_b").over(wcum) + 1).drop("_b")

    if strategy == "count":
        pos0 = F.row_number().over(w) - 1
        return elements.withColumn(
            "section_idx",
            (F.floor(pos0 / F.lit(element_count)) + 1).cast("int"))

    # strategy == "size": fold (gid, size, count) over the length array;
    # close the group when it is non-empty and would exceed max_size
    # (strategies.py:105-135 — element boundaries are never split, an
    # oversize element becomes its own section)
    lens = elements.groupBy("doc_id").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct(
                F.col("element_idx").alias("i"),
                F.coalesce(F.length("text"), F.lit(0)).alias("n"),
            ))),
            lambda x: F.struct(x.getField("i").alias("i"),
                               x.getField("n").alias("n")),
        ).alias("_els")
    )
    acc0 = F.struct(
        F.array().cast("array<struct<i:int,g:int>>").alias("ids"),
        F.lit(1).alias("g"),
        F.lit(0).cast("long").alias("sz"),
        F.lit(0).alias("cnt"),
    )

    def step(acc, el):
        close = (acc.getField("cnt") > 0) & (
            acc.getField("sz") + el.getField("n") > F.lit(max_size))
        g = F.when(close, acc.getField("g") + 1).otherwise(
            acc.getField("g"))
        return F.struct(
            F.concat(
                acc.getField("ids"),
                F.array(F.struct(el.getField("i").alias("i"),
                                 g.alias("g"))),
            ).alias("ids"),
            g.alias("g"),
            F.when(close, el.getField("n").cast("long"))
            .otherwise(acc.getField("sz") + el.getField("n")).alias("sz"),
            F.when(close, F.lit(1))
            .otherwise(acc.getField("cnt") + 1).alias("cnt"),
        )

    ids = lens.select(
        "doc_id",
        F.explode(F.aggregate("_els", acc0, step).getField("ids"))
        .alias("_ig"),
    ).select(
        "doc_id",
        F.col("_ig.i").alias("element_idx"),
        F.col("_ig.g").alias("section_idx"),
    )
    return elements.join(ids, ["doc_id", "element_idx"])


def assemble_sections(
    elements: DataFrame, keys: list[str]
) -> DataFrame:
    """``assemble_section_text`` (processor.py:73-115) per group: text
    elements joined with blank lines, tables preferring their HTML form
    (empty-string HTML falls back to text, matching the reference's
    truthiness check), images skipped from the text but counted;
    element_types is the sorted csv of ALL categories seen.  Sections
    whose assembled text is whitespace-empty are dropped (:248-250).

    One subject-keyed aggregation: collect the group's elements sorted
    by position, then transform/filter/array_join — all codegen."""
    els = F.sort_array(F.collect_list(F.struct(
        F.col("element_idx").alias("i"),
        F.coalesce(F.col("category"), F.lit("UncategorizedText"))
        .alias("c"),
        F.coalesce(F.col("text"), F.lit("")).alias("t"),
        F.coalesce(F.col("text_as_html"), F.lit("")).alias("h"),
    )))
    grouped = elements.groupBy(*keys).agg(els.alias("_els"))
    part = lambda x: F.when(  # noqa: E731
        x.getField("c") == "Table",
        F.when(x.getField("h") != "", x.getField("h"))
        .otherwise(x.getField("t")),
    ).otherwise(x.getField("t"))
    parts = F.filter(
        F.transform(
            F.filter("_els", lambda x: x.getField("c") != "Image"), part),
        lambda p: p != "",
    )
    out = grouped.select(
        *keys,
        F.array_join(parts, "\n\n").alias("text"),
        F.array_join(
            F.array_sort(F.array_distinct(
                F.transform("_els", lambda x: x.getField("c")))), ","
        ).alias("element_types"),
        F.size(F.filter(
            "_els", lambda x: x.getField("c") == "Table")).alias(
                "table_count"),
        F.size(F.filter(
            "_els", lambda x: x.getField("c") == "Image")).alias(
                "image_count"),
    )
    return out.where(F.trim("text") != "").withColumn(
        "char_length", F.length("text"))


def decode_universal(
    elements: DataFrame,
    strategy: str = "whole-document",
    element_count: int = 20,
    max_size: int = 4000,
) -> dict:
    """The full universal-decoder flow downstream of the partition seam
    (processor.py:374-517), set-oriented: documents whose mime type is
    page-based OR whose elements carry page numbers group by page
    (missing page -> 1); the rest run the section strategy over their
    text elements with 1-based section indices.  Images are filtered
    out before grouping (so, as in the reference, emitted sections
    never count images), stored separately, and parented to their
    page's section when that page produced text, else to the document.

    Returns {"sections": ..., "images": ...} — sections carry the
    derived_entity_prov_triples input contract (incl. the
    element_types/table_count/image_count metadata, gated >0 as the
    reference does), ready for the explain-module emitter."""
    pb = F.col("mime_type").isin(*PAGE_BASED_FORMATS) | (
        F.max(F.col("page_number").isNotNull().cast("int"))
        .over(Window.partitionBy("doc_id")) == 1)
    e = elements.withColumn("_pb", pb)
    doc_uri = F.concat(F.lit("urn:doc:"), F.col("doc_id"))

    # --- page-based path ---------------------------------------------
    pages_in = e.where(F.col("_pb")).withColumn(
        "page", F.coalesce(F.col("page_number"), F.lit(1)))
    page_secs = assemble_sections(
        pages_in.where(F.col("category") != "Image"),
        ["doc_id", "mime_type", "page"],
    ).select(
        F.concat(
            F.lit("urn:page:"),
            F.sha2(F.concat_ws(":", "doc_id", "page"), 256),
        ).alias("entity_uri"),
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("parent_uri"),
        F.concat(F.lit("Page "), F.col("page").cast("string"))
        .alias("label"),
        F.col("page").alias("page_number"),
        F.lit(None).cast("int").alias("section_index"),
        F.lit(False).alias("section"),
        "doc_id", "mime_type", "text", "element_types",
        "table_count", "image_count", "char_length",
    )

    # --- section-strategy path ---------------------------------------
    sec_in = e.where(~F.col("_pb") & (F.col("category") != "Image"))
    sec_secs = assemble_sections(
        assign_sections(sec_in, strategy, element_count, max_size),
        ["doc_id", "mime_type", "section_idx"],
    ).select(
        F.concat(
            F.lit("urn:section:"),
            F.sha2(F.concat_ws(":", "doc_id", "section_idx"), 256),
        ).alias("entity_uri"),
        F.concat(F.lit("urn:doc:"), F.col("doc_id")).alias("parent_uri"),
        F.concat(F.lit("Section "), F.col("section_idx").cast("string"))
        .alias("label"),
        F.lit(None).cast("int").alias("page_number"),
        F.col("section_idx").alias("section_index"),
        F.lit(True).alias("section"),
        "doc_id", "mime_type", "text", "element_types",
        "table_count", "image_count", "char_length",
    )

    sections = page_secs.unionByName(sec_secs).select(
        "*",
        # the reference gates the counts at > 0 (processor.py:287-289)
        F.when(F.col("table_count") > 0, F.col("table_count"))
        .alias("table_count_gated"),
        F.when(F.col("image_count") > 0, F.col("image_count"))
        .alias("image_count_gated"),
    )

    # --- images: parent = their page's emitted section, else the doc --
    imgs = e.where(F.col("category") == "Image").withColumn(
        "page", F.coalesce(F.col("page_number"), F.lit(1)))
    page_parents = page_secs.select(
        "doc_id", F.col("page_number").alias("page"),
        F.col("entity_uri").alias("_page_uri"))
    images = imgs.join(
        page_parents, ["doc_id", "page"], "left"
    ).select(
        F.concat(
            F.lit("urn:image:"),
            F.sha2(F.concat_ws(
                ":", "doc_id", F.col("element_idx").cast("string")), 256),
        ).alias("entity_uri"),
        F.coalesce(
            F.when(F.col("_pb"), F.col("_page_uri")), doc_uri
        ).alias("parent_uri"),
        F.when(
            F.col("_pb"),
            F.concat(F.lit("Image from page "),
                     F.col("page").cast("string")),
        ).otherwise("Image").alias("label"),
        F.when(F.col("_pb"), F.col("page")).alias("page_number"),
        "doc_id", "mime_type",
    )
    return {"sections": sections, "images": images}


def universal_prov_triples(decoded: dict,
                           timestamp: str = "1970-01-01T00:00:00Z",
                           collection: str = "default") -> DataFrame:
    """Provenance for a decode_universal result — the emit_section /
    emit_image triple payloads (processor.py:277-291, 352-361) through
    the shared derived-entity emitter."""
    from .explain import derived_entity_prov_triples

    secs = decoded["sections"].select(
        "entity_uri", "parent_uri", "label", "page_number",
        F.lit(None).cast("int").alias("chunk_index"),
        F.lit(None).cast("int").alias("char_offset"),
        "char_length", "section", F.lit(False).alias("image"),
        "mime_type",
        F.col("element_types"),
        F.col("table_count_gated").alias("table_count"),
        F.col("image_count_gated").alias("image_count"),
    )
    imgs = decoded["images"].select(
        "entity_uri", "parent_uri", "label", "page_number",
        F.lit(None).cast("int").alias("chunk_index"),
        F.lit(None).cast("int").alias("char_offset"),
        F.lit(None).cast("int").alias("char_length"),
        F.lit(False).alias("section"), F.lit(True).alias("image"),
        "mime_type",
        F.lit(None).cast("string").alias("element_types"),
        F.lit(None).cast("int").alias("table_count"),
        F.lit(None).cast("int").alias("image_count"),
    )
    return derived_entity_prov_triples(
        secs.unionByName(imgs), COMPONENT_NAME, COMPONENT_VERSION,
        timestamp, collection=collection)
