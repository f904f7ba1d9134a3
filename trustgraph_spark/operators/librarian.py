"""Librarian document-library kernels — the deterministic core of the
reference's librarian service, set-oriented.

Reference: trustgraph-flow/trustgraph/librarian/librarian.py —
begin_upload :273-345 (ceil-div chunk planning, 2 MiB default chunk
size, validation), upload_chunk :346-412 (index bounds, 1-indexed S3
parts), complete_upload :413-483 (all-chunks check, parts sorted by
index, metadata JSON -> DocumentMetadata), get_upload_status :512-553
(received/missing lists, bytes_received cap), remove_document :78-120
(one-level child cascade); tables/library.py :306-719 (the
document/session table shapes).

The reference processes ONE request per call against Cassandra + S3.
Here the library is a DataFrame contract and every operator handles ALL
sessions/documents in one plan: chunk assembly is a per-session
sort_array + binary fold (the S3 multipart complete), status math is
pure column expressions (sequence + array_except for the missing list),
and the cascade delete is two semi-joins. Validation failures become an
`error` column (the service raises per request; a batch engine reports
per row).

Frame contracts:
- documents: workspace, id, time long, kind, title, comments,
  tags array<string>, object_id, parent_id (null for roots)
- upload_sessions: upload_id, workspace, document_id,
  document_metadata (JSON string), total_size long, chunk_size long,
  total_chunks int
- upload_chunks: upload_id, chunk_index int, content binary
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# librarian.py:19 (2 MiB)
DEFAULT_CHUNK_SIZE = 2 * 1024 * 1024

# the DocumentMetadata JSON stored per session (begin_upload :316-323)
DOC_META_SCHEMA = ("struct<id:string,time:bigint,kind:string,"
                   "title:string,comments:string,tags:array<string>>")


def plan_upload_sessions(
    requests: DataFrame,
    documents: DataFrame | None = None,
    min_chunk_size: int = 1,
) -> DataFrame:
    """begin_upload (librarian.py:273-345) for a whole request batch:
    chunk_size defaults to 2 MiB when <= 0, total_chunks =
    ceil(total_size / chunk_size), and the service's four RequestError
    arms (missing kind, duplicate document, nonpositive total_size,
    chunk size below minimum) become an `error` column (null = ok).

    Input columns: upload_id, workspace, document_id, kind, total_size,
    chunk_size (0/null = default). `documents` (optional) supplies the
    duplicate check via one left semi-ish join — never a per-request
    exists() round-trip."""
    r = requests.withColumn(
        "chunk_size",
        F.when(F.coalesce(F.col("chunk_size"), F.lit(0)) > 0,
               F.col("chunk_size")).otherwise(F.lit(DEFAULT_CHUNK_SIZE)),
    ).withColumn(
        "total_chunks",
        F.ceil(F.col("total_size") / F.col("chunk_size")).cast("int"),
    )
    if documents is not None:
        dup = documents.select(
            F.col("workspace"), F.col("id").alias("document_id"),
            F.lit(True).alias("_exists")).distinct()
        r = r.join(F.broadcast(dup), ["workspace", "document_id"], "left")
    else:
        r = r.withColumn("_exists", F.lit(None).cast("boolean"))
    return r.withColumn(
        "error",
        F.when(F.coalesce(F.col("kind"), F.lit("")) == "",
               "Document kind (MIME type) is required")
        .when(F.col("_exists"), "Document already exists")
        .when(F.col("total_size") <= 0, "total_size must be positive")
        .when(F.col("chunk_size") < min_chunk_size,
              F.concat(F.lit("Chunk size "), F.col("chunk_size"),
                       F.lit(f" is below minimum {min_chunk_size}"))),
    ).drop("_exists")


def upload_status(
    sessions: DataFrame, chunks: DataFrame
) -> DataFrame:
    """get_upload_status (librarian.py:512-553) for every session at
    once: received/missing index lists (sorted), bytes_received =
    n_received * chunk_size capped at total_size, and the all-received
    completeness flag complete_upload checks (:436-444). One grouped
    agg over the chunk table + sequence/array_except column math."""
    rec = chunks.groupBy("upload_id").agg(
        F.sort_array(F.collect_set("chunk_index")).alias("received"))
    s = sessions.join(rec, "upload_id", "left").withColumn(
        "received",
        F.coalesce(F.col("received"), F.array().cast("array<int>")))
    all_idx = F.when(
        F.col("total_chunks") > 0,
        F.sequence(F.lit(0), F.col("total_chunks") - 1),
    ).otherwise(F.array().cast("array<int>"))
    return s.select(
        "upload_id", "workspace", "document_id",
        "total_size", "chunk_size", "total_chunks",
        "received",
        F.array_except(all_idx, F.col("received")).alias("missing"),
        F.size("received").alias("chunks_received"),
        F.least(
            F.size("received").cast("long") * F.col("chunk_size"),
            F.col("total_size"),
        ).alias("bytes_received"),
        (F.size("received") == F.col("total_chunks")).alias("complete"),
    )


def assemble_uploads(
    sessions: DataFrame, chunks: DataFrame
) -> DataFrame:
    """complete_upload (librarian.py:413-483), batched: for COMPLETE
    sessions, the S3 multipart assembly — chunks sorted by index
    (1-indexed parts, :459-463) and folded into one binary — plus the
    document row decoded from the session's stored metadata JSON
    (:466-477, time/title/comments default via the JSON parse);
    incomplete sessions surface their missing list instead (the
    service's "Missing chunks:" RequestError, :437-444). One grouped
    aggregate; the fold is a JVM-side array aggregate, no UDF.

    Re-uploaded chunks: the reference OVERWRITES the session's map
    entry per chunk_index (upload_chunk :383-391, last wins). When the
    chunk frame carries a `seq` column the max-seq copy wins per
    (upload_id, chunk_index); without one, exact duplicate rows are
    dropped and conflicting same-index contents would otherwise both
    concatenate — callers replaying an at-least-once transport should
    supply seq."""
    if "seq" in chunks.columns:
        w = Window.partitionBy("upload_id", "chunk_index") \
            .orderBy(F.desc("seq"))
        chunks = (chunks.withColumn("_rn", F.row_number().over(w))
                  .where(F.col("_rn") == 1).drop("_rn", "seq"))
    else:
        chunks = chunks.dropDuplicates(["upload_id", "chunk_index",
                                        "content"])
    agg = chunks.groupBy("upload_id").agg(
        F.aggregate(
            F.transform(
                F.sort_array(F.collect_list(F.struct(
                    F.col("chunk_index").alias("i"),
                    F.col("content").alias("c")))),
                lambda x: x.getField("c"),
            ),
            F.lit(b""),
            lambda acc, x: F.concat(acc, x),
        ).alias("content"))
    st = upload_status(sessions, chunks)
    meta = F.from_json(F.col("document_metadata"), DOC_META_SCHEMA)
    return (
        st.join(agg, "upload_id", "left")
        .join(sessions.select("upload_id", "document_metadata"),
              "upload_id")
        .select(
            "upload_id", "workspace", "document_id",
            "complete", "missing",
            F.when(F.col("complete"), F.col("content")).alias("content"),
            meta["time"].alias("time"),
            meta["kind"].alias("kind"),
            F.coalesce(meta["title"], F.lit("")).alias("title"),
            F.coalesce(meta["comments"], F.lit("")).alias("comments"),
            F.coalesce(meta["tags"], F.array().cast("array<string>"))
            .alias("tags"),
        )
    )


def remove_documents_cascade(
    documents: DataFrame, doc_ids: DataFrame
) -> DataFrame:
    """remove_document's one-level child cascade (librarian.py:85-96):
    dropping a document also drops its direct children. Returns the
    surviving documents — the removal set is ids ∪ children-of-ids,
    expressed as two broadcast anti-joins (the reference loops
    list_children per request)."""
    ids = doc_ids.select(F.col("id").alias("_rid")).distinct()
    return documents.join(
        F.broadcast(ids), documents["id"] == F.col("_rid"), "left_anti"
    ).join(
        F.broadcast(ids), documents["parent_id"] == F.col("_rid"),
        "left_anti",
    )
