"""Librarian document-library kernels (operators/librarian.py).

Parity targets: librarian/librarian.py begin_upload :273-345,
get_upload_status :512-553, complete_upload :413-483,
remove_document child cascade :85-96.
"""

import json

from trustgraph_spark.operators.librarian import (
    DEFAULT_CHUNK_SIZE,
    assemble_uploads,
    plan_upload_sessions,
    remove_documents_cascade,
    upload_status,
)

_DOCS_SCHEMA = ("workspace string, id string, time long, kind string, "
                "title string, comments string, tags array<string>, "
                "object_id string, parent_id string")


def test_plan_upload_sessions_validation(spark):
    reqs = spark.createDataFrame([
        ("u1", "w1", "d1", "text/plain", 10, 4),
        ("u2", "w1", "d2", "", 10, 4),
        ("u3", "w1", "d3", "text/plain", 0, 4),
        ("u4", "w1", "dup", "text/plain", 10, 0),
        ("u5", "w2", "dup", "text/plain", 10, 4),  # other workspace: ok
    ], "upload_id string, workspace string, document_id string, "
       "kind string, total_size long, chunk_size long")
    docs = spark.createDataFrame(
        [("w1", "dup", 1, "k", "", "", [], "o1", None)], _DOCS_SCHEMA)
    plan = {r["upload_id"]: r for r in
            plan_upload_sessions(reqs, docs, min_chunk_size=2).collect()}
    # ceil-div chunk plan (librarian.py:303)
    assert (plan["u1"]["total_chunks"], plan["u1"]["error"]) == (3, None)
    assert plan["u2"]["error"] == "Document kind (MIME type) is required"
    assert plan["u3"]["error"] == "total_size must be positive"
    # chunk_size <= 0 -> 2 MiB default (:296-297); dup beats size checks
    assert plan["u4"]["chunk_size"] == DEFAULT_CHUNK_SIZE
    assert plan["u4"]["error"] == "Document already exists"
    # duplicate check is workspace-scoped (tables/library.py:306-315)
    assert plan["u5"]["error"] is None
    # min-chunk arm
    tiny = plan_upload_sessions(
        spark.createDataFrame(
            [("u6", "w1", "d6", "k", 10, 1)],
            "upload_id string, workspace string, document_id string, "
            "kind string, total_size long, chunk_size long"),
        min_chunk_size=2).collect()[0]
    assert tiny["error"] == "Chunk size 1 is below minimum 2"


def _sessions(spark):
    return spark.createDataFrame([
        ("u1", "w1", "d1",
         json.dumps({"id": "d1", "time": 5, "kind": "text/plain",
                     "title": "T1", "tags": ["a", "b"]}), 10, 4, 3),
        ("u5", "w1", "d5", json.dumps({"id": "d5", "kind": "app/x"}),
         8, 4, 2),
        ("u9", "w1", "d9", json.dumps({"id": "d9", "kind": "k"}),
         4, 4, 1),  # zero chunks received
    ], "upload_id string, workspace string, document_id string, "
       "document_metadata string, total_size long, chunk_size long, "
       "total_chunks int")


def _chunks(spark):
    return spark.createDataFrame([
        ("u1", 0, bytearray(b"AAAA")), ("u1", 2, bytearray(b"CC")),
        ("u1", 1, bytearray(b"BBBB")),
        ("u5", 0, bytearray(b"1111")),
    ], "upload_id string, chunk_index int, content binary")


def test_upload_status_math(spark):
    st = {r["upload_id"]: r for r in
          upload_status(_sessions(spark), _chunks(spark)).collect()}
    # received/missing lists sorted (get_upload_status :531-537)
    assert st["u1"]["received"] == [0, 1, 2] and st["u1"]["missing"] == []
    # bytes_received = n * chunk_size capped at total_size (:539-541)
    assert st["u1"]["bytes_received"] == 10 and st["u1"]["complete"]
    assert st["u5"]["missing"] == [1]
    assert st["u5"]["bytes_received"] == 4 and not st["u5"]["complete"]
    assert st["u9"]["received"] == [] and st["u9"]["missing"] == [0]


def test_assemble_uploads(spark):
    out = {r["upload_id"]: r for r in
           assemble_uploads(_sessions(spark), _chunks(spark)).collect()}
    # index-ordered multipart fold (complete_upload :459-463)
    assert bytes(out["u1"]["content"]) == b"AAAABBBBCC"
    assert (out["u1"]["time"], out["u1"]["title"],
            out["u1"]["tags"]) == (5, "T1", ["a", "b"])
    # metadata defaults when keys absent (:466-477)
    assert (out["u5"]["title"], out["u5"]["comments"],
            out["u5"]["tags"]) == ("", "", [])
    # incomplete sessions: no content, missing surfaced (:437-444)
    assert out["u5"]["content"] is None and out["u5"]["missing"] == [1]
    assert out["u9"]["content"] is None and out["u9"]["missing"] == [0]


def test_remove_documents_cascade(spark):
    docs = spark.createDataFrame([
        ("w1", "a", 1, "k", "", "", [], "o", None),
        ("w1", "b", 1, "k", "", "", [], "o", "a"),   # child of a
        ("w1", "c", 1, "k", "", "", [], "o", "b"),   # grandchild: survives
        ("w1", "d", 1, "k", "", "", [], "o", None),
    ], _DOCS_SCHEMA)
    ids = spark.createDataFrame([("a",)], "id string")
    left = sorted(r["id"] for r in
                  remove_documents_cascade(docs, ids).collect())
    # ONE level of cascade (librarian.py:85-96 loops direct children)
    assert left == ["c", "d"]


# ---------------------------------------------------------------------------
# Property: random chunk splits reassemble exactly; status math holds
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    data=st.binary(min_size=0, max_size=40),
    chunk_size=st.integers(min_value=1, max_value=9),
    drop_seed=st.integers(min_value=0, max_value=7),
)
@settings(max_examples=10, deadline=None)
def test_upload_assembly_property(spark, data, chunk_size, drop_seed):
    import math

    total_size = len(data)
    total_chunks = math.ceil(total_size / chunk_size) if total_size else 0
    pieces = [(i, data[i * chunk_size:(i + 1) * chunk_size])
              for i in range(total_chunks)]
    kept = [(i, c) for i, c in pieces if (i + drop_seed) % 5 != 0]
    missing = sorted(i for i, _ in pieces if (i + drop_seed) % 5 == 0)
    complete = not missing and total_chunks >= 0

    sess = spark.createDataFrame(
        [("u1", "w1", "d1", '{"id":"d1","kind":"k"}',
          total_size, chunk_size, total_chunks)],
        "upload_id string, workspace string, document_id string, "
        "document_metadata string, total_size long, chunk_size long, "
        "total_chunks int")
    chunks = spark.createDataFrame(
        [("u1", i, bytearray(c)) for i, c in kept] or [],
        "upload_id string, chunk_index int, content binary")

    st_row = upload_status(sess, chunks).collect()[0]
    assert st_row["missing"] == missing
    assert st_row["received"] == sorted(i for i, _ in kept)
    assert st_row["bytes_received"] == min(
        len(kept) * chunk_size, total_size)
    assert st_row["complete"] == complete

    out = assemble_uploads(sess, chunks).collect()[0]
    if complete:
        assert bytes(out["content"] or b"") == data
    else:
        assert out["content"] is None and out["missing"] == missing


def test_assemble_uploads_reupload_last_wins(spark):
    # the reference overwrites the chunk map entry per index
    # (upload_chunk :383-391): with a seq column, max seq wins;
    # identical duplicate rows collapse either way
    sess = spark.createDataFrame(
        [("u1", "w1", "d1", '{"id":"d1","kind":"k"}', 4, 2, 2)],
        "upload_id string, workspace string, document_id string, "
        "document_metadata string, total_size long, chunk_size long, "
        "total_chunks int")
    chunks = spark.createDataFrame([
        ("u1", 0, bytearray(b"XX"), 1),
        ("u1", 0, bytearray(b"AA"), 2),   # re-upload of chunk 0: wins
        ("u1", 1, bytearray(b"BB"), 1),
    ], "upload_id string, chunk_index int, content binary, seq int")
    out = assemble_uploads(sess, chunks).collect()[0]
    assert out["complete"] and bytes(out["content"]) == b"AABB"
    # without seq: exact duplicates collapse
    dup = spark.createDataFrame([
        ("u1", 0, bytearray(b"AA")), ("u1", 0, bytearray(b"AA")),
        ("u1", 1, bytearray(b"BB")),
    ], "upload_id string, chunk_index int, content binary")
    out2 = assemble_uploads(sess, dup).collect()[0]
    assert bytes(out2["content"]) == b"AABB"
