"""Portable knowledge-core exchange format (msgpack stream) — import and
export of the reference's core files.

Reference: trustgraph-cli/trustgraph/cli/get_kg_core.py:17-73 writes a
knowledge core as a stream of msgpack records ``("t", {"m": {"i", "m",
"c"}, "t": [triples]})`` / ``("ge", {"m": ..., "e": [{"e": term, "v":
vector}]})`` / ``("lm", {...})`` / ``("lb", {...})``;
put_kg_core.py:16-60 and load_kg_core.py read the same stream back;
gateway/dispatch/core_export.py:36-105 and core_import.py speak the
identical format over HTTP.  Term and triple wire dicts follow
messaging/translators/primitives.py:50-99 (TermTranslator /
TripleTranslator compact keys t/i/d/v/dt/ln/tr, ``dt``/``ln``/``g``
emitted only when non-empty).

Reference divergence, documented: core_export.py:42-46 omits the ``"m"``
(root metadata) key inside the record metadata while put_kg_core.py:21
reads it unconditionally — the reference's own pair crashes on its own
output.  We follow the get_kg_core.py writer (``m`` always present,
default ``[]``) and read with a default, so both reference variants load.

Spark-first shape: a core is represented in-plan as a DataFrame of
``(kind, id, collection, batch, n_items, record binary)`` rows — encode
is one ``applyInPandas`` over deterministic (id, collection, batch)
groups, decode is one ``mapInPandas`` over record blobs, so a 100 TB
export/import is embarrassingly parallel over documents and batch
boundaries never need to match between writer and reader (they don't in
the reference either: put_kg_core streams records as they come).  The
msgpack byte work itself is a sanctioned Python seam (binary codec,
``trustgraph_spark.mpack``); everything around it — batching windows,
ordering, metadata joins, term-column projection — stays native.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..constants import OTYPE_LITERAL, OTYPE_TRIPLE, OTYPE_URI
from ..mpack import packb, unpack_stream

_BLANK = "_:"

RECORDS_SCHEMA = (
    "kind string, id string, collection string, batch long, "
    "n_items long, record binary"
)


# ---------------------------------------------------------------------------
# Term / triple wire mapping (primitives.py:50-99 encode order)
# ---------------------------------------------------------------------------


def _node_term(value: str) -> dict:
    """IRI-or-blank column value -> wire term (blank nodes ride in the
    ``u`` otype under the ``_:`` prefix convention, as in parse_nquads)."""
    if value.startswith(_BLANK):
        return {"t": "b", "d": value[len(_BLANK):]}
    return {"t": "i", "i": value}


def _star_term(obj: dict) -> dict:
    """One s/p/o leg of this repo's RDF-star JSON dialect
    ({"type": "i"|"l", "iri"/"value": ...}) -> wire term."""
    if obj.get("type") == "i":
        return _node_term(obj.get("iri", ""))
    term = {"t": "l", "v": obj.get("value", "")}
    if obj.get("datatype"):
        term["dt"] = obj["datatype"]
    if obj.get("language"):
        term["ln"] = obj["language"]
    return term


def _object_term(o: str, otype: str, dtype: str, lang: str) -> dict:
    if otype == OTYPE_URI:
        return _node_term(o)
    if otype == OTYPE_TRIPLE:
        star = json.loads(o)
        tr = {
            "s": _star_term(star["s"]),
            "p": _star_term(star["p"]),
            "o": _star_term(star["o"]),
        }
        if star.get("g"):
            tr["g"] = star["g"]
        return {"t": "t", "tr": tr}
    term = {"t": "l", "v": o}
    if dtype:
        term["dt"] = dtype
    if lang:
        term["ln"] = lang
    return term


def _wire_triple(row) -> dict:
    t = {
        "s": _node_term(row["s"]),
        "p": {"t": "i", "i": row["p"]},
        "o": _object_term(row["o"], row["otype"], row["dtype"], row["lang"]),
    }
    if row["g"]:
        t["g"] = row["g"]
    return t


def _from_node_term(term: dict) -> str:
    if term.get("t") == "b":
        return _BLANK + term.get("d", "")
    return term.get("i", "")


def _star_json_leg(term: dict) -> dict:
    if term.get("t") in ("i", "b"):
        return {"type": "i", "iri": _from_node_term(term)}
    leg = {"type": "l", "value": term.get("v", "")}
    if term.get("dt"):
        leg["datatype"] = term["dt"]
    if term.get("ln"):
        leg["language"] = term["ln"]
    return leg


def _from_wire_object(term: dict) -> tuple[str, str, str, str]:
    """wire object term -> (o, otype, dtype, lang) column values."""
    t = term.get("t", "")
    if t in ("i", "b"):
        return _from_node_term(term), OTYPE_URI, "", ""
    if t == "t":
        tr = term.get("tr") or {}
        star = {
            "s": _star_json_leg(tr.get("s", {})),
            "p": _star_json_leg(tr.get("p", {})),
            "o": _star_json_leg(tr.get("o", {})),
        }
        if tr.get("g"):
            star["g"] = tr["g"]
        return (
            json.dumps(star, separators=(",", ":"), sort_keys=False),
            OTYPE_TRIPLE, "", "",
        )
    return term.get("v", ""), OTYPE_LITERAL, term.get("dt", ""), term.get("ln", "")


# ---------------------------------------------------------------------------
# Export: triple / entity frames -> core record rows
# ---------------------------------------------------------------------------


def _with_batch(df: DataFrame, order_cols: list, batch_size: int) -> DataFrame:
    w = Window.partitionBy("id", "collection").orderBy(*order_cols)
    return df.withColumn(
        "batch", ((F.row_number().over(w) - 1) / F.lit(batch_size))
        .cast("long")
    )


def _join_root(df: DataFrame, root_metadata: DataFrame | None) -> DataFrame:
    """Attach the per-document metadata-root triples as one JSON column
    (tiny: a handful of document-metadata triples per id, so the
    broadcast repeat is bounded; every record carries the full root in
    the reference too — get_kg_core.py:20-27)."""
    if root_metadata is None:
        return df.withColumn("root", F.lit("[]"))
    root = root_metadata.groupBy("id", "collection").agg(
        F.to_json(
            F.array_sort(F.collect_list(F.struct(
                "s", "p", "o", "otype", "dtype", "lang", "g"
            )))
        ).alias("root")
    )
    return df.join(F.broadcast(root), ["id", "collection"], "left") \
        .withColumn("root", F.coalesce(F.col("root"), F.lit("[]")))


def _root_triples(root_json: str) -> list:
    return [
        _wire_triple({
            "s": r["s"], "p": r["p"], "o": r["o"], "otype": r["otype"],
            "dtype": r.get("dtype") or "", "lang": r.get("lang") or "",
            "g": r.get("g") or "",
        })
        for r in json.loads(root_json)
    ]


def encode_core_triples(
    triples: DataFrame,
    root_metadata: DataFrame | None = None,
    batch_size: int = 500,
) -> DataFrame:
    """(id, collection, g, s, p, o, otype, dtype, lang) -> one ``("t",
    ...)`` msgpack record per deterministic batch of ``batch_size``
    triples (the reference emits one record per extraction message;
    batch boundaries are an export artifact the reader ignores)."""
    order = ["s", "p", "otype", "o", "dtype", "lang", "g"]
    df = _join_root(_with_batch(triples, order, batch_size), root_metadata)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        head = pdf.iloc[0]
        record = packb((
            "t",
            {
                "m": {
                    "i": head["id"],
                    "m": _root_triples(head["root"]),
                    "c": head["collection"],
                },
                "t": [_wire_triple(r) for _, r in pdf.iterrows()],
            },
        ))
        return pd.DataFrame([{
            "kind": "t", "id": head["id"], "collection": head["collection"],
            "batch": int(head["batch"]), "n_items": len(pdf),
            "record": record,
        }])

    return df.groupBy("id", "collection", "batch").applyInPandas(
        pack, RECORDS_SCHEMA
    )


def encode_core_entities(
    entities: DataFrame,
    root_metadata: DataFrame | None = None,
    batch_size: int = 500,
) -> DataFrame:
    """(id, collection, entity, vector) -> ``("ge", ...)`` records;
    entity is an IRI-or-blank string, vector an array<double>
    (get_kg_core.py:30-48 writer shape)."""
    order = ["entity"]
    df = _join_root(_with_batch(entities, order, batch_size), root_metadata)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        head = pdf.iloc[0]
        record = packb((
            "ge",
            {
                "m": {
                    "i": head["id"],
                    "m": _root_triples(head["root"]),
                    "c": head["collection"],
                },
                "e": [
                    {"e": _node_term(r["entity"]), "v": list(r["vector"])}
                    for _, r in pdf.iterrows()
                ],
            },
        ))
        return pd.DataFrame([{
            "kind": "ge", "id": head["id"], "collection": head["collection"],
            "batch": int(head["batch"]), "n_items": len(pdf),
            "record": record,
        }])

    return df.groupBy("id", "collection", "batch").applyInPandas(
        pack, RECORDS_SCHEMA
    )


def encode_core_doc_embeddings(
    chunks: DataFrame,
    root_metadata: DataFrame | None = None,
    batch_size: int = 500,
) -> DataFrame:
    """(id, collection, chunk_id, vectors array<array<double>>) ->
    ``("de", ...)`` records — the document-embeddings core
    tg-save-doc-embeds writes (save_doc_embeds.py:44-60: ``{"m": {"i",
    "m", "c"}, "c": [{"c": chunk_id, "v": [vectors...]}]}``, one
    vector LIST per chunk). One record per (id, collection, batch),
    chunks sorted by chunk_id. The reference keeps de cores in their
    own files (load_doc_embeds.py:101 routes on the "de" tag), so
    these records don't interleave with t/ge/lm/lb."""
    order = ["chunk_id"]
    df = _join_root(_with_batch(chunks, order, batch_size), root_metadata)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort")
        head = pdf.iloc[0]
        record = packb((
            "de",
            {
                "m": {
                    "i": head["id"],
                    "m": _root_triples(head["root"]),
                    "c": head["collection"],
                },
                "c": [
                    {"c": r["chunk_id"],
                     "v": [list(v) for v in r["vectors"]]}
                    for _, r in pdf.iterrows()
                ],
            },
        ))
        return pd.DataFrame([{
            "kind": "de", "id": head["id"],
            "collection": head["collection"],
            "batch": int(head["batch"]), "n_items": len(pdf),
            "record": record,
        }])

    return df.groupBy("id", "collection", "batch").applyInPandas(
        pack, RECORDS_SCHEMA
    )


def encode_core_library(metadata: DataFrame | None = None,
                        blobs: DataFrame | None = None) -> DataFrame:
    """Library rows -> ``("lm", ...)`` / ``("lb", ...)`` records, one per
    row (get_kg_core.py:50-73: i/k/t/p/d/c/g compact keys; blob data is
    a bin payload)."""
    frames = []
    if metadata is not None:
        def pack_lm(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rows = [{
                    "kind": "lm", "id": r["id"],
                    "collection": "", "batch": 0, "n_items": 1,
                    "record": packb(("lm", {
                        "i": r["id"], "k": r["kind"],
                        "t": r["title"], "p": r["parent_id"],
                        "d": r["document_type"], "c": r["comments"],
                        "g": list(r["tags"]),
                    })),
                } for r in pdf.to_dict("records")]
                yield pd.DataFrame(rows) if rows else pd.DataFrame(
                    columns=["kind", "id", "collection", "batch",
                             "n_items", "record"])
        frames.append(metadata.mapInPandas(pack_lm, RECORDS_SCHEMA))
    if blobs is not None:
        def pack_lb(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in it:
                rows = [{
                    "kind": "lb", "id": r["id"],
                    "collection": "", "batch": 0, "n_items": 1,
                    "record": packb(("lb", {"i": r["id"],
                                            "d": bytes(r["data"])})),
                } for r in pdf.to_dict("records")]
                yield pd.DataFrame(rows) if rows else pd.DataFrame(
                    columns=["kind", "id", "collection", "batch",
                             "n_items", "record"])
        frames.append(blobs.mapInPandas(pack_lb, RECORDS_SCHEMA))
    if not frames:
        raise ValueError("need metadata and/or blobs")
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out


# ---------------------------------------------------------------------------
# Import: record blobs -> frames
# ---------------------------------------------------------------------------

TRIPLES_SCHEMA = (
    "id string, collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string"
)
ENTITIES_SCHEMA = "id string, collection string, entity string, vector array<double>"
DOC_EMB_SCHEMA = ("id string, collection string, chunk_id string, "
                  "vectors array<array<double>>")
LIBRARY_SCHEMA = ("id string, kind string, title string, parent_id string, "
                  "document_type string, comments string, tags array<string>")
BLOBS_SCHEMA = "id string, data binary"


def _records(pdf_iter: Iterator[pd.DataFrame],
             record_col: str) -> Iterator[tuple[str, object]]:
    for pdf in pdf_iter:
        for blob in pdf[record_col]:
            for rec in unpack_stream(bytes(blob)):
                yield rec[0], rec[1]


def _triple_rows(kind: str, body: dict, roots: bool) -> list[dict]:
    meta = body.get("m", {})
    doc_id, coll = meta.get("i", ""), meta.get("c", "default")
    wire = meta.get("m") or [] if roots else body.get("t") or []
    rows = []
    for t in wire:
        o, otype, dtype, lang = _from_wire_object(t.get("o", {}))
        rows.append({
            "id": doc_id, "collection": coll,
            "g": t.get("g") or "",
            "s": _from_node_term(t.get("s", {})),
            "p": t.get("p", {}).get("i", ""),
            "o": o, "otype": otype, "dtype": dtype, "lang": lang,
        })
    return rows


def _decode(records: DataFrame, record_col: str, schema: str, fn) -> DataFrame:
    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [c.split()[0] for c in schema.split(", ")]
        rows = []
        for kind, body in _records(it, record_col):
            rows.extend(fn(kind, body))
            if len(rows) >= 2048:
                yield pd.DataFrame(rows)
                rows = []
        yield pd.DataFrame(rows) if rows else pd.DataFrame(columns=cols)
    return records.mapInPandas(gen, schema)


def decode_core_triples(records: DataFrame,
                        record_col: str = "record") -> DataFrame:
    """``("t", ...)`` records -> triple rows in this repo's canonical
    columns (put_kg_core.py:33-41 read shape)."""
    return _decode(
        records, record_col, TRIPLES_SCHEMA,
        lambda k, b: _triple_rows(k, b, roots=False) if k == "t" else [],
    )


def decode_core_metadata(records: DataFrame,
                         record_col: str = "record") -> DataFrame:
    """The metadata-root triples carried by ``t``/``ge`` records,
    deduplicated per (id, collection) — every record repeats the root."""
    df = _decode(
        records, record_col, TRIPLES_SCHEMA,
        lambda k, b: _triple_rows(k, b, roots=True) if k in ("t", "ge") else [],
    )
    return df.dropDuplicates()


def decode_core_entities(records: DataFrame,
                         record_col: str = "record") -> DataFrame:
    def rows(kind: str, body: dict) -> list[dict]:
        if kind != "ge":
            return []
        meta = body.get("m", {})
        return [{
            "id": meta.get("i", ""), "collection": meta.get("c", "default"),
            "entity": _from_node_term(e.get("e", {})),
            "vector": [float(x) for x in e.get("v", [])],
        } for e in body.get("e") or []]
    return _decode(records, record_col, ENTITIES_SCHEMA, rows)


def decode_core_doc_embeddings(records: DataFrame,
                               record_col: str = "record") -> DataFrame:
    """``("de", ...)`` records back to (id, collection, chunk_id,
    vectors) rows (put_de_core.py:18-58 reader shape)."""
    def rows(kind: str, body: dict) -> list[dict]:
        if kind != "de":
            return []
        meta = body.get("m", {})
        return [{
            "id": meta.get("i", ""),
            "collection": meta.get("c", "default"),
            "chunk_id": c.get("c", ""),
            "vectors": [[float(x) for x in v] for v in (c.get("v") or [])],
        } for c in body.get("c") or []]
    return _decode(records, record_col, DOC_EMB_SCHEMA, rows)


def decode_core_library(records: DataFrame,
                        record_col: str = "record") -> DataFrame:
    def rows(kind: str, body: dict) -> list[dict]:
        if kind != "lm":
            return []
        return [{
            "id": body.get("i", ""), "kind": body.get("k", ""),
            "title": body.get("t", ""), "parent_id": body.get("p", ""),
            "document_type": body.get("d", ""),
            "comments": body.get("c", ""),
            "tags": list(body.get("g") or []),
        }]
    return _decode(records, record_col, LIBRARY_SCHEMA, rows)


def decode_core_blobs(records: DataFrame,
                      record_col: str = "record") -> DataFrame:
    def rows(kind: str, body: dict) -> list[dict]:
        if kind != "lb":
            return []
        return [{"id": body.get("i", ""), "data": body.get("d") or b""}]
    return _decode(records, record_col, BLOBS_SCHEMA, rows)


# ---------------------------------------------------------------------------
# Single-file interop (the CLI artifact shape)
# ---------------------------------------------------------------------------


def write_core_file(records: DataFrame, path: str) -> int:
    """Concatenate records into one ``.msgpack`` core file a reference
    ``tg-put-kg-core`` / ``tg-load-kg-core`` invocation can consume.
    Driver-side by contract — a single file has a single consumer; the
    scale path is the records DataFrame itself (partitioned binary
    parquet).  Record order: triples, then graph embeddings, then
    library rows (the get_kg_core stream order), deterministic within
    each kind."""
    rows = records.select("kind", "id", "collection", "batch", "record") \
        .orderBy(
            F.when(F.col("kind") == "t", 0)
            .when(F.col("kind") == "ge", 1)
            .when(F.col("kind") == "lm", 2).otherwise(3),
            "id", "collection", "batch",
        ).select("record").toLocalIterator()
    # toLocalIterator streams one partition at a time (the sort's range
    # partitioning makes partition order = global order), so the driver
    # holds one partition of records, not the whole set (guide §5); the
    # trailing select drops the sort keys from the driver transfer.
    n = 0
    with open(path, "wb") as f:
        for r in rows:
            f.write(bytes(r["record"]))
            n += 1
    return n


def read_core_file(spark, path: str) -> DataFrame:
    """A core file (or a directory of them) -> records frame, one row per
    file; the decoders stream every record in a blob, so per-file rows
    are the unit of parallelism (matching the reference's one
    stream = one core)."""
    return spark.read.format("binaryFile").load(path) \
        .select(F.col("content").alias("record"))
