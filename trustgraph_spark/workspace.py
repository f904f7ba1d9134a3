"""Workspace .tgx bundle exchange — the portable gzipped-tar workspace
format of tg-export-workspace / tg-import-workspace.

Reference: trustgraph-cli/trustgraph/cli/export_workspace.py —
_export_config :47-73 (one self-describing pretty JSON per config key,
percent-quoted cosmetic filenames, values parsed-or-verbatim),
_export_triples :76-118 (per-collection N-Quads under
knowledge/<c>/triples.nq with the urn:trustgraph:collection:<c> graph
IRI, tempfile streaming, written/skipped counts, members only when
non-empty), _export_library :121-149 (meta.json + .content per
document), manifest :187-206; import_workspace.py — _read_bundle
:37-106 (member dispatch, unquoted ids, format/version validation),
_import_config :108-140 (skip-existing-keys unless overwrite, values
re-dumped as JSON strings), _import_documents :200-280 (skip-or-replace,
parents before children).

Spark-first split: the bundle file is a driver-side artifact (it IS a
single tar, like the msgpack core exchange in operators/kgcore.py), but
everything data-sized stays in the engine — triples serialize through
the native N-Quads encoder (operators/serialize.triples_to_nquads) and
stream into the tar via toLocalIterator (memory flat, the reference's
tempfile discipline), and the read side hands each .nq member to
spark.read.text + the native parser rather than a Python line loop.
Config and library members are bounded (the reference collects both
per-workspace). Merge policies are anti-joins, not per-key round-trips.

Determinism: the reference stamps time.time() mtimes and gmtime
exported_at; both are caller-supplied here so identical inputs produce
identical bundles.
"""

from __future__ import annotations

import io
import json
import os
import tarfile
import tempfile
from urllib.parse import quote, unquote

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MANIFEST_FORMAT = "tgx"
MANIFEST_FORMAT_VERSION = 1
DEFAULT_TRIPLES_LIMIT = 1_000_000

_LIB_SCHEMA = (
    "id string, time string, kind string, title string, comments string, "
    "metadata array<struct<s:string,p:string,o:string>>, "
    "tags array<string>, parent_id string, document_type string, "
    "content binary"
)


def _add_bytes(tar, name, data, mtime):
    info = tarfile.TarInfo(name=name)
    info.size = len(data)
    info.mtime = mtime
    tar.addfile(info, io.BytesIO(data))


def collection_graph_iri(collection: str) -> str:
    """export_workspace.py:87 — the graph IRI naming a collection."""
    return f"urn:trustgraph:collection:{quote(collection, safe='')}"


def export_workspace_bundle(
    path: str,
    workspace: str,
    config: DataFrame,
    triples: DataFrame | None = None,
    library: DataFrame | None = None,
    config_version: int = 0,
    exported_at: str = "1970-01-01T00:00:00Z",
    mtime: int = 0,
    triples_limit: int = DEFAULT_TRIPLES_LIMIT,
) -> dict:
    """Write a .tgx bundle; returns the manifest dict (plus the skipped
    count under "_skipped", the CLI's stderr summary line).

    config: (type, key, value) — value is the stored JSON string.
    triples: quad rows with a `collection` column (g ignored: the
    bundle's graph IRI names the collection, export_workspace.py:87).
    library: rows in _LIB_SCHEMA shape. Pass None (or config_only
    upstream) to omit knowledge."""
    from .operators.serialize import triples_to_nquads

    config_only = triples is None and library is None
    with tarfile.open(path, "w:gz") as tar:
        config_count = 0
        for r in sorted(config.select("type", "key", "value").collect(),
                        key=lambda r: (r["type"], r["key"])):
            try:
                value = json.loads(r["value"])
            except (TypeError, json.JSONDecodeError):
                value = r["value"]
            entry = {"type": r["type"], "key": r["key"], "value": value}
            name = (f"config/{quote(r['type'], safe='')}/"
                    f"{quote(r['key'], safe='')}.json")
            _add_bytes(tar, name,
                       json.dumps(entry, indent=2).encode("utf-8"), mtime)
            config_count += 1

        triple_counts: dict[str, int] = {}
        skipped_total = 0
        collections: list[str] = []
        if triples is not None:
            collections = sorted(
                r["collection"]
                for r in triples.select("collection").distinct().collect())
            for c in collections:
                sub = triples.where(F.col("collection") == c) \
                    .limit(triples_limit)
                lines = triples_to_nquads(sub, collection_graph_iri(c))
                written = skipped = 0
                tmp = tempfile.NamedTemporaryFile(
                    "w", encoding="utf-8", suffix=".nq", delete=False)
                try:
                    with tmp:
                        for row in lines.toLocalIterator():
                            if row["encodable"]:
                                tmp.write(row["line"] + "\n")
                                written += 1
                            else:
                                skipped += 1
                    if written:
                        tar.add(
                            tmp.name,
                            arcname=(f"knowledge/{quote(c, safe='')}"
                                     f"/triples.nq"))
                    triple_counts[c] = written
                    skipped_total += skipped
                finally:
                    os.unlink(tmp.name)

        doc_count = 0
        if library is not None:
            for r in sorted(library.collect(), key=lambda r: r["id"]):
                meta = {
                    "id": r["id"],
                    "time": r["time"],
                    "kind": r["kind"],
                    "title": r["title"],
                    "comments": r["comments"],
                    "metadata": [
                        {"s": t["s"], "p": t["p"], "o": t["o"]}
                        for t in (r["metadata"] or [])
                    ],
                    "tags": list(r["tags"] or []),
                    "parent_id": r["parent_id"] or "",
                    "document_type": r["document_type"] or "",
                }
                base = f"knowledge/library/{quote(r['id'], safe='')}"
                _add_bytes(tar, f"{base}.meta.json",
                           json.dumps(meta, indent=2).encode("utf-8"),
                           mtime)
                _add_bytes(tar, f"{base}.content",
                           bytes(r["content"] or b""), mtime)
                doc_count += 1

        manifest = {
            "format": MANIFEST_FORMAT,
            "format_version": MANIFEST_FORMAT_VERSION,
            "workspace": workspace,
            "config_version": config_version,
            "exported_at": exported_at,
            "contents": {"config": True, "knowledge": not config_only},
        }
        if not config_only:
            manifest["knowledge"] = {
                "collections": collections,
                "documents": doc_count,
                "triples": triple_counts,
            }
        _add_bytes(tar, "manifest.json",
                   json.dumps(manifest, indent=2).encode("utf-8"), mtime)
    manifest["_skipped"] = skipped_total
    manifest["_config_count"] = config_count
    return manifest


def read_workspace_bundle(spark, path: str):
    """_read_bundle (import_workspace.py:37-106): returns
    (manifest, config_df(type,key,value), triples_df(collection + quad
    columns), library_df in _LIB_SCHEMA). Validation parity: missing
    manifest, wrong format, newer format_version all raise. Config
    values re-serialize to compact JSON strings exactly as
    _import_config :129-131 does before the put."""
    manifest = None
    config_entries = []
    nq_files: dict[str, str] = {}
    doc_meta: dict[str, dict] = {}
    doc_content: dict[str, bytes] = {}

    def member_id(name, prefix, suffix):
        return unquote(name[len(prefix):-len(suffix)])

    tmpdir = tempfile.mkdtemp(prefix="tgx_")
    with tarfile.open(path, "r:gz") as tar:
        for member in tar.getmembers():
            if not member.isfile():
                continue
            f = tar.extractfile(member)
            if f is None:
                continue
            data = f.read()
            name = member.name
            if name == "manifest.json":
                manifest = json.loads(data)
            elif name.startswith("config/") and name.endswith(".json"):
                config_entries.append(json.loads(data))
            elif (name.startswith("knowledge/library/")
                  and name.endswith(".meta.json")):
                did = member_id(name, "knowledge/library/", ".meta.json")
                doc_meta[did] = json.loads(data)
            elif (name.startswith("knowledge/library/")
                  and name.endswith(".content")):
                did = member_id(name, "knowledge/library/", ".content")
                doc_content[did] = data
            elif (name.startswith("knowledge/")
                  and name.endswith("/triples.nq")):
                c = member_id(name, "knowledge/", "/triples.nq")
                fp = os.path.join(tmpdir, f"{quote(c, safe='')}.nq")
                with open(fp, "wb") as out:
                    out.write(data)
                nq_files[c] = fp

    if manifest is None:
        raise RuntimeError("not a workspace bundle: manifest.json missing")
    if manifest.get("format") != MANIFEST_FORMAT:
        raise RuntimeError(
            f"unsupported bundle format: {manifest.get('format')!r}")
    if manifest.get("format_version", 0) > MANIFEST_FORMAT_VERSION:
        raise RuntimeError(
            f"bundle format version {manifest.get('format_version')} is "
            f"newer than this tool supports ({MANIFEST_FORMAT_VERSION}); "
            "upgrade trustgraph-cli")

    config_df = spark.createDataFrame(
        [(e["type"], e["key"], json.dumps(e["value"]))
         for e in config_entries] or [],
        "type string, key string, value string")

    from .operators.serialize import parse_nquads
    from functools import reduce
    frames = []
    for c, fp in sorted(nq_files.items()):
        lines = spark.read.text(fp).withColumnRenamed("value", "line")
        frames.append(parse_nquads(lines)
                      .withColumn("collection", F.lit(c)))
    if frames:
        triples_df = reduce(DataFrame.unionByName, frames).select(
            "collection", "g", "s", "p", "o", "otype", "dtype", "lang")
    else:
        triples_df = spark.createDataFrame(
            [], "collection string, g string, s string, p string, "
                "o string, otype string, dtype string, lang string")

    lib_rows = [
        (m["id"], m.get("time"), m.get("kind", "text/plain"),
         m.get("title", ""), m.get("comments", ""),
         [(t["s"], t["p"], t["o"]) for t in m.get("metadata", [])],
         m.get("tags", []), m.get("parent_id", "") or None,
         m.get("document_type", ""),
         bytearray(doc_content.get(did, b"")))
        for did, m in sorted(doc_meta.items())
    ]
    library_df = spark.createDataFrame(lib_rows or [], _LIB_SCHEMA)
    return manifest, config_df, triples_df, library_df


def merge_config_entries(
    existing: DataFrame, entries: DataFrame, overwrite: bool = False
) -> DataFrame:
    """_import_config (import_workspace.py:108-140) as one anti-join:
    without overwrite, (type, key) pairs already in the target are
    skipped — per key, not per type. Returns the entries to put."""
    if overwrite:
        return entries
    return entries.join(
        existing.select("type", "key").distinct(),
        ["type", "key"], "left_anti")


def merge_documents(
    existing_ids: DataFrame, docs: DataFrame, overwrite: bool = False
) -> DataFrame:
    """_import_documents (import_workspace.py:200-280): skip existing
    unless overwrite (replace = remove + add upstream); parents sort
    before children (the bool(parent_id) key, :219-221) via the
    `_import_order` column."""
    out = docs.withColumn(
        "_import_order",
        F.when(F.coalesce(F.col("parent_id"), F.lit("")) == "", 0)
        .otherwise(1))
    if overwrite:
        return out
    return out.join(existing_ids.select("id").distinct(), ["id"],
                    "left_anti")
