"""Workspace .tgx bundle exchange (trustgraph_spark/workspace.py).

Parity targets: cli/export_workspace.py:47-206 (config/knowledge/library
members + manifest), cli/import_workspace.py:37-140,200-280 (bundle
read, validation, merge policies).
"""

import io
import json
import os
import tarfile
import tempfile

import pytest

from trustgraph_spark.workspace import (
    export_workspace_bundle,
    merge_config_entries,
    merge_documents,
    read_workspace_bundle,
)

_LIB = ("id string, time string, kind string, title string, "
        "comments string, "
        "metadata array<struct<s:string,p:string,o:string>>, "
        "tags array<string>, parent_id string, document_type string, "
        "content binary")


def _fixture(spark):
    config = spark.createDataFrame([
        ("prompt", "k one", json.dumps({"template": "hi"})),
        ("flow", "f1", "not json"),  # verbatim-preserve arm (:55-58)
    ], "type string, key string, value string")
    triples = spark.createDataFrame([
        ("col a", "", "http://s", "http://p", "http://o", "u", "", ""),
        ("col a", "", "http://s", "http://p", 'say "hi"\ntwo', "l", "",
         "en"),
        ("col a", "", "http://s", "http://p", '{"s": {}}', "t", "", ""),
        ("c2", "", "http://s2", "http://p2", "42", "l",
         "http://www.w3.org/2001/XMLSchema#integer", ""),
    ], "collection string, g string, s string, p string, o string, "
       "otype string, dtype string, lang string")
    lib = spark.createDataFrame([
        ("doc/1", "2026-01-01T00:00:00", "text/plain", "T1", "",
         [("http://a", "http://b", "c")], ["x"], None, "",
         bytearray(b"hello")),
        ("child1", None, "text/plain", "", "", [], [], "doc/1", "chunk",
         bytearray(b"part")),
    ], _LIB)
    return config, triples, lib


def test_tgx_export_members_and_manifest(spark):
    config, triples, lib = _fixture(spark)
    path = tempfile.mktemp(suffix=".tgx")
    man = export_workspace_bundle(
        path, "ws1", config, triples, lib, config_version=7,
        exported_at="2026-08-18T00:00:00Z")
    try:
        assert (man["format"], man["format_version"],
                man["workspace"], man["config_version"]) == (
            "tgx", 1, "ws1", 7)
        # RDF-star row not representable in N-Quads -> skipped-counted
        assert man["_skipped"] == 1
        assert man["knowledge"]["triples"] == {"c2": 1, "col a": 2}
        with tarfile.open(path, "r:gz") as tar:
            names = set(tar.getnames())
            # percent-quoted cosmetic member names (:62-65)
            assert "config/prompt/k%20one.json" in names
            assert "knowledge/col%20a/triples.nq" in names
            assert "knowledge/library/doc%2F1.meta.json" in names
            assert "knowledge/library/doc%2F1.content" in names
            entry = json.loads(tar.extractfile(
                "config/prompt/k%20one.json").read())
            # values parse to structured JSON in the bundle (:53-60)
            assert entry == {"type": "prompt", "key": "k one",
                             "value": {"template": "hi"}}
            nq = tar.extractfile(
                "knowledge/col%20a/triples.nq").read().decode()
            # graph IRI names the collection (:87)
            assert "<urn:trustgraph:collection:col%20a>" in nq
    finally:
        os.unlink(path)


def test_tgx_roundtrip_values(spark):
    config, triples, lib = _fixture(spark)
    path = tempfile.mktemp(suffix=".tgx")
    export_workspace_bundle(path, "ws1", config, triples, lib)
    try:
        man, cdf, tdf, ldf = read_workspace_bundle(spark, path)
        # config values re-dump as JSON strings (_import_config :129-131)
        assert dict((r["key"], r["value"]) for r in cdf.collect()) == {
            "k one": '{"template": "hi"}', "f1": '"not json"'}
        rows = {(r["collection"], r["o"], r["otype"], r["dtype"],
                 r["lang"]) for r in tdf.collect()}
        # escaped literal inverts exactly; RDF-star row is gone
        assert ("col a", 'say "hi"\ntwo', "l", "", "en") in rows
        assert ("c2", "42", "l",
                "http://www.w3.org/2001/XMLSchema#integer", "") in rows
        assert len(rows) == 3
        docs = {r["id"]: r for r in ldf.collect()}
        assert bytes(docs["doc/1"]["content"]) == b"hello"
        assert docs["child1"]["parent_id"] == "doc/1"
        assert [tuple(t) for t in docs["doc/1"]["metadata"]] == [
            ("http://a", "http://b", "c")]
    finally:
        os.unlink(path)


def test_tgx_validation_errors(spark):
    # missing manifest (import_workspace.py:85-86)
    path = tempfile.mktemp(suffix=".tgx")
    with tarfile.open(path, "w:gz"):
        pass
    with pytest.raises(RuntimeError, match="manifest.json missing"):
        read_workspace_bundle(spark, path)
    os.unlink(path)

    def bundle_with(manifest):
        p = tempfile.mktemp(suffix=".tgx")
        with tarfile.open(p, "w:gz") as tar:
            data = json.dumps(manifest).encode()
            info = tarfile.TarInfo("manifest.json")
            info.size = len(data)
            tar.addfile(info, io.BytesIO(data))
        return p

    p = bundle_with({"format": "zip", "format_version": 1})
    with pytest.raises(RuntimeError, match="unsupported bundle format"):
        read_workspace_bundle(spark, p)
    os.unlink(p)
    p = bundle_with({"format": "tgx", "format_version": 99})
    with pytest.raises(RuntimeError, match="newer than this tool"):
        read_workspace_bundle(spark, p)
    os.unlink(p)


def test_tgx_merge_policies(spark):
    existing = spark.createDataFrame(
        [("prompt", "k one", "old")], "type string, key string, "
        "value string")
    entries = spark.createDataFrame(
        [("prompt", "k one", "new"), ("prompt", "k2", "v2"),
         ("flow", "k one", "v3")],  # same key, other type: imports
        "type string, key string, value string")
    kept = sorted((r["type"], r["key"]) for r in
                  merge_config_entries(existing, entries).collect())
    assert kept == [("flow", "k one"), ("prompt", "k2")]
    assert merge_config_entries(existing, entries,
                                overwrite=True).count() == 3

    _, _, lib = _fixture(spark)
    eids = spark.createDataFrame([("doc/1",)], "id string")
    md = merge_documents(eids, lib).collect()
    # skip existing; parents (order 0) before children (order 1)
    assert [(r["id"], r["_import_order"]) for r in md] == [("child1", 1)]
    over = merge_documents(eids, lib, overwrite=True) \
        .orderBy("_import_order").collect()
    assert [r["_import_order"] for r in over] == [0, 1]
