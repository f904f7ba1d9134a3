"""Knowledge-core msgpack exchange (operators/kgcore.py) — roundtrips
across every term shape, wire-shape parity with the reference writers
(get_kg_core.py:17-73, primitives.py:50-99), and the documented
core_export.py missing-"m" divergence."""

import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.mpack import packb, unpack_stream
from trustgraph_spark.operators.kgcore import (
    decode_core_blobs,
    decode_core_entities,
    decode_core_library,
    decode_core_metadata,
    decode_core_triples,
    encode_core_entities,
    encode_core_library,
    encode_core_triples,
    read_core_file,
    write_core_file,
)

TRIPLE_COLS = ("id string, collection string, g string, s string, p string, "
               "o string, otype string, dtype string, lang string")

STAR = json.dumps({
    "s": {"type": "i", "iri": "http://ex/a"},
    "p": {"type": "i", "iri": "http://ex/b"},
    "o": {"type": "l", "value": "v 1"},
}, separators=(",", ":"))


@pytest.fixture(scope="module")
def planted(spark):
    rows = [
        # IRI object + named graph
        ("d1", "default", "urn:g1", "http://ex/s1", "http://ex/p1",
         "http://ex/o1", "u", "", ""),
        # plain literal with every escape-ish char (msgpack is binary-safe)
        ("d1", "default", "", "http://ex/s2", "http://ex/p2",
         'say "hi"\n\tback\\', "l", "", ""),
        # language-tagged literal
        ("d1", "default", "", "http://ex/s3", "http://ex/p2",
         "tagged", "l", "", "en"),
        # typed literal
        ("d1", "default", "", "http://ex/s4", "http://ex/p3", "42", "l",
         "http://www.w3.org/2001/XMLSchema#integer", ""),
        # blank-node subject and object
        ("d2", "default", "", "_:b0", "http://ex/p4", "_:b1", "u", "", ""),
        # RDF-star quoted-triple object (this repo's JSON dialect)
        ("d2", "default", "", "http://ex/s5", "http://ex/p5", STAR,
         "t", "", ""),
        # grammar-invalid IRI: msgpack is not a grammar, must survive
        ("d2", "other", "", "http://ex/bad subj", "http://ex/p6",
         "x", "l", "", ""),
    ]
    return spark.createDataFrame(rows, TRIPLE_COLS)


def test_triples_roundtrip_all_term_shapes(spark, planted):
    recs = encode_core_triples(planted, batch_size=3)
    back = decode_core_triples(recs).select(
        "id", "collection", "g", "s", "p", "o", "otype", "dtype", "lang")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, planted.collect()))


def test_batching_is_deterministic_and_sized(spark, planted):
    recs = encode_core_triples(planted, batch_size=3)
    rows = {(r["id"], r["collection"], r["batch"]): r["n_items"]
            for r in recs.collect()}
    # d1/default has 4 triples -> batches of 3 + 1
    assert rows[("d1", "default", 0)] == 3
    assert rows[("d1", "default", 1)] == 1
    assert rows[("d2", "default", 0)] == 2
    assert rows[("d2", "other", 0)] == 1
    # byte-deterministic across runs
    a = {tuple(r[:4]): bytes(r["record"])
         for r in recs.select("kind", "id", "collection", "batch",
                              "record").collect()}
    b = {tuple(r[:4]): bytes(r["record"])
         for r in encode_core_triples(planted, batch_size=3)
         .select("kind", "id", "collection", "batch", "record").collect()}
    assert a == b


def test_wire_shape_matches_reference_writer(spark, planted):
    """The record for a known batch must be byte-identical to what
    get_kg_core.py's write_triple would emit for the same data."""
    recs = encode_core_triples(
        planted.where(F.col("id") == "d2"), batch_size=10)
    rec = [bytes(r["record"]) for r in recs.collect()
           if r["collection"] == "default"]
    assert len(rec) == 1
    expected = packb(("t", {
        "m": {"i": "d2", "m": [], "c": "default"},
        "t": [
            # sorted by (s, p, otype, o, ...): _:b0 < http://ex/s5
            {"s": {"t": "b", "d": "b0"},
             "p": {"t": "i", "i": "http://ex/p4"},
             "o": {"t": "b", "d": "b1"}},
            {"s": {"t": "i", "i": "http://ex/s5"},
             "p": {"t": "i", "i": "http://ex/p5"},
             "o": {"t": "t", "tr": {
                 "s": {"t": "i", "i": "http://ex/a"},
                 "p": {"t": "i", "i": "http://ex/b"},
                 "o": {"t": "l", "v": "v 1"}}}},
        ],
    }))
    assert rec[0] == expected


def test_literal_dt_ln_only_when_nonempty(spark, planted):
    """TermTranslator.encode emits dt/ln keys only when set
    (primitives.py:59-64)."""
    recs = encode_core_triples(
        planted.where(F.col("id") == "d1"), batch_size=10)
    (_, body), = unpack_stream(bytes(recs.collect()[0]["record"]))
    objs = {t["s"]["i"]: t["o"] for t in body["t"]}
    assert set(objs["http://ex/s2"].keys()) == {"t", "v"}
    assert objs["http://ex/s3"]["ln"] == "en"
    assert "dt" not in objs["http://ex/s3"]
    assert objs["http://ex/s4"]["dt"].endswith("integer")
    assert "ln" not in objs["http://ex/s4"]
    # g key only on the named-graph triple (TripleTranslator g-if-truthy)
    graphs = {t["s"]["i"]: t.get("g") for t in body["t"]}
    assert graphs["http://ex/s1"] == "urn:g1"
    assert graphs["http://ex/s2"] is None


def test_root_metadata_carried_and_deduped(spark, planted):
    root = spark.createDataFrame(
        [("d1", "default", "", "http://ex/doc1",
          "http://purl.org/dc/terms/title", "T1", "l", "", "")],
        TRIPLE_COLS)
    recs = encode_core_triples(planted, root_metadata=root, batch_size=2)
    meta = decode_core_metadata(recs)
    got = meta.collect()
    assert len(got) == 1 and got[0]["o"] == "T1"
    # records without a root still decode with an empty root
    assert decode_core_triples(recs).count() == planted.count()


def test_core_export_missing_m_divergence(spark):
    """core_export.py:61-68 omits the root-metadata key the put side
    reads unconditionally; our reader defaults it (documented fix)."""
    rec = packb(("t", {
        "m": {"i": "dx", "c": "default"},  # no "m" key
        "t": [{"s": {"t": "i", "i": "http://ex/s"},
               "p": {"t": "i", "i": "http://ex/p"},
               "o": {"t": "l", "v": "1"}}],
    }))
    df = spark.createDataFrame([(bytearray(rec),)], "record binary")
    assert decode_core_triples(df).collect()[0]["o"] == "1"
    assert decode_core_metadata(df).count() == 0


def test_entities_roundtrip_float64_exact(spark):
    ents = spark.createDataFrame(
        [("d1", "default", "http://ex/e1", [0.1, -2.5, 3e-7]),
         ("d1", "default", "_:ghost", [1.0]),
         ("d9", "default", "http://ex/e2", [])],
        "id string, collection string, entity string, vector array<double>")
    back = decode_core_entities(encode_core_entities(ents, batch_size=2))
    a = sorted((r[0], r[1], r[2], tuple(r[3])) for r in ents.collect())
    b = sorted((r[0], r[1], r[2], tuple(r[3])) for r in back.collect())
    assert a == b  # float64 wire format: bit-exact


def test_library_roundtrip(spark):
    lm = spark.createDataFrame(
        [("doc9", "text", "A title", "parent1", "pdf", "notes", ["x", "y"]),
         ("doc10", "", "", "", "", "", [])],
        "id string, kind string, title string, parent_id string, "
        "document_type string, comments string, tags array<string>")
    lb = spark.createDataFrame(
        [("doc9", bytearray(b"\x00\x01\xffbinary"))],
        "id string, data binary")
    recs = encode_core_library(lm, lb)
    got_lm = {r["id"]: r for r in decode_core_library(recs).collect()}
    assert got_lm["doc9"]["tags"] == ["x", "y"]
    assert got_lm["doc10"]["title"] == ""
    got_lb = decode_core_blobs(recs).collect()
    assert bytes(got_lb[0]["data"]) == b"\x00\x01\xffbinary"


def test_file_roundtrip_and_record_order(spark, planted, tmp_path):
    ents = spark.createDataFrame(
        [("d1", "default", "http://ex/e1", [0.5])],
        "id string, collection string, entity string, vector array<double>")
    lm = spark.createDataFrame(
        [("d1", "t", "", "", "", "", [])],
        "id string, kind string, title string, parent_id string, "
        "document_type string, comments string, tags array<string>")
    recs = encode_core_triples(planted, batch_size=4) \
        .unionByName(encode_core_entities(ents, batch_size=4)) \
        .unionByName(encode_core_library(lm))
    path = str(tmp_path / "core.msgpack")
    n = write_core_file(recs, path)
    assert n == recs.count()
    # stream order: all "t" records, then "ge", then "lm" (get_kg_core order)
    with open(path, "rb") as f:
        kinds = [r[0] for r in unpack_stream(f.read())]
    assert kinds == sorted(kinds, key=["t", "ge", "lm", "lb"].index)
    rf = read_core_file(spark, path)
    assert sorted(map(tuple, decode_core_triples(rf).collect())) == \
        sorted(map(tuple, decode_core_triples(recs).collect()))
    assert decode_core_entities(rf).count() == 1
    assert decode_core_library(rf).count() == 1


def test_doc_embeddings_roundtrip_and_wire_shape(spark):
    from trustgraph_spark.mpack import packb as mp_packb
    from trustgraph_spark.operators.kgcore import (
        decode_core_doc_embeddings,
        encode_core_doc_embeddings,
    )

    de = spark.createDataFrame(
        [("d1", "default", "chunk-b", [[0.5, -0.25], [1.0, 2.0]]),
         ("d1", "default", "chunk-a", [[3e-7]]),
         ("d2", "other", "chunk-z", [])],
        "id string, collection string, chunk_id string, "
        "vectors array<array<double>>")
    recs = encode_core_doc_embeddings(de, batch_size=10)
    back = decode_core_doc_embeddings(recs)
    a = sorted((r[0], r[1], r[2], tuple(map(tuple, r[3])))
               for r in de.collect())
    b = sorted((r[0], r[1], r[2], tuple(map(tuple, r[3])))
               for r in back.collect())
    assert a == b  # float64 wire: bit-exact

    # byte parity with the reference writer's record shape
    # (save_doc_embeds.py:44-60): chunks sorted by chunk_id in-batch
    rec = {r["id"]: bytes(r["record"]) for r in recs.collect()}
    expected = mp_packb(("de", {
        "m": {"i": "d1", "m": [], "c": "default"},
        "c": [{"c": "chunk-a", "v": [[3e-7]]},
              {"c": "chunk-b", "v": [[0.5, -0.25], [1.0, 2.0]]}],
    }))
    assert rec["d1"] == expected
    got = {r["kind"] for r in recs.collect()}
    assert got == {"de"}
