"""Wire-format batched triples-query execution (operators/wire.py).

Grammar parity targets: messaging/translators/primitives.py:6-100
(term wire dicts), translators/triples.py:13-28 (request defaults)
and :55-75 (response encode), query/triples/cassandra/service.py:57-71
(get_term_value) and :203-314 (8-way dispatch),
direct/cassandra_kg.py:1128-1141 (graph filter).
"""

import json

from trustgraph_spark.operators.wire import (
    decode_triples_requests,
    encode_triples_responses,
    execute_triples_requests,
)

_STORE_SCHEMA = ("collection string, g string, s string, p string, "
                 "o string, otype string, dtype string, lang string")


def _qt_store(s, p, o):
    # the stored spaced-json.dumps dialect (write.py / quoted_triple_json)
    return json.dumps({"s": {"type": "i", "iri": s},
                       "p": {"type": "i", "iri": p},
                       "o": {"type": "i", "iri": o}})


def _store(spark):
    return spark.createDataFrame([
        ("default", "", "http://t/e/a", "http://t/p/x", "http://t/e/b",
         "u", "", ""),
        ("default", "", "http://t/e/a", "http://t/p/x", "lit one",
         "l", "", "en"),
        ("default", "urn:g:1", "http://t/e/a", "http://t/p/y",
         "http://t/e/c", "u", "", ""),
        ("default", "", "http://t/e/d", "http://t/p/x", "http://t/e/b",
         "u", "", ""),
        ("other", "", "http://t/e/a", "http://t/p/x", "http://t/e/b",
         "u", "", ""),
        ("default", "", "urn:sg:1", "https://tg/contains",
         _qt_store("A", "P", "B"), "t", "", ""),
    ], _STORE_SCHEMA)


def _run(spark, req_dicts):
    reqs = spark.createDataFrame(
        [(f"r{i}", json.dumps(d)) for i, d in enumerate(req_dicts)],
        "req_id string, request string")
    out = execute_triples_requests(
        decode_triples_requests(reqs), _store(spark))
    res = {}
    for r in out.collect():
        res.setdefault(r["req_id"], []).append(r)
    return res


def test_wire_decode_defaults_and_term_arms(spark):
    reqs = spark.createDataFrame([
        ("a", json.dumps({"s": {"t": "i", "i": "http://x"}})),
        ("b", json.dumps({"o": {"t": "l", "v": "v1"}, "g": "",
                          "limit": 3, "collection": "c2"})),
        ("c", json.dumps({"s": {"t": "b", "d": "bn1"},
                          "p": {"t": "b"}})),  # blank: id / unbound
        ("d", json.dumps({"o": {"t": "t", "tr": {
            "s": {"t": "i", "i": "A"}, "p": {"t": "i", "i": "P"},
            "o": {"t": "l", "v": "V"}}}})),
    ], "req_id string, request string")
    dec = {r["req_id"]: r for r in decode_triples_requests(reqs).collect()}
    # defaults (translators/triples.py:24-27)
    assert (dec["a"]["limit"], dec["a"]["collection"],
            dec["a"]["g_val"]) == (10000, "default", None)
    assert dec["a"]["s_val"] == "http://x" and dec["a"]["p_val"] is None
    assert (dec["b"]["o_val"], dec["b"]["g_val"], dec["b"]["limit"],
            dec["b"]["collection"]) == ("v1", "", 3, "c2")
    # blank node: id-or-value; neither -> unbound (get_term_value :70)
    assert dec["c"]["s_val"] == "bn1" and dec["c"]["p_val"] is None
    # quoted triple canonicalizes to the compact storage-equivalent JSON
    assert json.loads(dec["d"]["o_val"]) == {
        "s": {"type": "i", "iri": "A"}, "p": {"type": "i", "iri": "P"},
        "o": {"type": "l", "value": "V"}}


def test_wire_execute_masks_graphs_limits(spark):
    res = _run(spark, [
        {"s": {"t": "i", "i": "http://t/e/a"},
         "p": {"t": "i", "i": "http://t/p/x"}},           # r0: s+p
        {"o": {"t": "l", "v": "lit one"}, "g": "", "limit": 1},  # r1
        {"g": "urn:g:1"},                                  # r2: scan, named g
        {"o": {"t": "t", "tr": {
            "s": {"t": "i", "i": "A"}, "p": {"t": "i", "i": "P"},
            "o": {"t": "i", "i": "B"}}}},                  # r3: RDF-star o
        {"collection": "other"},                           # r4
        {"s": {"t": "i", "i": "http://t/e/a"}, "limit": 2},  # r5: limit cut
        {"s": {"t": "i", "i": "http://t/e/zzz"}},          # r6: no match
    ])
    assert {(r["o"], r["otype"]) for r in res["r0"]} == {
        ("http://t/e/b", "u"), ("lit one", "l")}
    assert len(res["r1"]) == 1 and res["r1"][0]["lang"] == "en"
    assert [(r["p"], r["g"]) for r in res["r2"]] == [
        ("http://t/p/y", "urn:g:1")]
    # structural RDF-star match across byte dialects (spaced storage
    # JSON vs compact canonical) — never a byte comparison
    assert [r["s"] for r in res["r3"]] == ["urn:sg:1"]
    assert [r["s"] for r in res["r4"]] == ["http://t/e/a"]
    # deterministic (g, s, p, o, otype) order under the limit:
    # http://t/e/a rows sort default-graph first, IRI-o before literal
    assert [(r["g"], r["o"]) for r in res["r5"]] == [
        ("", "http://t/e/b"), ("", "lit one")]
    assert "r6" not in res


def test_wire_unbound_scan_all_graphs(spark):
    # absent g = all graphs (cassandra_kg.py g=None), default collection
    res = _run(spark, [{}])
    assert len(res["r0"]) == 5  # every default-collection row


def test_wire_response_encode(spark):
    res = _run(spark, [
        {"s": {"t": "i", "i": "http://t/e/a"}},
        {"o": {"t": "t", "tr": {
            "s": {"t": "i", "i": "A"}, "p": {"t": "i", "i": "P"},
            "o": {"t": "i", "i": "B"}}}},
    ])
    rows = [r for rs in res.values() for r in rs]
    df = spark.createDataFrame(rows)
    enc = {(r["req_id"], r["triple_json"])
           for r in encode_triples_responses(df).collect()}
    parsed = {(rid, json.dumps(json.loads(tj), sort_keys=True))
              for rid, tj in enc}
    # literal with language: ln present, dt omitted (encode :60-64)
    assert (
        "r0", json.dumps(json.loads(
            '{"s":{"t":"i","i":"http://t/e/a"},'
            '"p":{"t":"i","i":"http://t/p/x"},'
            '"o":{"t":"l","v":"lit one","ln":"en"}}'), sort_keys=True)
    ) in parsed
    # named graph present only when non-default
    assert (
        "r0", json.dumps(json.loads(
            '{"s":{"t":"i","i":"http://t/e/a"},'
            '"p":{"t":"i","i":"http://t/p/y"},'
            '"o":{"t":"i","i":"http://t/e/c"},"g":"urn:g:1"}'),
            sort_keys=True)
    ) in parsed
    # RDF-star object re-nests as a tr wire term
    assert (
        "r1", json.dumps(json.loads(
            '{"s":{"t":"i","i":"urn:sg:1"},'
            '"p":{"t":"i","i":"https://tg/contains"},'
            '"o":{"t":"t","tr":{"s":{"t":"i","i":"A"},'
            '"p":{"t":"i","i":"P"},"o":{"t":"i","i":"B"}}}}'),
            sort_keys=True)
    ) in parsed


def test_wire_plan_broadcast_no_cartesian(spark):
    reqs = spark.createDataFrame(
        [("r0", json.dumps({"s": {"t": "i", "i": "http://t/e/a"}}))],
        "req_id string, request string")
    out = execute_triples_requests(
        decode_triples_requests(reqs), _store(spark))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan

# ---------------------------------------------------------------------------
# Embeddings-query wire leg (translators/embeddings_query.py)
# ---------------------------------------------------------------------------

def test_wire_embeddings_decode_execute_encode(spark):
    from trustgraph_spark.operators.wire import (
        decode_embeddings_requests,
        encode_doc_embeddings_responses,
        encode_graph_embeddings_responses,
        execute_embeddings_requests,
    )

    store = spark.createDataFrame([
        ("http://t/e/x", [1.0, 0.0], "default"),
        ("http://t/e/y", [0.0, 1.0], "default"),
        ("http://t/e/z", [1.0, 1.0], "default"),
        ("http://t/e/w", [1.0, 0.0], "c2"),
        # duplicate id: best score kept
        ("http://t/e/x", [0.5, 0.5], "default"),
    ], "entity string, vector array<double>, collection string")
    reqs = spark.createDataFrame([
        ("r0", json.dumps({"vector": [1.0, 0.0], "limit": 2})),
        ("r1", json.dumps({"vector": [1.0, 0.0]})),          # default 10
        ("r2", json.dumps({"vector": [1.0, 0.0],
                           "collection": "c2"})),
    ], "req_id string, request string")
    dec = {r["req_id"]: r for r in
           decode_embeddings_requests(reqs).collect()}
    assert (dec["r1"]["limit"], dec["r1"]["collection"]) == (10, "default")
    assert dec["r0"]["query_vector"] == [1.0, 0.0]

    out = execute_embeddings_requests(
        decode_embeddings_requests(reqs), store)
    rows = {}
    for r in out.collect():
        rows.setdefault(r["req_id"], []).append(
            (r["rank"], r["entity"], r["score"]))
    for v in rows.values():
        v.sort()
    # limit 2; dup id x keeps its best (1.0 from [1,0], not 0.7071)
    assert rows["r0"] == [(1, "http://t/e/x", 1.0),
                          (2, "http://t/e/z", 0.7071)]
    # default limit 10 returns all 3 default-collection entities
    assert [e for _, e, _ in rows["r1"]] == [
        "http://t/e/x", "http://t/e/z", "http://t/e/y"]
    # collection routing
    assert [e for _, e, _ in rows["r2"]] == ["http://t/e/w"]

    enc = {r["req_id"]: json.loads(r["response_json"]) for r in
           encode_graph_embeddings_responses(out).collect()}
    assert enc["r0"]["entities"][0] == {
        "entity": {"t": "i", "i": "http://t/e/x"}, "score": 1.0}
    assert [e["entity"]["i"] for e in enc["r0"]["entities"]] == [
        "http://t/e/x", "http://t/e/z"]

    chunks = out.withColumnRenamed("entity", "chunk_id")
    denc = {r["req_id"]: json.loads(r["response_json"]) for r in
            encode_doc_embeddings_responses(chunks).collect()}
    assert denc["r2"]["chunks"] == [
        {"chunk_id": "http://t/e/w", "score": 1.0}]


def test_wire_embeddings_store_without_collection(spark):
    from trustgraph_spark.operators.wire import (
        decode_embeddings_requests,
        execute_embeddings_requests,
    )

    store = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "entity string, vector array<double>")
    reqs = spark.createDataFrame(
        [("r0", json.dumps({"vector": [0.0, 2.0], "limit": 1}))],
        "req_id string, request string")
    out = execute_embeddings_requests(
        decode_embeddings_requests(reqs), store).collect()
    assert [(r["entity"], r["score"], r["rank"]) for r in out] == [
        ("b", 1.0, 1)]


def test_wire_query_stream_matches_batch(spark, tmp_path):
    from trustgraph_spark.operators.wire import (
        decode_triples_requests,
        encode_triples_responses,
        execute_triples_requests,
    )
    from trustgraph_spark.streaming import start_wire_query_service

    store = _store(spark)
    req_rows = [
        ("r0", json.dumps({"s": {"t": "i", "i": "http://t/e/a"}})),
        ("r1", json.dumps({"g": "urn:g:1"})),
    ]
    src = tmp_path / "reqs"
    src.mkdir()
    spark.createDataFrame(req_rows, "req_id string, request string") \
        .coalesce(1).write.mode("overwrite") \
        .parquet(str(src / "batch0"))
    stream = spark.readStream.schema("req_id string, request string") \
        .parquet(str(src / "batch0"))
    q = start_wire_query_service(
        stream, store, str(tmp_path / "out"), str(tmp_path / "ck"))
    q.awaitTermination(120)

    got = {(r["req_id"], r["triple_json"]) for r in
           spark.read.parquet(str(tmp_path / "out")).collect()}
    want_df = encode_triples_responses(execute_triples_requests(
        decode_triples_requests(
            spark.createDataFrame(req_rows,
                                  "req_id string, request string")),
        store))
    want = {(r["req_id"], r["triple_json"]) for r in want_df.collect()}
    assert got == want and len(got) >= 4


# ---------------------------------------------------------------------------
# Property: Spark dispatch == pinned-semantics Python replay
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_VOCAB = ["http://t/e/a", "http://t/e/b", "lit x", "lit y"]
_PRED = ["http://t/p/x", "http://t/p/y"]
_GRAPHS = ["", "urn:g:1"]

_STORE_ROW = st.tuples(
    st.sampled_from(["default", "c2"]),
    st.sampled_from(_GRAPHS),
    st.sampled_from(_VOCAB[:2]),
    st.sampled_from(_PRED),
    st.sampled_from(_VOCAB),
    st.sampled_from(["u", "l"]),
)


def _term_strategy():
    iri = st.sampled_from(_VOCAB[:2]).map(lambda v: {"t": "i", "i": v})
    lit = st.sampled_from(_VOCAB).map(lambda v: {"t": "l", "v": v})
    blank = st.sampled_from(["", "bn1"]).map(
        lambda d: {"t": "b", "d": d} if d else {"t": "b"})
    return st.one_of(iri, lit, blank)


_REQ = st.fixed_dictionaries(
    {},
    optional={
        "s": _term_strategy(),
        "p": st.sampled_from(_PRED).map(lambda v: {"t": "i", "i": v}),
        "o": _term_strategy(),
        "g": st.sampled_from(_GRAPHS + ["urn:g:none"]),
        "limit": st.integers(min_value=1, max_value=4),
        "collection": st.sampled_from(["default", "c2"]),
    },
)


def py_term_value(t):
    """TermTranslator.decode + get_term_value replica
    (primitives.py:20-48, service.py:57-71)."""
    if t is None:
        return None
    tt = t.get("t", "")
    if tt == "i":
        return t.get("i", "")
    if tt == "l":
        return t.get("v", "")
    return t.get("d") or t.get("v") or None


def py_execute(store, reqs):
    """query_triples dispatch replica with the repo's documented
    filter-then-limit + (g,s,p,o,otype) order divergences."""
    out = []
    for rid, req in reqs:
        s_val = py_term_value(req.get("s"))
        p_val = py_term_value(req.get("p"))
        o_val = py_term_value(req.get("o"))
        g_val = req.get("g")
        limit = req.get("limit", 10000)
        coll = req.get("collection", "default")
        hits = sorted(
            (g, s, p, o, ot) for (c, g, s, p, o, ot) in store
            if c == coll
            and (s_val is None or s == s_val)
            and (p_val is None or p == p_val)
            and (o_val is None or o == o_val)
            and (g_val is None or g == g_val))
        for g, s, p, o, ot in hits[:limit]:
            out.append((rid, s, p, o, ot, g))
    return sorted(out)


@given(store=st.lists(_STORE_ROW, min_size=0, max_size=8),
       reqs=st.lists(_REQ, min_size=1, max_size=5))
@settings(max_examples=10, deadline=None)
def test_wire_dispatch_property(spark, store, reqs):
    # (g,s,p,o,otype)-unique rows: the limit cut is order-deterministic
    store = sorted({(c, g, s, p, o, ot) for (c, g, s, p, o, ot) in store})
    named = [(f"r{i}", r) for i, r in enumerate(reqs)]
    sdf = spark.createDataFrame(
        [(c, g, s, p, o, ot, "", "") for c, g, s, p, o, ot in store],
        _STORE_SCHEMA)
    rdf = spark.createDataFrame(
        [(rid, json.dumps(r)) for rid, r in named],
        "req_id string, request string")
    got = sorted(
        (r["req_id"], r["s"], r["p"], r["o"], r["otype"], r["g"])
        for r in execute_triples_requests(
            decode_triples_requests(rdf), sdf).collect())
    assert got == py_execute(store, named)


def test_wire_malformed_requests_flagged_not_scanned(spark):
    from trustgraph_spark.operators.wire import (
        decode_embeddings_requests,
        execute_embeddings_requests,
    )

    reqs = spark.createDataFrame([
        ("bad", "{not json"),
        ("scan", "{}"),  # legal scan-everything request
        ("ok", json.dumps({"s": {"t": "i", "i": "http://t/e/a"}})),
    ], "req_id string, request string")
    dec = {r["req_id"]: r for r in
           decode_triples_requests(reqs).collect()}
    assert dec["bad"]["parse_error"] is True
    assert dec["scan"]["parse_error"] is False
    out = execute_triples_requests(
        decode_triples_requests(reqs), _store(spark))
    ids = {r["req_id"] for r in out.collect()}
    # the garbage request never becomes a store scan; the legal ones run
    assert "bad" not in ids and {"scan", "ok"} <= ids

    ereqs = spark.createDataFrame([
        ("bad", "{oops"),
        ("novec", json.dumps({"limit": 2})),  # vector is REQUIRED
        ("ok", json.dumps({"vector": [1.0, 0.0]})),
    ], "req_id string, request string")
    store = spark.createDataFrame(
        [("a", [1.0, 0.0])], "entity string, vector array<double>")
    eout = {r["req_id"] for r in execute_embeddings_requests(
        decode_embeddings_requests(ereqs), store).collect()}
    assert eout == {"ok"}


def test_wire_degenerate_quoted_term_is_unbound(spark):
    # {"t": "t"} with no tr: triple=None, get_term_value -> None ->
    # the o position is UNBOUND (serialize_triple :30-31)
    reqs = spark.createDataFrame(
        [("r0", json.dumps({"o": {"t": "t"},
                            "p": {"t": "i", "i": "http://t/p/y"}}))],
        "req_id string, request string")
    dec = decode_triples_requests(reqs).collect()[0]
    assert dec["o_val"] is None and dec["p_val"] == "http://t/p/y"
    out = execute_triples_requests(
        decode_triples_requests(reqs), _store(spark)).collect()
    assert [r["o"] for r in out] == ["http://t/e/c"]
