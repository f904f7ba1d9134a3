"""Sequence packing (operators/packing.py) vs a Python replay; the
two-phase prefix sum must be invariant to the bucket count."""

import pytest

from trustgraph_spark.operators.packing import pack_blocks, packing_summary

DOCS = [
    (0, "a b c d e"),            # 5
    (1, "f g h"),                # 3
    (3, ""),                     # 0 (and a doc_id gap)
    (4, "i j k l m n o p"),      # 8
    (7, "q r"),                  # 2
    (9, "s t u v w x"),          # 6
]
SEQ = 8


def py_pack(docs, seq_len):
    out, cum = {}, 0
    for doc_id, text in sorted(docs):
        n = len([w for w in text.lower().split() if w])
        start = cum
        sb = start // seq_len
        eb = (start + n - 1) // seq_len if n > 0 else sb
        out[doc_id] = (n, start, sb, eb)
        cum += n
    return out


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.mark.parametrize("n_buckets", [1, 3, 64])
def test_pack_blocks_matches_replay_any_buckets(spark, docs_df, n_buckets):
    got = {r["doc_id"]: (r["n_tokens"], r["start_tok"],
                         r["start_block"], r["end_block"])
           for r in pack_blocks(docs_df, seq_len=SEQ,
                                n_buckets=n_buckets).collect()}
    assert got == py_pack(DOCS, SEQ)


def test_pack_blocks_straddle_and_gap(spark, docs_df):
    got = {r["doc_id"]: r.asDict()
           for r in pack_blocks(docs_df, seq_len=SEQ).collect()}
    # tokens 0..4 | 5..7 -> doc 1 ends exactly at the block boundary
    assert (got[1]["start_block"], got[1]["end_block"]) == (0, 0)
    # doc 4 spans tokens 8..15 -> exactly block 1
    assert (got[4]["start_block"], got[4]["end_block"]) == (1, 1)
    # doc 9 spans tokens 18..23 -> straddles blocks 2..2 (18//8=2, 23//8=2)
    assert (got[9]["start_block"], got[9]["end_block"]) == (2, 2)
    # empty doc occupies no tokens; start==end block
    assert got[3]["n_tokens"] == 0
    assert got[3]["start_block"] == got[3]["end_block"]


def test_packing_summary(spark, docs_df):
    s = packing_summary(pack_blocks(docs_df, seq_len=SEQ),
                        seq_len=SEQ).first()
    assert s["total_tokens"] == 24
    assert s["n_blocks"] == 3
    assert s["last_block_fill"] == 1.0      # 24 % 8 == 0
    assert s["n_straddling"] == 0


def test_straddling_detected(spark):
    docs = spark.createDataFrame(
        [(0, " ".join("t" + str(i) for i in range(5))),
         (1, " ".join("u" + str(i) for i in range(6)))],
        "doc_id long, text string")
    got = {r["doc_id"]: r.asDict()
           for r in pack_blocks(docs, seq_len=8).collect()}
    # doc 1 spans tokens 5..10 -> blocks 0..1
    assert (got[1]["start_block"], got[1]["end_block"]) == (0, 1)
    s = packing_summary(pack_blocks(docs, seq_len=8), seq_len=8).first()
    assert s["n_straddling"] == 1
    assert s["last_block_fill"] == pytest.approx(round(3 / 8, 6))
