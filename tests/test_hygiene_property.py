"""Property-based checks for the corpus-hygiene family: random small
corpora, Spark result == the pinned-semantics Python replay.

Each Spark round-trip costs seconds, so examples are few but the
corpora are adversarial: tiny vocabularies force heavy cross-doc
duplication, random newlines exercise line structure, and doc counts
hit the empty/single/boundary edges."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_linededup import py_dedup
from tests.test_packing import py_pack
from tests.test_spandedup import py_span_dedup
from trustgraph_spark.operators.linededup import corpus_line_dedup
from trustgraph_spark.operators.packing import pack_blocks
from trustgraph_spark.operators.spandedup import exact_substring_dedup

# tiny vocabulary -> dense duplication
_WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
_LINE = st.lists(_WORD, min_size=0, max_size=5).map(" ".join)
_TEXT = st.lists(_LINE, min_size=0, max_size=5).map("\n".join)
_CORPUS = st.lists(_TEXT, min_size=0, max_size=6).map(
    lambda ts: [(i, t) for i, t in enumerate(ts)])


@pytest.fixture(scope="module")
def mk_df(spark):
    def make(docs):
        return spark.createDataFrame(docs, "doc_id long, text string") \
            if docs else spark.createDataFrame([], "doc_id long, text string")
    return make


@given(docs=_CORPUS)
@settings(max_examples=12, deadline=None)
def test_line_dedup_property(mk_df, docs):
    got = {r["doc_id"]: (r["text"], r["n_lines_kept"],
                         r["n_lines_dropped"])
           for r in corpus_line_dedup(mk_df(docs)).collect()}
    assert got == py_dedup(docs)


@given(docs=_CORPUS, n=st.integers(min_value=2, max_value=4))
@settings(max_examples=12, deadline=None)
def test_span_dedup_property(mk_df, docs, n):
    flat = [(i, t.replace("\n", " ")) for i, t in docs]
    got = {r["doc_id"]: (r["text"], r["n_tokens_kept"],
                         r["n_tokens_removed"])
           for r in exact_substring_dedup(mk_df(flat), n=n).collect()}
    assert got == py_span_dedup(flat, n=n)


@given(docs=_CORPUS, seq_len=st.integers(min_value=1, max_value=7),
       n_buckets=st.integers(min_value=1, max_value=5))
@settings(max_examples=12, deadline=None)
def test_packing_property(mk_df, docs, seq_len, n_buckets):
    flat = [(i, t.replace("\n", " ")) for i, t in docs]
    got = {r["doc_id"]: (r["n_tokens"], r["start_tok"],
                         r["start_block"], r["end_block"])
           for r in pack_blocks(mk_df(flat), seq_len=seq_len,
                                n_buckets=n_buckets).collect()}
    assert got == py_pack(flat, seq_len)
