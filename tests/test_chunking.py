"""Turn assembly invariants (BASELINE input_hint: per-turn text equality
under stable (conv_id, turn_idx) ordering) and chunker semantics
(reference chunking/recursive/chunker.py defaults 2000/100)."""

from pyspark.sql import functions as F

from trustgraph_spark.operators.chunking import (
    assemble_conversation_documents,
    assemble_turn_chunks,
    recursive_chunker,
    token_chunker,
)


def test_per_turn_text_equality(spark, tiny_transcripts, tiny_chunks):
    """Every chunk's text equals the source turn's text, joined on the
    deterministic chunk key (root_id=conv_id, turn_idx)."""
    src = tiny_transcripts.select(
        F.col("conv_id").alias("root_id"), "turn_idx", F.col("text").alias("src_text")
    )
    joined = tiny_chunks.join(src, ["root_id", "turn_idx"], "full_outer")
    mismatches = joined.where(~F.col("text").eqNullSafe(F.col("src_text"))).count()
    assert mismatches == 0
    assert tiny_chunks.count() == tiny_transcripts.count()


def test_chunk_ids_deterministic_and_unique(tiny_chunks):
    n = tiny_chunks.count()
    assert tiny_chunks.select("chunk_id").distinct().count() == n
    # deterministic: recompute produces the identical set
    again = tiny_chunks.select("chunk_id")
    assert again.exceptAll(tiny_chunks.select("chunk_id")).count() == 0


def test_conversation_assembly_order(spark, tiny_transcripts):
    docs = assemble_conversation_documents(tiny_transcripts, turns_per_bucket=3)
    row = docs.where(F.col("conv_id") == "conv-00001").collect()[0]
    expected = "\n".join(
        r.text
        for r in tiny_transcripts.where(F.col("conv_id") == "conv-00001")
        .orderBy("turn_idx")
        .collect()
    )
    assert row.text == expected
    # hot conversation assembled correctly across salt buckets too
    hot = docs.where(F.col("conv_id") == "conv-00000").collect()[0]
    expected_hot = "\n".join(
        r.text
        for r in tiny_transcripts.where(F.col("conv_id") == "conv-00000")
        .orderBy("turn_idx")
        .collect()
    )
    assert hot.text == expected_hot
    assert hot.n_turns == 50


def test_recursive_chunker_size_overlap(spark):
    text = "x" * 5000
    df = spark.createDataFrame([("d1", text)], "conv_id string, text string")
    chunks = recursive_chunker(df, chunk_size=2000, chunk_overlap=100).collect()
    sizes = [len(c.text) for c in sorted(chunks, key=lambda c: c.turn_idx)]
    # offsets 0, 1900, 3800 -> sizes 2000, 2000, 1200
    assert sizes == [2000, 2000, 1200]
    # overlap: last 100 chars of chunk i == first 100 of chunk i+1
    ordered = sorted(chunks, key=lambda c: c.turn_idx)
    assert ordered[0].text[-100:] == ordered[1].text[:100]


def test_recursive_chunker_reconstructs(spark):
    import string

    text = (string.ascii_letters + string.digits) * 80  # 4960 chars
    df = spark.createDataFrame([("d1", text)], "conv_id string, text string")
    chunks = sorted(
        recursive_chunker(df, chunk_size=2000, chunk_overlap=100).collect(),
        key=lambda c: c.turn_idx,
    )
    rebuilt = chunks[0].text + "".join(c.text[100:] for c in chunks[1:])
    assert rebuilt == text


def test_token_chunker(spark):
    text = " ".join(f"w{i}" for i in range(1000))
    df = spark.createDataFrame([("d1", text)], "conv_id string, text string")
    chunks = sorted(
        token_chunker(df, tokens_per_chunk=400, token_overlap=20).collect(),
        key=lambda c: c.turn_idx,
    )
    assert len(chunks) == 3  # offsets 0, 380, 760
    assert chunks[0].text.split(" ")[0] == "w0"
    assert chunks[1].text.split(" ")[0] == "w380"
    assert len(chunks[0].text.split(" ")) == 400


def test_recursive_chunker_no_pure_overlap_trailing_chunk(spark):
    # len == chunk_size: the second offset (1900) would yield a chunk fully
    # contained in the first -> exactly 1 chunk
    df = spark.createDataFrame([("d1", "x" * 2000)], "conv_id string, text string")
    assert recursive_chunker(df, chunk_size=2000, chunk_overlap=100).count() == 1
    # len = 2100: offset 1900 adds chars 2000..2099 -> 2 chunks
    df2 = spark.createDataFrame([("d1", "x" * 2100)], "conv_id string, text string")
    assert recursive_chunker(df2, chunk_size=2000, chunk_overlap=100).count() == 2


def test_chunkers_empty_text_emit_nothing(spark):
    df = spark.createDataFrame([("d1", ""), ("d2", "hello")], "conv_id string, text string")
    rc = recursive_chunker(df, chunk_size=10, chunk_overlap=2).collect()
    assert [c.root_id for c in rc] == ["d2"]
    tc = token_chunker(df, tokens_per_chunk=4, token_overlap=1).collect()
    assert [c.root_id for c in tc] == ["d2"]


def test_token_chunker_no_pure_overlap_trailing_chunk(spark):
    # exactly tokens_per_chunk tokens: second offset would be pure overlap
    text = " ".join(f"w{i}" for i in range(400))
    df = spark.createDataFrame([("d1", text)], "conv_id string, text string")
    assert token_chunker(df, tokens_per_chunk=400, token_overlap=20).count() == 1
