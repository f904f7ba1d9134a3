"""Streaming corpus hygiene (streaming.hygiene_stream): stream output
must equal the batch run of the same composition, with cross-file
duplicates deduped by the JVM-managed dropDuplicates state."""

from pyspark.sql import functions as F

from trustgraph_spark.streaming import hygiene_stream

SCHEMA = "doc_id long, text string"

DOCS_A = [
    (0, "the quick brown fox jumps over the lazy dog near the gate"),
    (1, "call me at (555) 867-5309 or mail bob@example.org today"),
    (2, "dup body shared across files"),
]
DOCS_B = [
    (3, "dup body shared across files"),          # cross-file duplicate
    (4, "server 10.1.2.3 paid with 4111 1111 1111 1111"),
    (5, "the quick brown fox jumps over the lazy dog near the gate"),
]


def test_hygiene_stream_matches_batch(spark, tmp_path):
    src = tmp_path / "docs"
    spark.createDataFrame(DOCS_A, SCHEMA).coalesce(1).write.parquet(
        str(src / "f1"))
    spark.createDataFrame(DOCS_B, SCHEMA).coalesce(1).write.parquet(
        str(src / "f2"))

    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", 1)
              .parquet(str(src / "*")))
    q = (hygiene_stream(stream)
         .writeStream.format("memory")
         .queryName("hygiene_out")
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    got = spark.sql("select * from hygiene_out").collect()

    batch_df = spark.createDataFrame(DOCS_A + DOCS_B, SCHEMA)
    batch = hygiene_stream(batch_df.dropDuplicates(["doc_id"])).collect()

    # which doc_id of a duplicate pair survives is arrival-order
    # dependent; compare the content sets (hash, redacted, pass)
    key = lambda rows: sorted((r["text_hash"], r["redacted"],
                               r["gopher_pass"]) for r in rows)
    assert key(got) == key(batch)
    # exactly one survivor per distinct hash
    assert len(got) == 4
    hashes = [r["text_hash"] for r in got]
    assert len(set(hashes)) == len(hashes)


def test_hygiene_stream_redacts_and_flags(spark, tmp_path):
    src = tmp_path / "docs"
    spark.createDataFrame(DOCS_A + DOCS_B, SCHEMA).write.parquet(
        str(src / "f"))
    stream = (spark.readStream.schema(SCHEMA).parquet(str(src / "*")))
    q = (hygiene_stream(stream)
         .writeStream.format("memory")
         .queryName("hygiene_out2")
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(120)
    rows = {r["redacted"] for r in
            spark.sql("select * from hygiene_out2").collect()}
    assert "call me at <PHONE> or mail <EMAIL> today" in rows
    assert "server <IP> paid with <CARD>" in rows
    # short word-soup docs fail the Gopher word-count floor
    flags = {r["gopher_pass"] for r in
             spark.sql("select * from hygiene_out2").collect()}
    assert flags == {False}
