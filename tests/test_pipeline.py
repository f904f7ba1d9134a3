"""End-to-end pipeline: correctness (P/R vs golden), lineage, resume."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.pipeline import Pipeline, PipelineConfig
from trustgraph_spark.synth import golden_triple_set


@pytest.fixture()
def warehouse(tmp_path):
    return str(tmp_path / "wh")


def test_pipeline_end_to_end(spark, tiny_transcripts, warehouse):
    pipe = Pipeline(spark, PipelineConfig(warehouse=warehouse))
    out = pipe.run(tiny_transcripts, run_id="r1")

    # content triples (default graph) match golden set exactly
    content = out["edges"].where(F.col("g") == "")
    got = {(r.s, r.p, r.o, r.otype) for r in content.collect()}
    src = tiny_transcripts.select("conv_id", "turn_idx", "text").collect()
    golden = golden_triple_set([(r.conv_id, r.turn_idx, r.text) for r in src])
    tp = len(got & golden)
    assert tp / len(got) == 1.0
    assert tp / len(golden) == 1.0

    # provenance present in the source graph
    assert out["edges"].where(F.col("g") == "urn:graph:source").count() > 0
    # node/quad tables materialized
    assert out["nodes"].count() > 0
    assert out["quads_by_entity"].count() > out["edges"].count()

    # per-stage lineage recorded with metrics
    lineage = pipe.wh.lineage()
    stages = {l["stage"] for l in lineage}
    assert {"chunks", "extractions", "content_triples",
            "edges", "quads_by_entity", "nodes"} <= stages
    assert all(l["output_rows"] >= 0 and l["wall_sec"] >= 0 for l in lineage)


def test_pipeline_resume_skips_unchanged(spark, tiny_transcripts, warehouse):
    pipe1 = Pipeline(spark, PipelineConfig(warehouse=warehouse))
    out1 = pipe1.run(tiny_transcripts, run_id="r1")
    e1 = {(r.s, r.p, r.o) for r in out1["edges"].collect()}

    # second run over the same input: every stage skips
    pipe2 = Pipeline(spark, PipelineConfig(warehouse=warehouse))
    out2 = pipe2.run(tiny_transcripts, run_id="r2")
    assert all(m.get("skipped") for m in pipe2.metrics.values()), pipe2.metrics
    e2 = {(r.s, r.p, r.o) for r in out2["edges"].collect()}
    assert e1 == e2


def test_pipeline_resume_reruns_on_changed_input(spark, tiny_transcripts, warehouse):
    pipe1 = Pipeline(spark, PipelineConfig(warehouse=warehouse, with_provenance=False))
    pipe1.run(tiny_transcripts, run_id="r1")

    changed = tiny_transcripts.where(F.col("conv_id") != "conv-00001")
    pipe2 = Pipeline(spark, PipelineConfig(warehouse=warehouse, with_provenance=False))
    out2 = pipe2.run(changed, run_id="r2")
    assert pipe2.metrics["chunks"]["skipped"] is False
    # dropped conversation's chunks are gone
    assert out2["chunks"].where(F.col("root_id") == "conv-00001").count() == 0


def test_config_change_invalidates_checkpoints(spark, tiny_transcripts, warehouse):
    pipe1 = Pipeline(spark, PipelineConfig(warehouse=warehouse, linking_threshold=0.95))
    pipe1.run(tiny_transcripts, run_id="r1")

    # different linking threshold: linking-dependent stages must re-run
    pipe2 = Pipeline(spark, PipelineConfig(warehouse=warehouse, linking_threshold=0.5))
    pipe2.run(tiny_transcripts, run_id="r2")
    assert pipe2.metrics["canonical_mapping"]["skipped"] is False
    assert pipe2.metrics["edges"]["skipped"] is False


def test_per_partition_lineage(spark, tiny_transcripts, warehouse):
    import json as _json

    pipe = Pipeline(spark, PipelineConfig(warehouse=warehouse, with_linking=False))
    pipe.run(tiny_transcripts, run_id="r1")
    lineage = pipe.wh.lineage()
    for rec in lineage:
        extra = _json.loads(rec["extra"])
        parts = extra.get("partitions")
        assert parts is not None and len(parts) >= 1
        assert sum(n for _, n in parts) == rec["output_rows"]
