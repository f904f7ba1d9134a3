"""Medium-scale P/R parity (FIXTURES.md: 'small' corpus for P/R checks) —
the full pipeline (with linking + provenance) over ~26k turns with a hot
conversation, content triples vs golden derivation."""

from pyspark.sql import functions as F

from trustgraph_spark.pipeline import Pipeline, PipelineConfig
from trustgraph_spark.synth import SynthSpec, golden_triple_set, synth_transcripts


def test_medium_corpus_parity(spark, tmp_path):
    spec = SynthSpec(n_convs=500, turns_per_conv=50, hot_factor=30)
    tr = synth_transcripts(spark, spec).cache()
    n = tr.count()
    assert n == 500 * 50 + 29 * 50

    pipe = Pipeline(
        spark,
        PipelineConfig(warehouse=str(tmp_path / "wh"), checkpointing=False),
    )
    out = pipe.run(tr, run_id="parity")
    content = out["edges"].where(F.col("g") == "")
    got = {(r.s, r.p, r.o, r.otype) for r in content.collect()}

    src = tr.select("conv_id", "turn_idx", "text").collect()
    golden = golden_triple_set([(r.conv_id, r.turn_idx, r.text) for r in src])
    tp = len(got & golden)
    precision = tp / len(got)
    recall = tp / len(golden)
    # BASELINE.json target is >= 0.95; the deterministic extractor is exact
    assert precision == 1.0, f"P={precision}"
    assert recall == 1.0, f"R={recall}"

    # strict-mode linking must not have merged distinct entities
    mapped = pipe.metrics.get("canonical_mapping", {}).get("rows", 0)
    assert mapped == 0
    tr.unpersist()
