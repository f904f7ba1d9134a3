import pytest

from trustgraph_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="trustgraph-spark-tests", cores=8, shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def tiny_transcripts(spark):
    from trustgraph_spark.synth import SynthSpec, synth_transcripts

    spec = SynthSpec(n_convs=20, turns_per_conv=10, hot_factor=5)
    df = synth_transcripts(spark, spec).cache()
    df.count()
    return df


@pytest.fixture(scope="session")
def tiny_chunks(tiny_transcripts):
    from trustgraph_spark.operators.chunking import assemble_turn_chunks

    return assemble_turn_chunks(tiny_transcripts).cache()
