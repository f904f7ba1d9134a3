"""URI minting parity: must be bit-exact with the reference's to_uri
(extract/kg/definitions/extract.py:89-95) = TRUSTGRAPH_ENTITIES +
quote(text.replace(' ','-').lower().encode('utf-8')), '/' kept unencoded
(reference test test_relationships_batching.py:392-406)."""

import urllib.parse

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from trustgraph_spark.constants import TRUSTGRAPH_ENTITIES
from trustgraph_spark.uris import normalize_entity_name_py, to_uri_py


def reference_to_uri(text: str) -> str:
    part = text.replace(" ", "-").lower().encode("utf-8")
    return TRUSTGRAPH_ENTITIES + urllib.parse.quote(part)


def test_known_cases():
    assert to_uri_py("Machine Learning") == TRUSTGRAPH_ENTITIES + "machine-learning"
    # '/' survives unencoded (quote default safe='/')
    assert to_uri_py("TCP/IP Protocol") == TRUSTGRAPH_ENTITIES + "tcp/ip-protocol"
    # UTF-8 percent-encoding, lowercase first
    assert to_uri_py("Naïve Bayes") == TRUSTGRAPH_ENTITIES + "na%C3%AFve-bayes"
    assert to_uri_py("数据处理") == TRUSTGRAPH_ENTITIES + urllib.parse.quote(
        "数据处理".encode("utf-8")
    )


@given(st.text(max_size=200))
@settings(max_examples=300, deadline=None)
def test_to_uri_property(text):
    assert to_uri_py(text) == reference_to_uri(text)


def test_to_uri_udf_matches(spark):
    samples = [
        "Machine Learning",
        "TCP/IP Protocol",
        "Naïve Bayes",
        "数据处理",
        "a  b   c",
        "UPPER_case-Mixed.~chars!@#$%^&*()",
        "",
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": samples}))
    from trustgraph_spark.uris import to_uri_udf

    got = [r.u for r in df.select(to_uri_udf("t").alias("u")).collect()]
    assert got == [reference_to_uri(s) for s in samples]


def test_to_uri_native_matches_on_safe_ascii(spark):
    from pyspark.sql import functions as F

    from trustgraph_spark.uris import to_uri_native

    samples = ["spark", "hash join", "Merge Sort", "a/b", "x.y-z_w~q"]
    df = spark.createDataFrame(pd.DataFrame({"t": samples}))
    got = [r.u for r in df.select(to_uri_native(F.col("t")).alias("u")).collect()]
    assert got == [reference_to_uri(s) for s in samples]


def test_normalize_entity_name():
    # reference examples (extract/kg/ontology/entity_normalizer.py)
    assert normalize_entity_name_py("Cornish pasty") == "cornish-pasty"
    assert normalize_entity_name_py("  A__B  C ") == "a-b-c"
    assert normalize_entity_name_py("-x--y-") == "x-y"
    assert normalize_entity_name_py("数据 处理") == "数据-处理"


def test_normalize_entity_name_col(spark):
    from pyspark.sql import functions as F

    from trustgraph_spark.uris import normalize_entity_name_col

    samples = [
        "Cornish pasty", "  A__B  C ", "-x--y-", "数据 处理",
        "Naïve Bayes!", "dots.kept.here", "tabs\tand_under",
    ]
    df = spark.createDataFrame(pd.DataFrame({"t": samples}))
    got = [
        r.n for r in df.select(normalize_entity_name_col(F.col("t")).alias("n")).collect()
    ]
    assert got == [normalize_entity_name_py(s) for s in samples]
