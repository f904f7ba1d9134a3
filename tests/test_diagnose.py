"""Structured-data diagnosis vs a direct replay of the reference's
type_detector.py heuristics (retrieval/structured_diag)."""

import pytest

from trustgraph_spark.operators.diagnose import (
    detect_csv_options,
    detect_types,
    diagnose,
)

SAMPLES = [
    (0, '<?xml version="1.0"?><root><a>1</a></root>'),
    (1, "<items><item>x</item></items>"),
    (2, '{"a": 1, "b": [2, 3]}'),
    (3, '[{"x": 1}, {"x": 2}]'),
    (4, "name,age,city\nalice,30,berlin\nbob,25,paris"),
    (5, "name;age\nalice;30\nbob;25"),
    (6, "col1\tcol2\n1\t2\n3\t4"),
    (7, "plain prose without structure at all"),
    (8, "   "),
    (9, "<incomplete tag without close"),
    (10, "1,2,3\n4,5,6\n7,8,9"),  # numeric rows, no header
]


@pytest.fixture(scope="module")
def samples(spark):
    df = spark.createDataFrame(SAMPLES, "doc_id long, text string").cache()
    df.count()
    return df


def test_detect_types_reference_heuristic(samples):
    got = {r.doc_id: (r.detected_type, r.confidence)
           for r in detect_types(samples).collect()}
    assert got[0] == ("xml", 0.9)
    assert got[1] == ("xml", 0.9)
    assert got[2] == ("json", 0.9)
    assert got[3] == ("json", 0.9)
    assert got[4] == ("csv", 0.8)
    assert got[7] == ("csv", 0.8)  # fallback, as in the reference
    assert got[8] == (None, 0.0)
    # '<' without '</' does not match the xml arm -> csv fallback
    assert got[9] == ("csv", 0.8)


def test_detect_csv_options_delimiters_and_header(samples):
    got = {r.doc_id: (r.delimiter, r.has_header)
           for r in detect_csv_options(samples).collect()}
    assert got[4] == (",", True)    # text header over numeric-ish rows
    assert got[5] == (";", True)
    assert got[6] == ("\t", True)
    assert got[10] == (",", False)  # all-numeric first row -> no header
    assert got[8] == (",", True)    # defaults on empty


def test_diagnose_combined(samples):
    rows = {r.doc_id: r for r in diagnose(samples).collect()}
    assert rows[2].detected_type == "json" and rows[2].delimiter is None
    assert rows[4].detected_type == "csv" and rows[4].delimiter == ","
    assert rows[4].has_header is True
    assert rows[0].has_header is None  # options only attached for csv
