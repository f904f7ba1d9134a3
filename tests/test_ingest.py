"""Descriptor-driven structured ingest (operators/ingest.py) vs an
independent Python replay of load_structured_data.py:340-573 semantics:
format parsing matrices (CSV incl. the kept no-header first-row-as-data
behavior, JSON root_path, XML record paths + field_attribute mode),
native-transform parity fuzz, presence/empty distinction, object
shaping."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.ingest import (
    apply_descriptor_mappings,
    format_extracted_objects,
    load_structured,
    parse_csv_py,
    parse_json_py,
    parse_structured_records,
    parse_xml_py,
)


# --- independent reference replay (transcribed semantics, not code) --------


def _reference_transform_chain(value, transforms):
    for transform in transforms:
        t = transform.get("type")
        if t == "trim" and isinstance(value, str):
            value = value.strip()
        elif t == "upper" and isinstance(value, str):
            value = value.upper()
        elif t == "lower" and isinstance(value, str):
            value = value.lower()
        elif t == "title_case" and isinstance(value, str):
            value = value.title()
        elif t == "to_int":
            try:
                value = int(value) if value != "" else None
            except (ValueError, TypeError):
                pass
        elif t == "to_float":
            try:
                value = float(value) if value != "" else None
            except (ValueError, TypeError):
                pass
    return str(value) if value is not None else ""


def _reference_apply(records, mappings):
    out = []
    for record in records:
        processed = {}
        for m in mappings:
            src = m.get("source_field") or m.get("source")
            if src in record:
                processed[m.get("target_field") or m.get("target")] = \
                    _reference_transform_chain(record[src],
                                               m.get("transforms", []))
        out.append(processed)
    return out


# --- parser matrices -------------------------------------------------------


def test_csv_header_and_quoting():
    raw = 'a,b\n1,"x, y"\n2,"line\nbreak"\n'
    assert parse_csv_py(raw, {}) == [
        {"a": "1", "b": "x, y"},
        {"a": "2", "b": "line\nbreak"},
    ]


def test_csv_no_header_keeps_first_row_as_data():
    raw = "p,q\n1,2\n"
    # reference quirk kept: `has_header or header-default-True` means
    # {"has_header": False} ALONE still parses with a header
    # (load_structured_data.py:355); both keys must be false
    assert parse_csv_py(raw, {"has_header": False}) == [{"p": "1", "q": "2"}]
    # the no-header path re-reads the whole stream with generated names,
    # so the first row comes back as data (:360-365) — behavior kept
    assert parse_csv_py(raw, {"has_header": False, "header": False}) == [
        {"field_1": "p", "field_2": "q"},
        {"field_1": "1", "field_2": "2"},
    ]


def test_csv_delimiter_and_short_long_rows():
    raw = "a;b\n1\n2;3;4\n"
    got = parse_csv_py(raw, {"delimiter": ";"})
    assert got[0] == {"a": "1", "b": None}       # short row -> None value
    assert got[1] == {"a": "2", "b": "3"}        # overflow restkey dropped


def test_json_list_dict_and_root_path():
    assert parse_json_py('[{"a": 1}, {"a": 2}]', {}) == [
        {"a": "1"}, {"a": "2"}]
    assert parse_json_py('{"a": true}', {}) == [{"a": "True"}]
    raw = '{"rows": [{"x": 1.5, "y": null}], "other": 1}'
    assert parse_json_py(raw, {"root_path": "$.rows"}) == [
        {"x": "1.5", "y": None}]
    # unknown root path falls back to the dict itself (reference .get default)
    assert parse_json_py('{"x": "v"}', {"root_path": "$.nope"}) == [
        {"x": "v"}]


def test_xml_paths_and_field_attribute():
    raw = "<ROOT><r i='1'><a>x</a><empty/></r><r i='2'><a> y </a></r></ROOT>"
    got = parse_xml_py(raw, {"record_path": "/ROOT/r"})
    assert got == [{"i": "1", "a": "x", "empty": ""},
                   {"i": "2", "a": "y"}]
    # absolute path conversion + legacy element options
    assert parse_xml_py(raw, {"record_path": "//r"}) == got
    # legacy root_element builds //ROOT/r -> .//ROOT/r, which (as in the
    # reference, ElementTree descendant search) can only match a NESTED
    # container, never the document root
    assert parse_xml_py(raw, {"root_element": "ROOT",
                              "record_element": "r"}) == []
    nested = "<doc><ROOT><r><a>z</a></r></ROOT></doc>"
    assert parse_xml_py(nested, {"root_element": "ROOT",
                                 "record_element": "r"}) == [{"a": "z"}]
    # UN-data field_attribute mode
    un = ('<data><record><field name="Country">Albania</field>'
          '<field name="Year">1990</field></record></data>')
    assert parse_xml_py(un, {"record_path": "//record",
                             "field_attribute": "name"}) == [
        {"Country": "Albania", "Year": "1990"}]
    # text-only record fallback
    assert parse_xml_py("<l><v> t </v></l>", {"record_path": "//v"}) == [
        {"value": "t"}]


# --- native transform parity ----------------------------------------------

_FUZZ_VALUES = [
    "", "a", "A b C", "  padded  ", "\tmix\n", "42", " +007 ", "-13",
    "bad9", "1.5", "3.14159", ".5", "-0", "0", "o'brien 3d STUFF",
    "MIXED case Text", "12a", "a12", "e4", "1e3x", "+-2", "--3", "7 7",
]

_CHAINS = [
    [{"type": "trim"}],
    [{"type": "upper"}],
    [{"type": "lower"}],
    [{"type": "title_case"}],
    [{"type": "to_int"}],
    [{"type": "to_float"}],
    [{"type": "trim"}, {"type": "to_int"}],
    [{"type": "trim"}, {"type": "title_case"}],
    [{"type": "to_int"}, {"type": "upper"}],   # post-convert str ops no-op
    [{"type": "lower"}, {"type": "title_case"}, {"type": "trim"}],
]


@pytest.mark.parametrize("chain", _CHAINS,
                         ids=["+".join(t["type"] for t in c) for c in _CHAINS])
def test_transform_chain_parity(spark, chain):
    records = [{"v": x} for x in _FUZZ_VALUES]
    expected = [r.get("t") for r in _reference_apply(
        records, [{"source_field": "v", "target_field": "t",
                   "transforms": chain}])]
    df = spark.createDataFrame(
        [(i, 0, {"v": x}) for i, x in enumerate(_FUZZ_VALUES)],
        "doc_id long, rec_idx long, record map<string,string>")
    got = apply_descriptor_mappings(
        df, {"mappings": [{"source_field": "v", "target_field": "t",
                           "transforms": chain}]})
    by_id = {r["doc_id"]: r["t"] for r in got.collect()}
    for i, exp in enumerate(expected):
        assert by_id[i] == exp, (chain, _FUZZ_VALUES[i], by_id[i], exp)


def test_missing_vs_empty_vs_null_source(spark):
    df = spark.createDataFrame(
        [(0, 0, {"a": ""}), (1, 0, {"b": "x"}), (2, 0, {"a": None})],
        "doc_id long, rec_idx long, record map<string,string>")
    got = {r["doc_id"]: r["t"] for r in apply_descriptor_mappings(
        df, {"mappings": [{"source_field": "a", "target_field": "t",
                           "transforms": [{"type": "to_int"}]}]}).collect()}
    assert got[0] == ""        # present-empty -> "" (str(None) guard)
    assert got[1] is None      # absent -> omitted (NULL)
    assert got[2] == ""        # present-null (short CSV row) -> ""


def test_duplicate_target_last_wins(spark):
    df = spark.createDataFrame(
        [(0, 0, {"a": "x", "b": "y"})],
        "doc_id long, rec_idx long, record map<string,string>")
    got = apply_descriptor_mappings(
        df, {"mappings": [
            {"source_field": "a", "target_field": "t"},
            {"source_field": "b", "target_field": "t"},
        ]})
    assert got.columns == ["doc_id", "rec_idx", "t"]
    assert got.collect()[0]["t"] == "y"


# --- end-to-end ------------------------------------------------------------

_DESCRIPTOR = {
    "format": {"type": "csv", "options": {"delimiter": ",",
                                          "has_header": True}},
    "mappings": [
        {"source_field": "name", "target_field": "name",
         "transforms": [{"type": "trim"}, {"type": "upper"}]},
        {"source_field": "qty", "target_field": "quantity",
         "transforms": [{"type": "to_int"}]},
        {"source_field": "price", "target_field": "price",
         "transforms": [{"type": "to_float"}]},
        {"source_field": "nosuch", "target_field": "ghost"},
    ],
    "output": {"schema_name": "item", "options": {"confidence": 0.75}},
}


def test_load_structured_end_to_end(spark):
    docs = spark.createDataFrame(
        [(0, 'name,qty,price\n  alpha , 7 ,1.5\n"beta, x",bad,\n'),
         (1, "name,qty,price\ngamma,042,2\n"),
         (2, "totally broken \x00 but csv never fails to parse")],
        "doc_id long, text string")
    out = load_structured(docs, _DESCRIPTOR, collection="c1")
    rows = {(r["doc_id"], r["rec_idx"]): r for r in out.collect()}
    r00 = rows[(0, 0)]
    assert (r00["name"], r00["quantity"], r00["price"]) == ("ALPHA", "7", "1.5")
    assert r00["ghost"] is None
    assert r00["schema_name"] == "item" and r00["confidence"] == 0.75
    assert r00["collection"] == "c1"
    r01 = rows[(0, 1)]
    assert (r01["name"], r01["quantity"], r01["price"]) == \
        ("BETA, X", "bad", "")
    r10 = rows[(1, 0)]
    assert (r10["name"], r10["quantity"], r10["price"]) == \
        ("GAMMA", "42", "2.0")
    # doc 2 is one header-looking line -> zero data rows (CSV never
    # fails to parse); parsed-N ids follow (doc_id, rec_idx) output order
    assert (2, 0) not in rows
    assert [rows[k]["object_id"]
            for k in sorted(rows)] == ["parsed-1", "parsed-2", "parsed-3"]


def test_parse_resilience_and_bad_format(spark):
    docs = spark.createDataFrame(
        [(0, '{"a": 1}'), (1, "not json {{")],
        "doc_id long, text string")
    got = parse_structured_records(
        docs, {"format": {"type": "json"}}).collect()
    assert len(got) == 1 and got[0]["record"] == {"a": "1"}
    with pytest.raises(ValueError, match="Unsupported format"):
        parse_structured_records(docs, {"format": {"type": "yaml"}})


def test_reference_replay_matrix_against_spark(spark):
    """Full-pipeline fuzz: random-ish CSV built from a grid, Spark output
    must equal the Python replay field-for-field."""
    lines = ["v,w"]
    for i, v in enumerate(_FUZZ_VALUES):
        lines.append(f'"{v}",{i}'.replace("\n", " ").replace("\t", " "))
    raw = "\n".join(lines) + "\n"
    desc = {
        "format": {"type": "csv"},
        "mappings": [
            {"source_field": "v", "target_field": "a",
             "transforms": [{"type": "trim"}, {"type": "title_case"}]},
            {"source_field": "v", "target_field": "b",
             "transforms": [{"type": "to_float"}]},
            {"source_field": "w", "target_field": "c",
             "transforms": [{"type": "to_int"}]},
        ],
        "output": {"schema_name": "s"},
    }
    expected = _reference_apply(parse_csv_py(raw, {}), desc["mappings"])
    docs = spark.createDataFrame([(0, raw)], "doc_id long, text string")
    got = load_structured(docs, desc).orderBy("rec_idx").collect()
    assert len(got) == len(expected)
    for row, exp in zip(got, expected):
        for k in ("a", "b", "c"):
            assert row[k] == exp.get(k), (row["rec_idx"], k, row[k], exp)
