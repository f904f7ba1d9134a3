"""Descriptor-driven structured-data ingest — the deterministic pipeline
core of trustgraph-cli/trustgraph/cli/load_structured_data.py:312-573
(_load_descriptor -> _parse_data_by_format -> _apply_transformations ->
_format_extracted_objects).  The descriptor is the reference's JSON
contract: ``{"format": {"type": csv|json|xml, "options": {...}},
"mappings": [{"source_field", "target_field", "transforms": [{"type":
trim|upper|lower|title_case|to_int|to_float}]}], "output":
{"schema_name", "options": {"confidence"}}}`` (auto-generation of the
descriptor itself is the LLM boundary, _auto_generate_descriptor).

Spark-first split:

- **Parsing** (CSV via ``csv.DictReader`` incl. quoted fields, JSON with
  the ``$.key`` root-path extraction, XML via ElementTree with the
  reference's record-path conversions and ``field_attribute`` mode) is a
  per-document ``mapInPandas`` seam — the sanctioned ingest-time class
  (same as the CSV-sniffing seam in diagnose.py; a document body is an
  opaque blob only a real parser can split).  One document = one
  independent parse, so a 100 TB corpus parses embarrassingly parallel
  with no shuffle.
- **Transforms and object shaping** compile to native column
  expressions: each mapping becomes one projected column; trim /
  upper / lower / title_case / to_int / to_float are whole-stage-codegen
  column chains (title_case replays Python ``str.title`` with a
  split + transform-with-index + array_join — uppercase after any
  non-letter), so the hot path over parsed records never re-enters
  Python.

Behavior parity notes (replayed in test_ingest against a Python
transcription of the reference):

- The no-header CSV path only engages when BOTH ``has_header`` and
  ``header`` are false (``has_header or header-default-True``,
  load_structured_data.py:355), and it re-reads the WHOLE file with
  generated ``field_N`` names so the first row comes back as data
  (:360-365) — both reference quirks kept.
- A present-but-empty value survives to ``""``; a missing source field
  omits the target (here: NULL column value, vs "" for present-empty) —
  load_structured_data.py:497-527.
- ``to_int``/``to_float`` keep the ORIGINAL value on conversion failure
  (:506-517); ``""`` converts to None and lands as ``""``.
- Scope divergences, documented: JSON/XML non-string scalars are
  stringified at parse (the reference carries raw types until the final
  ``str()``, visible only when e.g. a raw float feeds ``to_int``);
  Python ``int("1_0")`` underscore grouping and >18-digit ints are not
  converted natively (ANSI-safe guard keeps the original string); the
  whitespace class and letter class are ASCII in the native chain.
"""

from __future__ import annotations

import csv
import io
import json
import xml.etree.ElementTree as ET
from typing import Iterator

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RECORDS_SCHEMA = "doc_id long, rec_idx long, record map<string,string>"


# ---------------------------------------------------------------------------
# Parse seam (load_structured_data.py:340-481)
# ---------------------------------------------------------------------------


def _stringify(v) -> str | None:
    if v is None:
        return None
    if isinstance(v, str):
        return v
    if isinstance(v, bool):
        return "True" if v else "False"
    return str(v)


def parse_csv_py(raw: str, options: dict) -> list[dict]:
    delimiter = options.get("delimiter", ",")
    has_header = options.get("has_header", True) or options.get("header", True)
    reader = csv.DictReader(io.StringIO(raw), delimiter=delimiter)
    if not has_header:
        first = next(reader, None)
        if first is None:
            return []
        names = [f"field_{i + 1}" for i in range(len(first))]
        # fresh stream: the first row comes back as data (reference
        # load_structured_data.py:360-365 behavior, kept)
        reader = csv.DictReader(
            io.StringIO(raw), fieldnames=names, delimiter=delimiter)
    out = []
    for row in reader:
        row.pop(None, None)  # restkey overflow: no named source can hit it
        out.append({k: v for k, v in row.items()})
    return out


def parse_json_py(raw: str, options: dict) -> list[dict]:
    data = json.loads(raw)
    if isinstance(data, dict):
        root_path = options.get("root_path")
        if root_path and root_path.startswith("$."):
            data = data.get(root_path[2:], data)
        if not isinstance(data, list):
            data = [data]
    return [
        {str(k): _stringify(v) for k, v in rec.items()}
        for rec in data if isinstance(rec, dict)
    ]


def parse_xml_py(raw: str, options: dict) -> list[dict]:
    record_path = options.get("record_path", "//record")
    field_attribute = options.get("field_attribute")
    if "root_element" in options or "record_element" in options:
        root_element = options.get("root_element")
        record_element = options.get("record_element", "record")
        record_path = (f"//{root_element}/{record_element}"
                       if root_element else f"//{record_element}")
    xpath = record_path
    if xpath.startswith("/ROOT/"):
        xpath = xpath[6:]
    elif xpath.startswith("/"):
        xpath = "." + xpath
    root = ET.fromstring(raw)
    out = []
    for element in root.findall(xpath):
        record: dict = {}
        if field_attribute:
            for child in element:
                if child.tag == "field" and field_attribute in child.attrib:
                    record[child.attrib[field_attribute]] = (
                        child.text.strip() if child.text else "")
        else:
            record.update(element.attrib)
            for child in element:
                record[child.tag] = child.text.strip() if child.text else ""
            if not record and element.text:
                record["value"] = element.text.strip()
        out.append({k: _stringify(v) for k, v in record.items()})
    return out


_PARSERS = {"csv": parse_csv_py, "json": parse_json_py, "xml": parse_xml_py}


def parse_structured_records(
    documents: DataFrame,
    descriptor: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """One document body -> (doc_id, rec_idx, record) rows via the
    format named by the descriptor.  Unparseable documents drop their
    records (the reference raises per file; per-document resilience is
    the corpus-scale analog of its per-record skip logging)."""
    fmt = descriptor.get("format", {})
    ftype = fmt.get("type", "csv").lower()
    if ftype not in _PARSERS:
        raise ValueError(f"Unsupported format type: {ftype}")
    options = fmt.get("options", {})
    parser = _PARSERS[ftype]

    def gen(it: Iterator) -> Iterator:
        import pandas as pd
        for pdf in it:
            rows = []
            for did, raw in zip(pdf[id_col], pdf[text_col]):
                try:
                    records = parser(raw or "", options)
                except Exception:
                    continue
                rows.extend(
                    {"doc_id": int(did), "rec_idx": i, "record": rec}
                    for i, rec in enumerate(records)
                )
            yield (pd.DataFrame(rows) if rows
                   else pd.DataFrame(columns=["doc_id", "rec_idx", "record"]))

    return documents.select(id_col, text_col).mapInPandas(gen, RECORDS_SCHEMA)


# ---------------------------------------------------------------------------
# Native transform compilation (load_structured_data.py:483-528)
# ---------------------------------------------------------------------------

_ASCII_LETTER = "^[A-Za-z]$"


def _t_trim(c):
    # Python str.strip(): both ends; ASCII whitespace class natively
    return F.when(c.isNull(), c).otherwise(
        F.regexp_replace(c, r"^\s+|\s+$", ""))


def _t_title(c):
    """Python str.title() for ASCII: a letter is uppercased when the
    previous character is not a letter, lowercased otherwise — as a
    split / transform-with-index / join chain (no UDF)."""
    chars = F.split(c, "")
    titled = F.transform(
        chars,
        lambda ch, i: F.when(i == F.lit(0), F.upper(ch))
        .when(~F.element_at(chars, i).rlike(_ASCII_LETTER), F.upper(ch))
        .otherwise(F.lower(ch)),
    )
    return F.when(c.isNull(), c).otherwise(F.array_join(titled, ""))


def _t_to_int(c):
    # int(value) if value != '' else None; original kept on failure;
    # <=18 digits keeps the long cast ANSI-safe (scope note above)
    digits = F.regexp_extract(c, r"^\s*[+-]?0*([0-9]+)\s*$", 1)
    ok = c.rlike(r"^\s*[+-]?[0-9]+\s*$") & (F.length(digits) <= 18)
    return F.when(c.isNull() | (c == ""), F.lit(None).cast("string")) \
        .when(ok, F.trim(c).cast("long").cast("string")) \
        .otherwise(c)


def _t_to_float(c):
    d = F.trim(c).try_cast("double")
    return F.when(c.isNull() | (c == ""), F.lit(None).cast("string")) \
        .when(d.isNotNull(), d.cast("string")) \
        .otherwise(c)


_TRANSFORMS = {
    "trim": _t_trim,
    "upper": lambda c: F.upper(c),
    "lower": lambda c: F.lower(c),
    "title_case": _t_title,
    "to_int": _t_to_int,
    "to_float": _t_to_float,
}


def _mapping_column(mapping: dict):
    source = mapping.get("source_field") or mapping.get("source")
    value = F.col("record").getItem(source)
    for transform in mapping.get("transforms", []):
        fn = _TRANSFORMS.get(transform.get("type"))
        if fn is not None:
            value = fn(value)
    present = F.map_contains_key(F.col("record"), F.lit(source))
    # present-but-None -> "" (the reference's final str(None-guard));
    # absent source -> NULL (the reference omits the key)
    return F.when(~present, F.lit(None).cast("string")) \
        .otherwise(F.coalesce(value, F.lit("")))


def apply_descriptor_mappings(records: DataFrame, descriptor: dict) -> DataFrame:
    """(doc_id, rec_idx, record) -> one native column per target field,
    transforms compiled into the projection (later duplicate targets
    overwrite earlier ones, the reference's dict-write order)."""
    cols: dict = {}
    for mapping in descriptor.get("mappings", []):
        target = mapping.get("target_field") or mapping.get("target")
        cols[target] = _mapping_column(mapping).alias(target)
    return records.select(
        "doc_id", "rec_idx", *[cols[t] for t in cols])


def format_extracted_objects(
    mapped: DataFrame, descriptor: dict, collection: str = "default"
) -> DataFrame:
    """ExtractedObject shaping (:531-552): ``parsed-N`` ids in output
    order, schema_name + confidence from the descriptor.  The global
    row_number is the reference's sequential-id contract — fine at the
    per-descriptor ingest scale it exists for; corpus-scale callers key
    on (doc_id, rec_idx) and skip this shaping."""
    out = descriptor.get("output", {})
    schema_name = out.get("schema_name", "default")
    confidence = float(out.get("options", {}).get("confidence", 0.9))
    w = Window.orderBy("doc_id", "rec_idx")
    value_cols = [c for c in mapped.columns if c not in ("doc_id", "rec_idx")]
    return mapped.select(
        F.concat(F.lit("parsed-"), F.row_number().over(w).cast("string"))
        .alias("object_id"),
        F.lit(schema_name).alias("schema_name"),
        F.lit(collection).alias("collection"),
        F.lit(confidence).alias("confidence"),
        "doc_id", "rec_idx", *value_cols,
    )


def load_structured(
    documents: DataFrame,
    descriptor: dict,
    collection: str = "default",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The full reference pipeline: parse -> map/transform -> shape
    (_process_data_pipeline:554-573, minus the transport send)."""
    records = parse_structured_records(documents, descriptor, id_col, text_col)
    mapped = apply_descriptor_mappings(records, descriptor)
    return format_extracted_objects(mapped, descriptor, collection)
