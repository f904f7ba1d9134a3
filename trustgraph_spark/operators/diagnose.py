"""Structured-data diagnosis (retrieval/structured_diag): detect whether a
data sample is CSV / JSON / XML and sniff CSV dialect options, as batch
operators over a corpus of samples.

Reference behavior reproduced (not code):
- type_detector.py detect_data_type:17-40 — the shipped fast-path
  heuristic: '<?xml' prefix or '<'+'</' -> xml 0.9; '{' or '[' prefix ->
  json 0.9; else csv 0.8; empty -> (None, 0.0).
- type_detector.py detect_csv_options:143-196 — delimiter sniffing over
  {',', ';', tab, '|'} scored by column-count consistency
  (_check_csv_with_delimiter:108-141), and the header heuristic (first
  row is a header when the second row is more numeric and the first is
  < 70% numeric).

The LLM side of the reference service (descriptor generation via
diagnose-csv / diagnose-json / diagnose-xml prompts and schema selection)
is a prompt boundary — callers plug it behind the detected type exactly
as the extraction seam does.

Spark mapping: detect_data_type is pure column logic (one narrow pass,
codegen'd, SQL-oracleable).  CSV option sniffing needs real csv-dialect
parsing (quoting rules), so it runs as a vectorized pandas UDF — an
ingest-time diagnosis step, not a hot-path operator."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def detect_types(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-sample data-type detection (type_detector.detect_data_type):
    (id, detected_type string|null, confidence double)."""
    t = F.trim(F.col(text_col))
    dtype = (
        F.when(t == "", F.lit(None).cast("string"))
        .when(
            t.startswith("<?xml") | (t.startswith("<") & t.contains("</")),
            F.lit("xml"),
        )
        .when(t.startswith("{") | t.startswith("["), F.lit("json"))
        .otherwise(F.lit("csv"))
    )
    conf = (
        F.when(t == "", F.lit(0.0))
        .when(
            t.startswith("<?xml") | (t.startswith("<") & t.contains("</")),
            F.lit(0.9),
        )
        .when(t.startswith("{") | t.startswith("["), F.lit(0.9))
        .otherwise(F.lit(0.8))
    )
    return documents.select(
        F.col(id_col),
        dtype.alias("detected_type"),
        conf.alias("confidence"),
    )


def _csv_score(sample: str, delimiter: str) -> float:
    """Column-consistency score for one delimiter
    (_check_csv_with_delimiter)."""
    import csv
    from io import StringIO

    try:
        rows = list(csv.reader(StringIO(sample), delimiter=delimiter))
        if len(rows) < 2:
            return 0.0
        ncols = len(rows[0])
        if ncols < 2:
            return 0.0
        consistent = sum(1 for r in rows[1:] if len(r) == ncols)
        ratio = consistent / (len(rows) - 1)
        if ratio > 0.8:
            return min(0.7 + min(ncols * 0.05, 0.2) + min(len(rows) * 0.01, 0.1), 0.95)
        if ratio > 0.6:
            return 0.5
        return 0.2
    except Exception:
        return 0.0


def _csv_options_py(sample: str) -> tuple[str, bool]:
    """(delimiter, has_header) per detect_csv_options:143-196."""
    import csv
    from io import StringIO

    delimiter, has_header = ",", True
    lines = (sample or "").strip().split("\n")
    if len(lines) < 2:
        return delimiter, has_header
    best = 0.0
    for d in (",", ";", "\t", "|"):
        sc = _csv_score(sample, d)
        if sc > best:
            best, delimiter = sc, d

    def _numeric(v: str) -> bool:
        try:
            float(v.strip())
            return True
        except (ValueError, AttributeError):
            return False

    rows = list(csv.reader(StringIO(sample), delimiter=delimiter))
    if len(rows) >= 2:
        first, second = rows[0], rows[1]
        fn = sum(1 for c in first if _numeric(c))
        sn = sum(1 for c in second if _numeric(c))
        has_header = sn > fn and fn < len(first) * 0.7
    return delimiter, has_header


def detect_csv_options(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """CSV dialect sniffing per sample: (id, delimiter, has_header).
    Vectorized pandas UDF (real csv-dialect parsing incl. quoting —
    ingest-time diagnosis, not a hot-path operator)."""
    import pandas as pd
    from pyspark.sql import types as T

    @F.pandas_udf(
        T.StructType(
            [
                T.StructField("delimiter", T.StringType()),
                T.StructField("has_header", T.BooleanType()),
            ]
        )
    )
    def sniff(texts):  # pd.Series -> pd.DataFrame (struct rows); bare
        # signature: postponed annotations break eval-type inference here
        out = [_csv_options_py(t) for t in texts.fillna("")]
        return pd.DataFrame(out, columns=["delimiter", "has_header"])

    return documents.select(
        F.col(id_col), sniff(F.col(text_col)).alias("o")
    ).select(id_col, "o.delimiter", "o.has_header")


def diagnose(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The combined 'diagnose' operation (service.py): type detection for
    every sample, CSV options attached where the detected type is csv
    (null otherwise).  Descriptor generation is the LLM boundary."""
    types = detect_types(documents, id_col, text_col)
    # run the Python sniffing seam ONLY over csv-typed samples (the join
    # below left-nulls the rest) — on a mostly-json/xml corpus this keeps
    # the pandas UDF off most of the data
    csv_rows = documents.join(
        types.where(F.col("detected_type") == "csv").select(id_col),
        id_col,
        "left_semi",
    )
    opts = detect_csv_options(csv_rows, id_col, text_col)
    return (
        types.join(opts, id_col, "left")
        .select(
            id_col,
            "detected_type",
            "confidence",
            F.when(F.col("detected_type") == "csv", F.col("delimiter")).alias(
                "delimiter"
            ),
            F.when(F.col("detected_type") == "csv", F.col("has_header")).alias(
                "has_header"
            ),
        )
    )
