"""PII profiling and redaction — the scrub pass a training-data
pipeline runs before text leaves the curation boundary (the rule
family published with public corpus tooling: regex detectors for
emails / IPs / SSNs / phone numbers plus a Luhn checksum gate for
credit-card-shaped digit runs).

The reference engine has no PII stage (its ingest trusts its loaders);
this module is part of the brief's LLM-data-pipeline family, like
operators/quality.py and operators/textstats.py.

Everything is UDF-free:

* :func:`pii_profile` — per-document match counts per category, plus
  a Luhn-validated credit-card count.  Counts come from
  ``regexp_count``; the Luhn check is a native fold
  (``aggregate(sequence(1, n), ...)`` over digit positions), so the
  whole profile is ONE narrow codegen'd projection — scan speed at
  100 TB, no shuffle.
* :func:`pii_redact` — category placeholders substituted with one
  chained ``regexp_replace`` pass.  Order is pinned (email before
  phone before ipv4 before ssn before cc) because the patterns can
  overlap on digit runs; the oracle mirrors the same chain.

Pattern syntax stays inside the Java-regex ∩ RE2 common subset
(character classes, bounded repeats, non-capturing groups, ``\\b``)
so the DuckDB oracle runs the literally identical strings — no
lookarounds, no backreferences.

The credit-card rule is detection = shape regex, validity = Luhn.
Redaction masks every cc-SHAPED run (a scrubber must not leak digit
runs that merely fail the checksum); the profile reports shaped vs
Luhn-valid separately so a pipeline can route on either.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Detection patterns — identical strings run on both Spark (Java regex)
# and DuckDB (RE2); see module docstring for the syntax subset rule.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\(?\d{3}\)?[-. ]\d{3}[-. ]\d{4}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}

# 13-16 digits with optional single space/dash separators, delimited.
CC_PATTERN = r"\b\d(?:[ -]?\d){12,15}\b"

# Redaction order is semantic: phone/ssn/cc all match digit runs, and
# ipv4 octets would otherwise be eaten by an earlier cc rewrite.
REDACT_ORDER = ("email", "phone", "ipv4", "ssn")

PLACEHOLDERS = {
    "email": "<EMAIL>",
    "phone": "<PHONE>",
    "ipv4": "<IP>",
    "ssn": "<SSN>",
    "cc": "<CARD>",
}


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum over a credit-card-shaped string (separators
    allowed) as a native fold: double every second digit from the
    right, subtract 9 when it overflows, sum mod 10 == 0."""
    clean = F.regexp_replace(candidate, "[ -]", "")
    n = F.length(clean)
    total = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0),
        lambda acc, i: acc + F.when(
            i % 2 == 0,
            # i-th digit from the right, doubled
            F.when(
                F.substring(clean, (n - i + 1).cast("int"), 1).cast("int")
                * 2 > 9,
                F.substring(clean, (n - i + 1).cast("int"), 1).cast("int")
                * 2 - 9,
            ).otherwise(
                F.substring(clean, (n - i + 1).cast("int"), 1).cast("int")
                * 2),
        ).otherwise(
            F.substring(clean, (n - i + 1).cast("int"), 1).cast("int")),
    )
    return (total % 10 == 0) & (n >= 13)


def pii_profile(documents: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Per-document PII match counts (one column per category) plus
    credit-card shaped/valid counts.  One narrow projection."""
    t = F.col(text_col)
    cols = [F.col(id_col)]
    for cat, pat in PII_PATTERNS.items():
        cols.append(F.regexp_count(t, F.lit(pat)).alias(f"n_{cat}"))
    cands = F.regexp_extract_all(t, F.lit(CC_PATTERN), 0)
    cols.append(F.size(cands).alias("n_cc_shaped"))
    cols.append(
        F.size(F.filter(cands, luhn_valid)).alias("n_cc_valid"))
    out = documents.select(*cols)
    flags = [F.col(f"n_{c}") for c in PII_PATTERNS] + [F.col("n_cc_shaped")]
    total = flags[0]
    for c in flags[1:]:
        total = total + c
    return out.withColumn("has_pii", total > 0)


def redact_col(t: Column) -> Column:
    """The chained-replace redaction as a single column expression
    (order pinned in REDACT_ORDER, credit-card shapes last) — reused
    by the batch operator and the streaming hygiene path."""
    red = t
    for cat in REDACT_ORDER:
        red = F.regexp_replace(red, PII_PATTERNS[cat], PLACEHOLDERS[cat])
    return F.regexp_replace(red, CC_PATTERN, PLACEHOLDERS["cc"])


def pii_redact(documents: DataFrame, id_col: str = "doc_id",
               text_col: str = "text") -> DataFrame:
    """Text with every PII match replaced by its category placeholder,
    as one chained regexp_replace pass."""
    red = redact_col(F.col(text_col))
    return documents.select(
        F.col(id_col),
        red.alias("redacted"),
        (F.length(F.col(text_col)) - F.length(red)).alias("chars_delta"),
    )
