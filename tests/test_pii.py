"""PII profiling / redaction (operators/pii.py) vs a Python re + Luhn
replay of the identical patterns."""

import re

import pytest

from trustgraph_spark.operators import pii as P


DOCS = [
    (0, "reach me at alice.smith+work@example.co.uk or bob@sub.domain.org"),
    (1, "call (555) 867-5309 or 555.123.4567 tomorrow"),
    (2, "server at 10.0.255.1 and 192.168.1.100 went down"),
    (3, "ssn is 078-05-1120 do not share"),
    (4, "card 4111 1111 1111 1111 expires soon"),          # Luhn valid
    (5, "card 4111111111111112 is mistyped"),              # shaped, invalid
    (6, "amex 378282246310005 and visa 4539148803436467"), # both valid
    (7, "just a plain sentence with no identifiers at all"),
    (8, "mixed: c@d.io, 203.0.113.7, 000-12-3456, card 5500-0000-0000-0004"),
    (9, "digits 1234 5678 9012 3456 that fail the checksum"),
    (10, ""),
]


def py_luhn(s):
    d = [int(c) for c in re.sub(r"[ -]", "", s)]
    total = 0
    for i, x in enumerate(reversed(d), start=1):
        if i % 2 == 0:
            x *= 2
            if x > 9:
                x -= 9
        total += x
    return total % 10 == 0 and len(d) >= 13


def py_profile(text):
    out = {f"n_{c}": len(re.findall(p, text))
           for c, p in P.PII_PATTERNS.items()}
    cands = [m.group(0) for m in re.finditer(P.CC_PATTERN, text)]
    out["n_cc_shaped"] = len(cands)
    out["n_cc_valid"] = sum(1 for c in cands if py_luhn(c))
    out["has_pii"] = (sum(out[f"n_{c}"] for c in P.PII_PATTERNS)
                      + out["n_cc_shaped"]) > 0
    return out


def py_redact(text):
    red = text
    for cat in P.REDACT_ORDER:
        red = re.sub(P.PII_PATTERNS[cat], P.PLACEHOLDERS[cat], red)
    red = re.sub(P.CC_PATTERN, P.PLACEHOLDERS["cc"], red)
    return red


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_luhn_test_vectors():
    # sanity-pin the planted card numbers used in the driver query
    assert py_luhn("4111 1111 1111 1111")
    assert py_luhn("5500-0000-0000-0004")
    assert py_luhn("4539148803436467")
    assert py_luhn("378282246310005")
    assert not py_luhn("4111111111111112")
    assert not py_luhn("1234 5678 9012 3456")


def test_pii_profile_matches_python_replay(spark, docs_df):
    rows = {r["doc_id"]: r.asDict()
            for r in P.pii_profile(docs_df).collect()}
    for doc_id, text in DOCS:
        exp = py_profile(text)
        for k, v in exp.items():
            assert rows[doc_id][k] == v, (doc_id, k, rows[doc_id][k], v)


def test_pii_profile_specifics(spark, docs_df):
    rows = {r["doc_id"]: r.asDict()
            for r in P.pii_profile(docs_df).collect()}
    assert rows[0]["n_email"] == 2
    assert rows[1]["n_phone"] == 2
    assert rows[2]["n_ipv4"] == 2
    assert rows[4]["n_cc_shaped"] == 1 and rows[4]["n_cc_valid"] == 1
    assert rows[5]["n_cc_shaped"] == 1 and rows[5]["n_cc_valid"] == 0
    assert rows[6]["n_cc_valid"] == 2
    assert rows[7]["has_pii"] is False
    assert rows[10]["has_pii"] is False


def test_pii_redact_matches_python_replay(spark, docs_df):
    rows = {r["doc_id"]: r.asDict()
            for r in P.pii_redact(docs_df).collect()}
    for doc_id, text in DOCS:
        exp = py_redact(text)
        assert rows[doc_id]["redacted"] == exp, (doc_id, rows[doc_id], exp)
        assert rows[doc_id]["chars_delta"] == len(text) - len(exp)
    # nothing digit-shaped survives in the scrubbed docs
    assert "4111" not in rows[4]["redacted"]
    assert "<CARD>" in rows[5]["redacted"]  # invalid Luhn still masked
    assert rows[7]["redacted"] == DOCS[7][1]  # untouched


def test_pii_plan_stays_native(docs_df):
    for df in (P.pii_profile(docs_df), P.pii_redact(docs_df)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Python" not in plan
