"""Document-library schema.org triple emitter tests (reference:
trustgraph-base/trustgraph/knowledge/ document/publication/organization
emitters + identifier.py hashing)."""

import hashlib
import uuid

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.library import (
    DIGITAL_DOCUMENT,
    IS_A,
    LABEL,
    ORGANIZATION,
    PUBLICATION_EVENT,
    document_metadata_triples,
    knowledge_hash_col,
    knowledge_uri_col,
)

META_DDL = (
    "doc_uri string, name string, description string, identifier string, "
    "copyright_notice string, copyright_holder string, copyright_year string, "
    "license string, url string, keywords array<string>, pub_uri string, "
    "pub_name string, pub_description string, pub_start string, "
    "pub_end string, org_uri string, org_name string, org_description string"
)


def _row(**kw):
    base = dict(doc_uri="urn:d1", name=None, description=None,
                identifier=None, copyright_notice=None,
                copyright_holder=None, copyright_year=None, license=None,
                url=None, keywords=None, pub_uri=None, pub_name=None,
                pub_description=None, pub_start=None, pub_end=None,
                org_uri=None, org_name=None, org_description=None)
    base.update(kw)
    return base


def _triples(spark, **kw):
    df = spark.createDataFrame([_row(**kw)], META_DDL)
    return {(r.s, r.p, r.o, r.otype)
            for r in document_metadata_triples(df).collect()}


def test_identifier_hash_matches_reference_formula(spark):
    # str(uuid.UUID(sha256(x).hexdigest()[::2])) (identifier.py:4-18)
    got = spark.range(1).select(
        knowledge_uri_col("doc", knowledge_hash_col(F.lit("document-7")))
        .alias("u")).collect()[0]["u"]
    expected = str(uuid.UUID(
        hashlib.sha256(b"document-7").hexdigest()[::2]))
    assert got == f"https://trustgraph.ai/doc/{expected}"


def test_minimal_document_emits_type_only(spark):
    assert _triples(spark) == {("urn:d1", IS_A, DIGITAL_DOCUMENT, "u")}


def test_name_emits_label_and_name(spark):
    out = _triples(spark, name="Doc One")
    assert ("urn:d1", LABEL, "Doc One", "l") in out
    assert ("urn:d1", "https://schema.org/name", "Doc One", "l") in out
    assert len(out) == 3


def test_identifier_subject_is_document_uri(spark):
    # reference bug (document.py:60-64 uses the shadowed BUILTIN id as
    # the subject) is deliberately fixed: subject must be the doc URI
    out = _triples(spark, identifier="ident-1")
    assert ("urn:d1", "https://schema.org/identifier", "ident-1", "l") in out


def test_all_scalar_fields_gate_on_presence(spark):
    out = _triples(
        spark, description="d", copyright_notice="n", copyright_holder="h",
        copyright_year="1999", license="MIT", url="https://x.example/1")
    preds = {p for (_, p, _, _) in out}
    assert preds == {
        IS_A, "https://schema.org/description",
        "https://schema.org/copyrightNotice",
        "https://schema.org/copyrightHolder",
        "https://schema.org/copyrightYear", "https://schema.org/license",
        "https://schema.org/url",
    }
    # url is a URI object (document.py:124-130)
    assert ("urn:d1", "https://schema.org/url", "https://x.example/1",
            "u") in out


def test_keywords_emit_one_triple_each(spark):
    out = _triples(spark, keywords=["a", "b"])
    kws = {(o) for (_, p, o, _) in out if p == "https://schema.org/keywords"}
    assert kws == {"a", "b"}


def test_publication_and_organization_chain(spark):
    out = _triples(
        spark, pub_uri="urn:p1", pub_name="P", pub_start="1990",
        pub_end="1999", org_uri="urn:o1", org_name="O",
        org_description="od")
    assert ("urn:d1", "https://schema.org/publication", "urn:p1", "u") in out
    assert ("urn:p1", IS_A, PUBLICATION_EVENT, "u") in out
    assert ("urn:p1", LABEL, "P", "l") in out
    assert ("urn:p1", "https://schema.org/publishedBy", "urn:o1", "u") in out
    assert ("urn:p1", "https://schema.org/startDate", "1990", "l") in out
    assert ("urn:p1", "https://schema.org/endDate", "1999", "l") in out
    assert ("urn:o1", IS_A, ORGANIZATION, "u") in out
    assert ("urn:o1", LABEL, "O", "l") in out
    assert ("urn:o1", "https://schema.org/description", "od", "l") in out


def test_organization_without_publication_not_emitted(spark):
    # the reference only reaches the organization through the publication
    # chain (document.emit -> publication.emit -> organization.emit)
    out = _triples(spark, org_uri="urn:o1", org_name="O")
    assert out == {("urn:d1", IS_A, DIGITAL_DOCUMENT, "u")}


def test_plan_is_narrow_no_udf(spark):
    df = spark.createDataFrame([_row()], META_DDL)
    plan = document_metadata_triples(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
