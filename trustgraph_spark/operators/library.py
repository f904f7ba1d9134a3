"""Document-library metadata model: schema.org triples for documents,
publication events, and organizations (reference:
trustgraph-base/trustgraph/knowledge/ — defs.py, identifier.py:4-23,
document.py:12-130, publication.py:14-79, organization.py:14-50).

This is the librarian's knowledge-graph face — what a TrustGraph user
sees when a registered document's provenance metadata lands in the
graph. Spark-first: one flat metadata frame (nullable publication /
organization columns) emits the whole entity family as conditional
inline arrays + one explode — no UDF, no shuffle; identifier minting
(sha256 -> interleaved-half UUID) is pure column expressions.

Deviation from the reference, deliberate: document.py:60-64 emits the
identifier triple with subject ``Value(value=id, ...)`` — the shadowed
PYTHON BUILTIN ``id``, not ``self.id`` — which would serialize the
repr of a builtin function as the subject URI. Fixed here (subject is
the document URI); flagged since the reference emit is unusable as-is.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# vocabulary (knowledge/defs.py:1-23)
IS_A = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
DIGITAL_DOCUMENT = "https://schema.org/DigitalDocument"
PUBLICATION_EVENT = "https://schema.org/PublicationEvent"
ORGANIZATION = "https://schema.org/Organization"
NAME = "https://schema.org/name"
DESCRIPTION = "https://schema.org/description"
COPYRIGHT_NOTICE = "https://schema.org/copyrightNotice"
COPYRIGHT_HOLDER = "https://schema.org/copyrightHolder"
COPYRIGHT_YEAR = "https://schema.org/copyrightYear"
LICENSE = "https://schema.org/license"
PUBLICATION = "https://schema.org/publication"
START_DATE = "https://schema.org/startDate"
END_DATE = "https://schema.org/endDate"
PUBLISHED_BY = "https://schema.org/publishedBy"
URL = "https://schema.org/url"
IDENTIFIER = "https://schema.org/identifier"
KEYWORD = "https://schema.org/keywords"

PREF_PUBEV = "pubev"
PREF_ORG = "org"
PREF_DOC = "doc"


def knowledge_hash_col(col) -> F.Column:
    """identifier.hash as columns (identifier.py:4-18): sha256 hexdigest,
    every second hex char (64 -> 32), formatted as a canonical UUID
    string. Matches ``str(uuid.UUID(hexdigest[::2]))`` byte for byte."""
    x = F.regexp_replace(F.sha2(col, 256), "(.)(.)", "$1")
    return F.concat_ws(
        "-",
        F.substring(x, 1, 8), F.substring(x, 9, 4), F.substring(x, 13, 4),
        F.substring(x, 17, 4), F.substring(x, 21, 12),
    )


def knowledge_uri_col(pref: str, id_col) -> F.Column:
    """to_uri (identifier.py:20-21): https://trustgraph.ai/{pref}/{id}."""
    return F.concat(F.lit(f"https://trustgraph.ai/{pref}/"), id_col)


_EMPTY = "array<struct<s:string,p:string,o:string,otype:string>>"


def _t(s, p, o, otype="l"):
    return F.struct(
        s.alias("s"), F.lit(p).alias("p"),
        (o if not isinstance(o, str) else F.lit(o)).alias("o"),
        F.lit(otype).alias("otype"),
    )


def _opt(cond, *triples):
    return F.when(cond, F.array(*triples)).otherwise(F.array().cast(_EMPTY))


def document_metadata_triples(meta: DataFrame) -> DataFrame:
    """Flat metadata frame -> the DigitalDocument / PublicationEvent /
    Organization triple family, field-presence-gated exactly as the
    reference emitters are (document.py:31-130, publication.py:32-79,
    organization.py:24-50: rdf:type always; name emits BOTH rdfs:label
    and schema:name; url and entity links are URI objects, the rest
    literals; nested publication/organization emit only when linked).

    Expected columns (nullable unless noted): doc_uri (non-null), name,
    description, identifier, copyright_notice, copyright_holder,
    copyright_year, license, url, keywords array<string>, pub_uri,
    pub_name, pub_description, pub_start, pub_end, org_uri, org_name,
    org_description."""
    d = F.col("doc_uri")
    p = F.col("pub_uri")
    g = F.col("org_uri")

    def present(c):
        return F.col(c).isNotNull() & (F.col(c) != "")

    doc = F.concat(
        F.array(_t(d, IS_A, F.lit(DIGITAL_DOCUMENT), "u")),
        _opt(present("name"),
             _t(d, LABEL, F.col("name")), _t(d, NAME, F.col("name"))),
        # reference bug fixed: subject is the DOCUMENT uri, not builtin id
        _opt(present("identifier"), _t(d, IDENTIFIER, F.col("identifier"))),
        _opt(present("description"), _t(d, DESCRIPTION, F.col("description"))),
        _opt(present("copyright_notice"),
             _t(d, COPYRIGHT_NOTICE, F.col("copyright_notice"))),
        _opt(present("copyright_holder"),
             _t(d, COPYRIGHT_HOLDER, F.col("copyright_holder"))),
        _opt(present("copyright_year"),
             _t(d, COPYRIGHT_YEAR, F.col("copyright_year"))),
        _opt(present("license"), _t(d, LICENSE, F.col("license"))),
        F.transform(
            F.coalesce(F.col("keywords"), F.array().cast("array<string>")),
            lambda k: _t(d, KEYWORD, k),
        ),
        _opt(p.isNotNull(), _t(d, PUBLICATION, p, "u")),
        _opt(present("url"), _t(d, URL, F.col("url"), "u")),
    )
    pub = F.concat(
        _opt(p.isNotNull(), _t(p, IS_A, F.lit(PUBLICATION_EVENT), "u")),
        _opt(p.isNotNull() & present("pub_name"),
             _t(p, LABEL, F.col("pub_name")), _t(p, NAME, F.col("pub_name"))),
        _opt(p.isNotNull() & present("pub_description"),
             _t(p, DESCRIPTION, F.col("pub_description"))),
        _opt(p.isNotNull() & g.isNotNull(), _t(p, PUBLISHED_BY, g, "u")),
        _opt(p.isNotNull() & present("pub_start"),
             _t(p, START_DATE, F.col("pub_start"))),
        _opt(p.isNotNull() & present("pub_end"),
             _t(p, END_DATE, F.col("pub_end"))),
    )
    org = F.concat(
        _opt(p.isNotNull() & g.isNotNull(),
             _t(g, IS_A, F.lit(ORGANIZATION), "u")),
        _opt(p.isNotNull() & g.isNotNull() & present("org_name"),
             _t(g, LABEL, F.col("org_name")), _t(g, NAME, F.col("org_name"))),
        _opt(p.isNotNull() & g.isNotNull() & present("org_description"),
             _t(g, DESCRIPTION, F.col("org_description"))),
    )
    return meta.select(
        F.explode(F.concat(doc, pub, org)).alias("tr")
    ).select("tr.s", "tr.p", "tr.o", "tr.otype")
