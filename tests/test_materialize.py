"""Graph materialization invariants (M1/M2, SURVEY.md §2.6) + pattern
queries (Q1) + provenance generation (E11)."""

import json

from pyspark.sql import functions as F

from trustgraph_spark.constants import (
    DEFAULT_GRAPH,
    GRAPH_SOURCE,
    RDF_LABEL,
    TG_CONTAINS,
)
from trustgraph_spark.operators.materialize import (
    materialize_edges,
    materialize_nodes,
    materialize_quads_by_entity,
    write_amplification_check,
)
from trustgraph_spark.operators.provenance import subgraph_provenance_triples
from trustgraph_spark.operators.triples_query import match_triples, quads_for_entity

TRIPLES_DDL = (
    "collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string, chunk_id string, root_id string"
)


def sample_triples(spark):
    rows = [
        ("default", "", "http://e/a", "http://e/rel", "http://e/b", "u", "", "", "c1", "r1"),
        ("default", "", "http://e/a", RDF_LABEL, "Entity A", "l", "", "", "c1", "r1"),
        ("default", "", "http://e/a", RDF_LABEL, "Entity A", "l", "", "", "c2", "r1"),  # dup
        ("default", "urn:g:x", "http://e/b", RDF_LABEL, "Entity B", "l", "", "", "c2", "r1"),
    ]
    return spark.createDataFrame(rows, TRIPLES_DDL)


def test_edges_dedup(spark):
    """Cassandra PK-upsert semantics: identical quads collapse
    (cassandra_kg.py:620,637)."""
    edges = materialize_edges(sample_triples(spark))
    assert edges.count() == 3


def test_write_amplification(spark):
    """4 rows/default-graph quad, 5 with named graph (cassandra_kg.py:744-802);
    literal objects still get an O row (:786-789)."""
    edges = materialize_edges(sample_triples(spark))
    quads = materialize_quads_by_entity(edges)
    chk = write_amplification_check(edges, quads)
    assert chk["ok"], chk
    # literal object 'Entity A' appears as an O-role entity
    assert quads.where(
        (F.col("entity") == "Entity A") & (F.col("role") == "O")
    ).count() == 1
    # named graph contributes a G row
    assert quads.where(F.col("role") == "G").count() == 1


def test_nodes(spark):
    edges = materialize_edges(sample_triples(spark))
    nodes = {r.entity: r for r in materialize_nodes(edges).collect()}
    assert nodes["http://e/a"].label == "Entity A"
    assert nodes["http://e/a"].degree == 2  # rel + deduped label row (s side)
    assert nodes["http://e/b"].degree == 2  # o of rel + s of label


def test_match_triples_patterns(spark):
    edges = materialize_edges(sample_triples(spark))
    assert match_triples(edges, s="http://e/a").count() == 2
    assert match_triples(edges, s="http://e/a", p=RDF_LABEL).count() == 1
    assert match_triples(edges, o="http://e/b").count() == 1
    assert match_triples(edges, g="").count() == 2  # default graph only
    assert match_triples(edges, g="urn:g:x").count() == 1
    assert match_triples(edges).count() == 3  # g=None -> all graphs
    assert match_triples(edges, s="http://e/a", limit=1).count() == 1


def test_quads_for_entity(spark):
    edges = materialize_edges(sample_triples(spark))
    quads = materialize_quads_by_entity(edges)
    hits = quads_for_entity(quads, "http://e/b")
    # b appears as O of rel and S of its label
    assert {(r.role) for r in hits.collect()} == {"O", "S"}


def test_provenance_triples(spark):
    content = sample_triples(spark).where(F.col("g") == "")
    prov = subgraph_provenance_triples(content, "kg-extract-definitions")
    rows = prov.collect()
    assert all(r.g == GRAPH_SOURCE for r in rows)
    contains = [r for r in rows if r.p == TG_CONTAINS]
    assert len(contains) == 3  # one RDF-star row per content triple
    assert all(r.otype == "t" for r in contains)
    # RDF-star JSON round-trips with reference key order
    doc = json.loads(contains[0].o)
    assert list(doc.keys()) == ["s", "p", "o"]
    assert list(doc["s"].keys()) == ["type", "iri"]
    # deterministic: same input -> same subgraph URIs
    prov2 = subgraph_provenance_triples(content, "kg-extract-definitions")
    assert prov.exceptAll(prov2).count() == 0
    # distinct chunks get distinct subgraph URIs
    sgs = {r.s for r in rows if r.p == TG_CONTAINS}
    assert len(sgs) == 2  # c1 and c2


def test_provenance_envelope(spark):
    from trustgraph_spark.constants import (
        PROV_ENTITY,
        PROV_WAS_DERIVED_FROM,
        RDF_TYPE,
        TG_SUBGRAPH_TYPE,
    )

    content = sample_triples(spark).where(F.col("chunk_id") == "c1")
    prov = subgraph_provenance_triples(content, "kg-extract-definitions")
    by_p = {}
    for r in prov.collect():
        by_p.setdefault(r.p, []).append(r)
    assert {r.o for r in by_p[RDF_TYPE]} >= {PROV_ENTITY, TG_SUBGRAPH_TYPE}
    # subgraph derived from the chunk URI
    derived = [r for r in by_p[PROV_WAS_DERIVED_FROM]]
    assert derived[0].o == "c1"


def test_reconstruct_term(spark):
    """Q3: otype drives the tag; null-otype http(s) strings fall back to
    IRI (reference service.py:73-151 heuristics)."""
    from pyspark.sql import functions as F

    from trustgraph_spark.operators.triples_query import reconstruct_term

    df = spark.createDataFrame(
        [
            ("http://e/x", "u", "", ""),
            ("plain text", "l", "", "en"),
            ('{"s": {}}', "t", "", ""),
            ("http://bare", None, None, None),
            ("not a uri", None, None, None),
        ],
        "value string, otype string, dtype string, lang string",
    )
    out = df.select(
        reconstruct_term(
            F.col("value"), F.col("otype"), F.col("dtype"), F.col("lang")
        ).alias("t")
    ).collect()
    types = [r.t.type for r in out]
    assert types == ["i", "l", "t", "i", "l"]
    assert out[1].t.language == "en"
