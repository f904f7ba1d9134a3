"""Planted-sentence corpus derivation for oracle-gating the extraction core.

The driver's correctness gate runs over the synthetic ``documents`` parquet
table, whose free text contains no extraction patterns. These helpers derive
— deterministically, in pure column expressions — planted chunk texts and
mention labels from each document row, so the correctness-critical E2/E3
path (RuleExtractor → definitions_to_triples / relationships_to_triples →
to_uri_udf percent-encoding), E11 provenance, and the linking/CC flow can be
verified against a DuckDB oracle that rebuilds the same planted text with
SQL and extracts from it with regexp_extract.

Reference semantics exercised (SURVEY.md §2.2):
- extract/kg/definitions/extract.py:113-259 (2 triples per definition)
- extract/kg/relationships/extract.py:96-237 (rel triple + s/p labels,
  o URI+label iff object-entity)
- to_uri percent-encoding incl. non-ASCII (definitions/extract.py:89-95)

Entity names deliberately include spaces (hyphenation), 'é'/'ï'
(UTF-8 percent-encoding %C3%A9 / %C3%AF) and '&' (%26) so the URI-minting
seam is driven through the gate, not just hypothesis tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .constants import DEFAULT_COLLECTION

# NOTE: no module-level Column objects — this module is imported by Python
# workers (planted_agent_jsonl is pickled by reference into mapInPandas) and
# F.col() needs a driver-side session. Build columns lazily per call.


def _did():
    return F.col("doc_id")


def _chunk_cols():
    return [
        F.concat(F.lit("urn:chunk:"), _did().cast("string")).alias("chunk_id"),
        _did().cast("string").alias("root_id"),
        F.lit(DEFAULT_COLLECTION).alias("collection"),
    ]


def planted_def_chunks(docs: DataFrame) -> DataFrame:
    """One chunk per document. doc_id % 11 == 0 rows carry no definition
    sentence (the zero-extraction case); % 7 rows plant a non-ASCII entity,
    % 13 rows a '&' entity, the rest plain two-token names."""
    n = (_did() % 97).cast("string")
    entity = (
        F.when(_did() % 7 == 0, F.concat(F.lit("café "), n))
        .when(_did() % 13 == 0, F.concat(F.lit("r&d "), n))
        .otherwise(F.concat(F.lit("term "), n))
    )
    definition = F.concat(
        F.lit("concept from "),
        F.col("source"),
        F.lit(" sized "),
        (F.col("n_chars") % 10).cast("string"),
    )
    text = F.when(_did() % 11 == 0, F.lit("no facts in this chunk")).otherwise(
        F.concat(entity, F.lit(" is defined as "), definition, F.lit("."))
    )
    return docs.select(*_chunk_cols(), text.alias("text"))


def planted_rel_chunks(docs: DataFrame) -> DataFrame:
    """One chunk per document: an entity-object relationship sentence
    (predicate rotates uses/contains/extends) plus a literal-object
    'produces value' sentence. doc_id % 11 == 0 rows carry neither."""
    s_ent = F.concat(F.lit("proc "), (_did() % 53).cast("string"))
    o_ent = F.when(
        _did() % 5 == 0, F.concat(F.lit("naïve "), (_did() % 31).cast("string"))
    ).otherwise(F.concat(F.lit("unit "), (_did() % 31).cast("string")))
    pred = (
        F.when(_did() % 3 == 0, F.lit("uses"))
        .when(_did() % 3 == 1, F.lit("contains"))
        .otherwise(F.lit("extends"))
    )
    value = (_did() % 29).cast("string")
    text = F.when(_did() % 11 == 0, F.lit("no facts in this chunk")).otherwise(
        F.concat(
            s_ent, F.lit(" "), pred, F.lit(" "), o_ent, F.lit(". "),
            s_ent, F.lit(" produces value "), value, F.lit("."),
        )
    )
    return docs.select(*_chunk_cols(), text.alias("text"))


def planted_topics(docs: DataFrame) -> DataFrame:
    """Topic extraction objects (E7 input shape): one {topic, definition}
    per document; % 11 rows carry a NULL topic and % 13 rows an empty
    definition so topics_to_triples' validity filter is exercised."""
    topic = F.when(_did() % 11 == 0, F.lit(None).cast("string")).otherwise(
        F.concat(F.lit("topic "), (_did() % 17).cast("string"))
    )
    definition = F.when(_did() % 13 == 0, F.lit("")).otherwise(
        F.concat(F.lit("about "), F.col("source"))
    )
    return docs.select(
        *_chunk_cols(), topic.alias("topic"), definition.alias("definition")
    )


def planted_agent_jsonl(text: str) -> str:
    """Deterministic stand-in for the kg-extract-agent LLM call (E4): chunk
    text -> fenced JSONL with a type discriminator, including an invalid
    line and an unknown-type object so the resilient parser + type dispatch
    (extract/kg/agent/extract.py:141-176) are exercised. Lives in the
    package (not a test module) because it is pickled into mapInPandas."""
    import json
    import re

    lines = ["```json", "this line is not json {", '{"type": "mystery"}']
    # [^.]+? groups: extraction never crosses a sentence boundary (the same
    # pattern the RuleExtractor and the DuckDB oracles use)
    m = re.match(r"([^.]+?) is defined as (.+?)\.", text or "")
    if m:
        lines.append(json.dumps(
            {"type": "definition", "entity": m.group(1).strip(),
             "definition": m.group(2).strip()}
        ))
    m = re.search(r"([^.]+?) (uses|contains|extends) ([^.]+?)\.", text or "")
    if m:
        # no object-entity key: the agent flow defaults it to True (:307)
        lines.append(json.dumps(
            {"type": "relationship", "subject": m.group(1).strip(),
             "predicate": m.group(2).strip(), "object": m.group(3).strip()}
        ))
    m = re.search(r"([^.]+?) produces value ([^.]+?)\.", text or "")
    if m:
        lines.append(json.dumps(
            {"type": "relationship", "subject": m.group(1).strip(),
             "predicate": "produces value", "object": m.group(2).strip(),
             "object-entity": False}
        ))
    lines.append("```")
    return "\n".join(lines)


def planted_row_objects(docs: DataFrame) -> DataFrame:
    """JSON objects for kg-extract-rows validation (E8): % 9 rows have an
    empty primary field, % 4 rows an out-of-enum value — both must come
    back _valid = false."""
    name = F.when(_did() % 9 == 0, F.lit("")).otherwise(
        F.concat(F.lit("item "), (_did() % 50).cast("string"))
    )
    city = F.when(_did() % 4 == 0, F.lit("x")).otherwise(
        F.when(_did() % 2 == 0, F.lit("a")).otherwise(F.lit("b"))
    )
    age = (_did() % 90).cast("string")
    return docs.select(
        "doc_id",
        F.to_json(
            F.struct(name.alias("name"), city.alias("city"), age.alias("age"))
        ).alias("obj_json"),
    )


def planted_near_dup_embeddings(embeddings: DataFrame) -> DataFrame:
    """Embedding corpus with planted near-duplicates: every % 5 vector gets
    a +0.01-per-coordinate perturbed copy at vec_id + 10000 (cosine vs the
    original >= 0.9967 on the unit-norm synth table; the max cosine among
    the original pairs is ~0.51, so threshold 0.95 isolates exactly the
    planted pairs)."""
    base = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    pert = embeddings.where(F.col("vec_id") % 5 == 0).select(
        (F.col("vec_id") + 10000).alias("vec_id"),
        F.transform(
            F.col("embedding").cast("array<double>"), lambda x: x + F.lit(0.01)
        ).alias("embedding"),
    )
    return base.unionByName(pert)


def planted_mention_triples(docs: DataFrame) -> DataFrame:
    """rdfs:label triples whose labels form near-duplicate clusters
    ('entity N' vs 'entity Ns'), for oracle-gating the linking flow:
    blocking → trigram-Jaccard → connected components → canonical minimum.
    ASCII labels so the oracle URI is prefix || hyphenated label."""
    from .constants import DEFAULT_GRAPH, OTYPE_LITERAL, RDF_LABEL, TRUSTGRAPH_ENTITIES

    base = F.concat(F.lit("entity "), (_did() % 40).cast("string"))
    label = F.when(_did() % 3 == 0, F.concat(base, F.lit("s"))).otherwise(base)
    uri = F.concat(F.lit(TRUSTGRAPH_ENTITIES), F.regexp_replace(label, " ", "-"))
    return docs.select(
        F.lit(DEFAULT_COLLECTION).alias("collection"),
        F.lit(DEFAULT_GRAPH).alias("g"),
        uri.alias("s"),
        F.lit(RDF_LABEL).alias("p"),
        label.alias("o"),
        F.lit(OTYPE_LITERAL).alias("otype"),
        F.lit("").alias("dtype"),
        F.lit("").alias("lang"),
    )


def planted_onto_responses(pdf):
    """Deterministic stand-in for the ontology-extraction LLM call: one raw
    response per chunk row, rotating the three reference response formats
    (simplified_parser.py:49-91) by doc number — JSONL list with
    discriminators (incl. junk items), legacy nested dict (incl. an
    unknown class and a domain-violating attribute), legacy with
    snake_case keys + an unknown relation + a boolean attribute value.
    doc % 11 rows return malformed JSON (the parse-returns-None path).
    Lives in the package because it is pickled into mapInPandas."""
    import json

    def one(chunk_id: str) -> str:
        n = int(chunk_id)
        if n % 11 == 0:
            return "{ this is not json"
        fmt = n % 3
        if fmt == 0:
            return json.dumps([
                {"type": "entity", "entity": f"dev {n}",
                 "entity_type": "device"},
                {"type": "entity", "entity": f"sen {n}",
                 "entity_type": "sensor"},
                {"type": "relationship", "subject": f"dev {n}",
                 "subject_type": "device", "relation": "connects",
                 "object": f"sen {n}", "object_type": "sensor"},
                {"type": "attribute", "entity": f"sen {n}",
                 "entity-type": "sensor", "attribute": "reading",
                 "value": n},
                {"type": "mystery"},
                "notadict",
                {"type": "entity", "entity": "x"},
            ])
        if fmt == 1:
            return json.dumps({
                "entities": [
                    {"entity": f"dev {n}", "type": "device"},
                    {"entity": f"bad {n}", "type": "thing"},
                ],
                "relationships": [
                    {"subject": f"sen {n}", "subject-type": "sensor",
                     "relation": "connects", "object": f"met {n}",
                     "object-type": "meter"},
                ],
                "attributes": [
                    {"entity": f"dev {n}", "entity-type": "device",
                     "attribute": "reading", "value": f"r {n}"},
                    {"entity": f"dev {n}", "entity_type": "device",
                     "attribute": "serial", "value": f"s {n}"},
                ],
            })
        return json.dumps({
            "entities": [{"entity": f"met {n}", "type": "meter"}],
            "relationships": [
                {"subject": f"met {n}", "subject_type": "meter",
                 "relation": "floats", "object": f"dev {n}",
                 "object_type": "device"},
            ],
            "attributes": [
                {"entity": f"met {n}", "entity_type": "meter",
                 "attribute": "reading", "value": True},
            ],
        })

    return pdf["chunk_id"].map(one)


def planted_doc_metadata(docs: DataFrame) -> DataFrame:
    """Document-library metadata rows derived per document for the
    schema.org triple emitters (operators/library.py): every nullable
    field rotates through present/absent so each presence gate is
    exercised; URIs are minted with the reference's sha256->UUID
    identifier hash. Pure column expressions."""
    from .operators.library import knowledge_hash_col, knowledge_uri_col

    did = _did()
    n = did.cast("string")
    pub = did % 2 == 0
    org = pub & (did % 4 == 0)
    return docs.select(
        knowledge_uri_col(
            "doc", knowledge_hash_col(F.concat(F.lit("document-"), n))
        ).alias("doc_uri"),
        F.when(did % 11 != 0, F.concat(F.lit("Document "), n)).alias("name"),
        F.when(did % 3 != 0, F.concat(F.lit("from "), F.col("source")))
        .alias("description"),
        F.when(did % 7 != 0, F.concat(F.lit("ident-"), n)).alias("identifier"),
        F.lit(None).cast("string").alias("copyright_notice"),
        F.when(did % 2 == 0, F.concat(F.lit("Holder "), (did % 5).cast("string")))
        .alias("copyright_holder"),
        F.when(did % 4 != 0, (1990 + did % 30).cast("string"))
        .alias("copyright_year"),
        F.when(did % 3 == 0, F.lit("CC-BY"))
        .when(did % 3 == 1, F.lit("MIT")).alias("license"),
        F.when(did % 5 != 0, F.concat(F.lit("https://example.org/doc/"), n))
        .alias("url"),
        F.when(did % 13 == 0, F.array().cast("array<string>")).otherwise(
            F.array(F.concat(F.lit("kw"), (did % 9).cast("string")),
                    F.concat(F.lit("topic"), (did % 4).cast("string")))
        ).alias("keywords"),
        F.when(pub, knowledge_uri_col(
            "pubev", knowledge_hash_col(F.concat(F.lit("pub-"), n))
        )).alias("pub_uri"),
        F.when(pub, F.concat(F.lit("Pub "), (did % 17).cast("string")))
        .alias("pub_name"),
        F.lit(None).cast("string").alias("pub_description"),
        F.when(pub, (1970 + did % 30).cast("string")).alias("pub_start"),
        F.when(pub & (did % 6 == 0), F.lit("2001")).alias("pub_end"),
        F.when(org, knowledge_uri_col(
            "org", knowledge_hash_col(
                F.concat(F.lit("org-"), (did % 7).cast("string")))
        )).alias("org_uri"),
        F.when(org, F.concat(F.lit("Org "), (did % 7).cast("string")))
        .alias("org_name"),
        F.when(org & (did % 8 == 0),
               F.concat(F.lit("descr "), (did % 7).cast("string")))
        .alias("org_description"),
    )


def planted_nquad_triples(docs: DataFrame) -> DataFrame:
    """Triple rows exercising every N-Quads encoding case (one per doc,
    rotating by doc_id % 6): IRI object with a named graph, a literal
    whose value carries every ECHAR escape (quote, newline, tab,
    backslash), a language-tagged literal, an xsd:integer-typed literal,
    a grammar-invalid subject IRI (space -> skipped), and an RDF-star
    row (no standard N-Quads encoding -> skipped)."""
    did = _did()
    n = did.cast("string")
    m = did % 6
    esc_lit = F.concat(
        F.lit('say "hi"'), F.lit("\n"), F.lit("tab\t"), F.lit("back\\"), n
    )
    return docs.select(
        F.concat(F.lit("doc-"), (did % 7).cast("string")).alias("id"),
        F.lit("default").alias("collection"),
        F.when(m == 0, F.concat(F.lit("urn:graph:g"), (did % 3).cast("string")))
        .otherwise(F.lit("")).alias("g"),
        F.when(m == 4, F.concat(F.lit("http://ex/bad subj"), n))
        .otherwise(F.concat(F.lit("http://ex/s"), n)).alias("s"),
        F.concat(F.lit("http://ex/p"), (did % 5).cast("string")).alias("p"),
        F.when(m == 0, F.concat(F.lit("http://ex/o"), n))
        .when(m == 1, esc_lit)
        .when(m == 2, F.concat(F.lit("tagged "), n))
        .when(m == 3, n)
        .when(m == 4, F.lit("x"))
        .otherwise(F.concat(
            F.lit('{"s":{"type":"i","iri":"http://ex/a'),
            (did % 9).cast("string"),
            F.lit('"},"p":{"type":"i","iri":"http://ex/b"},'
                  '"o":{"type":"l","value":"v '),
            n,
            F.lit('"}}'),
        )).alias("o"),
        F.when(m == 0, F.lit("u")).when(m == 5, F.lit("t"))
        .otherwise(F.lit("l")).alias("otype"),
        F.when(m == 3, F.lit("http://www.w3.org/2001/XMLSchema#integer"))
        .otherwise(F.lit("")).alias("dtype"),
        F.when(m == 2, F.when(did % 2 == 0, F.lit("en")).otherwise(F.lit("fr")))
        .otherwise(F.lit("")).alias("lang"),
    )
