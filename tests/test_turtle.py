"""Turtle import (operators/turtle.py) — grammar matrix, export->parse
roundtrip against serialize.triples_to_turtle, rdflib-style layout
tolerance, entity-context semantics from load_knowledge.py:63-76."""

import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.serialize import triples_to_turtle
from trustgraph_spark.operators.turtle import (
    RDF_NS,
    XSD_NS,
    TurtleError,
    parse_turtle,
    parse_turtle_py,
    turtle_entity_contexts,
)


def _set(triples):
    return set(triples)


# --- grammar matrix --------------------------------------------------------


def test_basic_directives_and_lists():
    t, skipped = parse_turtle_py("""
        @prefix ex: <http://ex/> .
        ex:s ex:p ex:o ; ex:q "a" , "b" .
    """)
    assert skipped == 0
    assert _set(t) == {
        ("http://ex/s", "http://ex/p", "http://ex/o", "u", "", ""),
        ("http://ex/s", "http://ex/q", "a", "l", "", ""),
        ("http://ex/s", "http://ex/q", "b", "l", "", ""),
    }


def test_sparql_style_directives_no_dot():
    t, _ = parse_turtle_py("""
        PREFIX ex: <http://ex/>
        BASE <http://base/>
        ex:s ex:p <rel> .
    """)
    assert t == [("http://ex/s", "http://ex/p", "http://base/rel",
                  "u", "", "")]


def test_a_keyword_and_numeric_boolean_shorthand():
    t, _ = parse_turtle_py(
        "@prefix ex: <http://ex/> .\n"
        "ex:s a ex:T ; ex:n 42 ; ex:m -3.5 ; ex:d 1.0e2 ; ex:b false .")
    by_p = {r[1]: r for r in t}
    assert by_p["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"][2] == \
        "http://ex/T"
    assert by_p["http://ex/n"][3:] == ("l", XSD_NS + "integer", "")
    assert by_p["http://ex/m"][2:] == ("-3.5", "l", XSD_NS + "decimal", "")
    assert by_p["http://ex/d"][2:] == ("1.0e2", "l", XSD_NS + "double", "")
    assert by_p["http://ex/b"][2:] == ("false", "l", XSD_NS + "boolean", "")


def test_string_forms_and_escapes():
    t, _ = parse_turtle_py(
        '@prefix ex: <http://ex/> .\n'
        'ex:s ex:p "q\\"x\\"\\n\\t\\\\" ; '
        "ex:q 'single' ; "
        'ex:r """tri "ple"\nline""" ; '
        "ex:t '''also\nlong''' ; "
        'ex:u "\\u00e9\\U0001F600" .')
    by_p = {r[1]: r[2] for r in t}
    assert by_p["http://ex/p"] == 'q"x"\n\t\\'
    assert by_p["http://ex/q"] == "single"
    assert by_p["http://ex/r"] == 'tri "ple"\nline'
    assert by_p["http://ex/t"] == "also\nlong"
    assert by_p["http://ex/u"] == "é\U0001F600"


def test_lang_and_datatypes():
    t, _ = parse_turtle_py(
        "@prefix xsd: <" + XSD_NS + "> .\n"
        '<http://ex/s> <http://ex/p> "x"@en-US ; '
        '<http://ex/q> "5"^^xsd:integer ; '
        '<http://ex/r> "d"^^<http://ex/dt> .')
    by_p = {r[1]: r for r in t}
    assert by_p["http://ex/p"][2:] == ("x", "l", "", "en-US")
    assert by_p["http://ex/q"][2:] == ("5", "l", XSD_NS + "integer", "")
    assert by_p["http://ex/r"][2:] == ("d", "l", "http://ex/dt", "")


def test_blank_nodes_property_lists_and_collections():
    t, _ = parse_turtle_py(
        "@prefix ex: <http://ex/> .\n"
        "_:x ex:knows [ ex:name \"A\" ] .\n"
        "[ ex:solo ex:o ] .\n"
        "ex:s ex:list ( ex:a \"b\" ) .\n"
        "ex:t ex:empty () .")
    trips = _set(t)
    assert ("_:x", "http://ex/knows", "_:genid1", "u", "", "") in trips
    assert ("_:genid1", "http://ex/name", "A", "l", "", "") in trips
    assert ("_:genid2", "http://ex/solo", "http://ex/o", "u", "", "") in trips
    firsts = [r for r in t if r[1] == RDF_NS + "first"]
    rests = [r for r in t if r[1] == RDF_NS + "rest"]
    assert len(firsts) == 2 and len(rests) == 2
    assert any(r[2] == RDF_NS + "nil" for r in rests)
    assert ("http://ex/t", "http://ex/empty", RDF_NS + "nil",
            "u", "", "") in trips


def test_rdf_star_object_and_subject_skip():
    t, skipped = parse_turtle_py(
        "@prefix ex: <http://ex/> .\n"
        'ex:s ex:said << ex:a ex:b "v"@fr >> .\n'
        "<< ex:x ex:y ex:z >> ex:certainty ex:high .")
    assert skipped == 1          # subject-position quoted triple
    assert len(t) == 1
    star = json.loads(t[0][2])
    assert star == {"s": {"type": "i", "iri": "http://ex/a"},
                    "p": {"type": "i", "iri": "http://ex/b"},
                    "o": {"type": "l", "value": "v", "language": "fr"}}
    assert t[0][3] == "t"


def test_rdflib_pretty_layout():
    # multi-line indented blocks + trailing ; as rdflib serializes
    t, _ = parse_turtle_py("""
        @prefix ex: <http://ex/> .

        ex:s a ex:T ;
            ex:p ex:o ;
            ex:q "v" ;
        .
    """)
    assert len(t) == 3


def test_errors_and_undefined_prefix():
    with pytest.raises(TurtleError, match="undefined prefix"):
        parse_turtle_py("nope:s <http://p> <http://o> .")
    with pytest.raises(TurtleError):
        parse_turtle_py("<http://s> <http://p> .")      # missing object
    with pytest.raises(TurtleError):
        parse_turtle_py("<http://s> <http://p> <http://o> ")  # no dot


# --- Spark surface ---------------------------------------------------------


def test_parse_turtle_resilient_and_strict(spark):
    docs = spark.createDataFrame(
        [(0, "<http://s> <http://p> \"v\" ."),
         (1, "broken @@@ turtle")],
        "doc_id long, text string")
    got = parse_turtle(docs).collect()
    assert len(got) == 1 and got[0]["doc_id"] == 0
    with pytest.raises(Exception, match="doc 1"):
        parse_turtle(docs, strict=True).collect()


def test_entity_contexts_reference_semantics(spark):
    docs = spark.createDataFrame(
        [(0, "@prefix ex: <http://ex/> .\n"
             "ex:s ex:p \"ctx\" ; ex:q ex:o ; ex:r _:b .\n")],
        "doc_id long, text string")
    got = {(r["entity"], r["context"])
           for r in turtle_entity_contexts(parse_turtle(docs)).collect()}
    # literals AND blank-node objects pass (rdflib URIRef guard); IRIs not
    assert got == {("http://ex/s", "ctx"), ("http://ex/s", "_:b")}


def test_export_parse_roundtrip(spark):
    from trustgraph_spark.planted import planted_nquad_triples
    docs = spark.range(60).select(
        F.col("id").alias("doc_id"),
        F.lit("x").alias("text"))
    planted = planted_nquad_triples(docs)
    lines = triples_to_turtle(
        planted,
        {"ex": "http://ex/", "xsd": XSD_NS})
    one_doc = lines.agg(
        F.array_join(F.sort_array(F.collect_list("line")), "\n")
        .alias("text")).select(F.lit(0).alias("doc_id"), "text")
    back = parse_turtle(one_doc).select("s", "p", "o", "otype",
                                        "dtype", "lang")
    expect = planted.where((F.col("id").isNotNull()) &
                           (~F.col("s").contains(" "))) \
        .select("s", "p", "o", "otype", "dtype", "lang")
    assert sorted(map(tuple, back.collect())) == \
        sorted(map(tuple, expect.collect()))
