"""tg-query-graph CLI kernel (trustgraph-cli/cli/query_graph.py):
term parsing, display formatting, native formatter parity, and the
pattern-dispatch round trip."""

import json

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.cliquery import (
    build_quoted_triple_term,
    build_term,
    cli_query_graph,
    format_term,
    format_term_col,
    format_triples,
    parse_inline_quoted_triple,
)


def test_build_term_autodetect():
    assert build_term("http://x/y") == {"t": "i", "i": "http://x/y"}
    assert build_term("urn:z:1") == {"t": "i", "i": "urn:z:1"}
    assert build_term("<http://x>") == {"t": "i", "i": "http://x"}
    assert build_term("hello world") == {"t": "l", "v": "hello world"}
    assert build_term(None) is None
    qt = build_term("<<http://a http://p lit>>")
    assert qt == {"t": "t", "tr": {"s": {"t": "i", "i": "http://a"},
                                   "p": {"t": "i", "i": "http://p"},
                                   "o": {"t": "l", "v": "lit"}}}


def test_build_term_explicit_and_tags():
    assert build_term("x", term_type="iri") == {"t": "i", "i": "x"}
    assert build_term("5", term_type="literal",
                      datatype="xsd:integer") == \
        {"t": "l", "v": "5", "dt": "xsd:integer"}
    assert build_term("hi", term_type="literal", language="en") == \
        {"t": "l", "v": "hi", "ln": "en"}
    # legacy raw-JSON triple form
    raw = json.dumps({"s": {"t": "i", "i": "a"}})
    assert build_term(raw, term_type="triple") == \
        {"t": "t", "tr": {"s": {"t": "i", "i": "a"}}}
    with pytest.raises(ValueError, match="Unknown term type"):
        build_term("x", term_type="nope")


def test_parse_inline_quoted_triple_quote_aware():
    qt = parse_inline_quoted_triple(
        '<<http://a http://p "two words">>')
    assert qt["tr"]["o"] == {"t": "l", "v": '"two words"'}
    with pytest.raises(ValueError, match="exactly 3 parts"):
        parse_inline_quoted_triple("<<http://a http://p>>")


def test_build_quoted_triple_term():
    assert build_quoted_triple_term(None, None, None, None, None,
                                    None, None) is None
    t = build_quoted_triple_term("http://s", None, "http://p",
                                 "v", "literal", None, "fr")
    assert t["tr"]["o"] == {"t": "l", "v": "v", "ln": "fr"}
    assert t["tr"]["p"] == {"t": "i", "i": "http://p"}


def test_format_term_matrix():
    assert format_term({"t": "i", "i": "http://x"}) == "http://x"
    assert format_term({"type": "i", "iri": "http://y"}) == "http://y"
    assert format_term({"t": "l", "v": "a"}) == '"a"'
    # language beats datatype (query_graph.py:228-235)
    assert format_term({"t": "l", "v": "a", "ln": "en",
                        "dt": "xsd:string"}) == '"a"@en'
    assert format_term({"type": "l", "value": "5",
                        "datatype": "xsd:integer"}) == '"5"^^xsd:integer'
    assert format_term({"t": "t", "tr": {
        "s": {"t": "i", "i": "a"}, "p": {"t": "i", "i": "b"},
        "o": {"t": "l", "v": "c"}}}) == '<<a b "c">>'
    # raw s/p/o dict without a type wrapper
    assert format_term({"s": {"t": "i", "i": "a"},
                        "p": {"t": "i", "i": "b"},
                        "o": {"t": "i", "i": "c"}}) == "<<a b c>>"
    # stringified quoted triple inside an IRI slot (backend quirk)
    quirk = json.dumps({"s": {"t": "i", "i": "a"},
                        "p": {"t": "i", "i": "b"},
                        "o": {"t": "i", "i": "c"}})
    assert format_term({"t": "i", "i": quirk}) == "<<a b c>>"
    # invalid JSON in the quirk slot stays a plain IRI
    assert format_term({"t": "i", "i": '{"s": nope'}) == '{"s": nope'
    assert format_term({}) == ""
    assert format_term(None) == ""


def test_format_triples_outputs():
    triples = [{"s": {"t": "i", "i": "a"}, "p": {"t": "i", "i": "b"},
                "o": {"t": "l", "v": "c"}}]
    assert format_triples(triples) == 'a b "c"'
    assert format_triples(triples, "space", headers=True) == \
        'subject predicate object\na b "c"'
    assert format_triples(triples, "pipe") == 'a|b|"c"'
    assert format_triples(triples, "jsonl") == json.dumps(triples[0])
    assert json.loads(format_triples(triples, "json")) == triples


def test_format_term_col_matches_python(spark):
    rows = [
        ("http://x", "u", "", ""),
        ("plain", "l", "", ""),
        ("tagged", "l", "", "en"),
        ("typed", "l", "xsd:int", ""),
        ("both", "l", "xsd:int", "en"),   # language wins
        (json.dumps({"s": {"type": "i", "iri": "a"},
                     "p": {"type": "i", "iri": "b"},
                     "o": {"type": "l", "value": "c"}}), "t", "", ""),
    ]
    df = spark.createDataFrame(
        rows, "o string, otype string, dtype string, lang string")
    got = [r["f"] for r in df.select(format_term_col(
        F.col("o"), F.col("otype"), F.col("dtype"),
        F.col("lang")).alias("f")).collect()]

    def py(o, otype, dt, ln):
        if otype == "u":
            return format_term({"t": "i", "i": o})
        if otype == "t":
            return format_term({"t": "t", "tr": json.loads(o)})
        d = {"t": "l", "v": o}
        if ln:
            d["ln"] = ln
        if dt:
            d["dt"] = dt
        return format_term(d)

    assert got == [py(*r) for r in rows]


def test_cli_query_graph_roundtrip(spark):
    edges = spark.createDataFrame(
        [("default", "g1", "http://e/a", "http://p/x", "http://e/b",
          "u", "", ""),
         ("default", "g1", "http://e/a", "http://p/y", "two words",
          "l", "", "en"),
         ("default", "g2", "http://e/c", "http://p/x", "http://e/d",
          "u", "", "")],
        "collection string, g string, s string, p string, o string, "
        "otype string, dtype string, lang string")
    out = cli_query_graph(edges, s="<http://e/a>", g="g1").collect()
    lines = sorted(r["line"] for r in out)
    assert lines == [
        'http://e/a http://p/x http://e/b',
        'http://e/a http://p/y "two words"@en',
    ]
    piped = cli_query_graph(edges, g="g2", output_format="pipe").collect()
    assert piped[0]["line"] == "http://e/c|http://p/x|http://e/d"
    with pytest.raises(ValueError, match="quoted-triple patterns"):
        cli_query_graph(edges, o="<<a b c>>")


# ---------------------------------------------------------------------------
# StreamingWordWrapper (cli/invoke_agent.py:32-102)
# ---------------------------------------------------------------------------

def test_word_wrapper_basic_wrap():
    from trustgraph_spark.cliquery import StreamingWordWrapper

    w = StreamingWordWrapper(width=10, prefix="> ")
    w.output("aaaa bbbb cccc\ndd")
    assert w.close() == "> aaaa \n> bbbb cccc\n> dd\n"


def test_word_wrapper_newline_flush_skips_width_check():
    # the reference's newline arm flushes the word buffer WITHOUT a
    # width check (invoke_agent.py:83-89) — the line may run long
    from trustgraph_spark.cliquery import StreamingWordWrapper

    w = StreamingWordWrapper(width=8, prefix="> ")
    w.output("xxxx yyyy\nzz")
    assert w.close() == "> xxxx yyyy\n> zz\n"


def test_word_wrapper_tabs_and_empty():
    from trustgraph_spark.cliquery import StreamingWordWrapper

    w = StreamingWordWrapper(width=20, prefix="> ")
    w.output("a\tb")
    assert w.close() == "> a\tb\n"
    # zero output still terminates the prefix line (__exit__ checks
    # column > 0, and the prefix makes it so)
    w2 = StreamingWordWrapper(width=20, prefix="> ")
    assert w2.close() == "> \n"


def test_word_wrapper_chunk_invariance():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from trustgraph_spark.cliquery import StreamingWordWrapper

    text_st = st.text(
        alphabet=st.sampled_from("ab \t\n"), min_size=0, max_size=60)

    @given(text=text_st, cuts=st.lists(
        st.integers(min_value=0, max_value=60), max_size=5))
    @settings(max_examples=200, deadline=None)
    def check(text, cuts):
        whole = StreamingWordWrapper(width=9)
        whole.output(text)
        expect = whole.close()
        chunked = StreamingWordWrapper(width=9)
        pos = 0
        for c in sorted(cuts):
            c = min(c, len(text))
            chunked.output(text[pos:c] if c >= pos else "")
            pos = max(pos, c)
        chunked.output(text[pos:])
        assert chunked.close() == expect

    check()
