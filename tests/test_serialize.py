"""N-Quads serialization/parsing tests (reference:
trustgraph-cli/trustgraph/cli/nquads.py grammar encoding contract)."""

import pytest
from pyspark.sql import functions as F

from trustgraph_spark.operators.serialize import (
    parse_nquads,
    triples_to_nquads,
)

DDL = (
    "collection string, g string, s string, p string, o string, "
    "otype string, dtype string, lang string"
)


def _enc(spark, rows, **kw):
    df = spark.createDataFrame(rows, DDL)
    return triples_to_nquads(df, **kw).collect()


def _row(s="http://e/s", p="http://e/p", o="http://e/o", otype="u",
         dtype="", lang="", g=""):
    return ("d", g, s, p, o, otype, dtype, lang)


class TestEncode:
    def test_iri_object_with_graph(self, spark):
        [r] = _enc(spark, [_row(g="urn:g:1")])
        assert r.line == "<http://e/s> <http://e/p> <http://e/o> <urn:g:1> ."
        assert r.encodable

    def test_default_graph_emits_ntriples(self, spark):
        [r] = _enc(spark, [_row()])
        assert r.line == "<http://e/s> <http://e/p> <http://e/o> ."

    def test_constant_graph_override(self, spark):
        [r] = _enc(spark, [_row(g="urn:row")], graph_iri="urn:fixed")
        assert r.line.endswith("<urn:fixed> .")

    def test_echar_escapes_backslash_first(self, spark):
        # ECHAR ordering: backslash escaped before the others so '\n'
        # in data becomes '\\n' not '\\\\n' (nquads.py:22-28)
        [r] = _enc(spark, [_row(o='a\\b"c\nd\re\tf', otype="l")])
        assert r.line == (
            '<http://e/s> <http://e/p> "a\\\\b\\"c\\nd\\re\\tf" .')

    def test_language_and_datatype_tags(self, spark):
        out = _enc(spark, [
            _row(o="hei", otype="l", lang="nb"),
            _row(o="42", otype="l",
                 dtype="http://www.w3.org/2001/XMLSchema#integer"),
        ])
        assert out[0].line.endswith('"hei"@nb .')
        assert out[1].line.endswith(
            '"42"^^<http://www.w3.org/2001/XMLSchema#integer> .')

    def test_language_wins_over_datatype(self, spark):
        # the reference checks language first (nquads.py:66-76)
        [r] = _enc(spark, [_row(o="x", otype="l", lang="en",
                                dtype="http://e/dt")])
        assert r.line.endswith('"x"@en .')

    @pytest.mark.parametrize("bad", [
        "http://e/with space", "http://e/br{ace}", 'http://e/qu"ote',
        "http://e/back\\slash", "", "http://e/ctl\x01x",
    ])
    def test_forbidden_iri_characters_skip(self, spark, bad):
        [r] = _enc(spark, [_row(s=bad)])
        assert r.line is None and not r.encodable

    def test_rdf_star_skipped(self, spark):
        [r] = _enc(spark, [_row(o='{"s": "x"}', otype="t")])
        assert r.line is None and not r.encodable

    def test_literal_subject_impossible(self, spark):
        # literals are object-position-only; otype describes the object,
        # so a bad SUBJECT iri is the only way a literal-ish subject
        # appears — covered above; here: bad graph iri skips
        [r] = _enc(spark, [_row(g="urn:bad graph")])
        assert not r.encodable

    def test_bad_datatype_iri_skips(self, spark):
        [r] = _enc(spark, [_row(o="x", otype="l", dtype="http://e/ d")])
        assert not r.encodable


class TestParseRoundtrip:
    def test_roundtrip_all_term_shapes(self, spark):
        rows = [
            _row(g="urn:g:1"),
            _row(o='tricky \\" \\\\ "quoted"\nnl\ttab', otype="l"),
            _row(o="hei", otype="l", lang="nb"),
            _row(o="42", otype="l",
                 dtype="http://www.w3.org/2001/XMLSchema#integer"),
        ]
        df = spark.createDataFrame(rows, DDL)
        enc = triples_to_nquads(df).where(F.col("encodable"))
        back = parse_nquads(enc.select("line"))
        got = {(r.g, r.s, r.p, r.o, r.otype, r.dtype, r.lang)
               for r in back.collect()}
        want = {(g, s, p, o, ot, dt, lg)
                for (_, g, s, p, o, ot, dt, lg) in rows}
        assert got == want

    def test_unparseable_lines_dropped(self, spark):
        lines = spark.createDataFrame(
            [("not a quad",), ("<a> <b> .",), ("",),
             ("<http://e/s> <http://e/p> <http://e/o> .",)],
            "line string")
        out = parse_nquads(lines).collect()
        assert len(out) == 1 and out[0].s == "http://e/s"

    def test_parse_is_native_no_udf(self, spark):
        lines = spark.createDataFrame([("x",)], "line string")
        plan = parse_nquads(lines)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "EvalPython" not in plan


# ---------------------------------------------------------------------------
# property-based roundtrip (hypothesis)
# ---------------------------------------------------------------------------


from hypothesis import given, settings
from hypothesis import strategies as st

# any codepoint may appear in a literal value (the grammar only forbids
# RAW 0x22/0x5C/0x0A/0x0D, which the escape chain handles); exclude
# surrogates, which are not valid in UTF-8 interchange
_literal_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=60)


class TestPropertyRoundtrip:
    @settings(max_examples=30, deadline=None)
    @given(values=st.lists(_literal_text, min_size=1, max_size=8))
    def test_literal_escape_roundtrip(self, spark, values):
        rows = [("d", "", "http://e/s%d" % i, "http://e/p", v, "l", "", "")
                for i, v in enumerate(values)]
        df = spark.createDataFrame(rows, DDL)
        enc = triples_to_nquads(df).where(F.col("encodable"))
        back = parse_nquads(enc.select("line"))
        got = sorted((r.s, r.o) for r in back.collect())
        want = sorted((s, o) for (_, _, s, _, o, _, _, _) in rows)
        assert got == want


# ---------------------------------------------------------------------------
# Turtle export (graph_to_turtle.py)
# ---------------------------------------------------------------------------


import json

from trustgraph_spark.operators.serialize import triples_to_turtle

PREFIXES = {"ex": "http://e/", "xsd": "http://www.w3.org/2001/XMLSchema#"}


class TestTurtle:
    def test_subject_block_groups_sorted_pairs(self, spark):
        rows = [
            _row(s="http://e/s1", p="http://e/p2", o="http://e/o2"),
            _row(s="http://e/s1", p="http://e/p1", o="http://e/o1"),
            _row(s="http://e/s1", p="http://e/p1", o="zz", otype="l"),
        ]
        df = spark.createDataFrame(rows, DDL)
        lines = {r.line for r in triples_to_turtle(df, PREFIXES).collect()}
        assert 'ex:s1 ex:p1 "zz" ; ex:p1 ex:o1 ; ex:p2 ex:o2 .' in lines
        assert "@prefix ex: <http://e/> ." in lines

    def test_qname_falls_back_for_unsafe_local(self, spark):
        # '%' is outside the conservative PN_LOCAL subset
        rows = [_row(s="http://e/ok", o="http://e/o%65", otype="u")]
        df = spark.createDataFrame(rows, DDL)
        [line] = [r.line for r in triples_to_turtle(df, PREFIXES).collect()
                  if not r.line.startswith("@prefix")]
        assert line == "ex:ok ex:p <http://e/o%65> ."

    def test_rdf_star_object(self, spark):
        star = json.dumps({"s": {"type": "i", "iri": "http://e/a"},
                           "p": {"type": "i", "iri": "http://e/b"},
                           "o": {"type": "l", "value": 'v "q"'}})
        rows = [_row(o=star, otype="t")]
        df = spark.createDataFrame(rows, DDL)
        [line] = [r.line for r in triples_to_turtle(df, PREFIXES).collect()
                  if not r.line.startswith("@prefix")]
        assert line == 'ex:s ex:p << ex:a ex:b "v \\"q\\"" >> .'

    def test_malformed_star_and_iris_skipped(self, spark):
        rows = [
            _row(o="{not json}", otype="t"),
            _row(s="http://e/bad subj"),
        ]
        df = spark.createDataFrame(rows, DDL)
        out = [r.line for r in triples_to_turtle(df, PREFIXES).collect()]
        assert all(line.startswith("@prefix") for line in out)

    def test_datatype_qname_compression(self, spark):
        rows = [_row(o="7", otype="l",
                     dtype="http://www.w3.org/2001/XMLSchema#integer")]
        df = spark.createDataFrame(rows, DDL)
        [line] = [r.line for r in triples_to_turtle(df, PREFIXES).collect()
                  if not r.line.startswith("@prefix")]
        assert line.endswith('"7"^^xsd:integer .')
