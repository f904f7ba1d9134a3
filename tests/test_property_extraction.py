"""Property-based golden-behavior checks: random JSONL-shaped objects
(including unicode, empties, Nones) through the triple constructors must
reproduce the reference post-processing exactly (triple counts, URIs,
filtering) — computed independently in pure Python."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from trustgraph_spark.constants import DEFINITION, RDF_LABEL
from trustgraph_spark.operators.extract import (
    FixtureExtractor,
    definitions_to_triples,
    extract_definitions,
    extract_relationships,
    relationships_to_triples,
)
from trustgraph_spark.uris import to_uri_py

text_strat = st.one_of(
    st.none(),
    st.text(max_size=30),
    st.sampled_from(["", "Machine Learning", "数据 处理", "TCP/IP", "a/b c.d"]),
)


def expected_def_triples(defs):
    out = set()
    for d in defs:
        s, o = d["entity"], d["definition"]
        if s in ("", None) or o in ("", None):
            continue
        u = to_uri_py(s)
        out.add((u, RDF_LABEL, s, "l"))
        out.add((u, DEFINITION, o, "l"))
    return out


def expected_rel_triples(rels):
    out = set()
    for r in rels:
        s, p, o = r["subject"], r["predicate"], r["object"]
        if s in ("", None) or p in ("", None) or o in ("", None):
            continue
        su, pu = to_uri_py(s), to_uri_py(p)
        if r["object-entity"]:
            ou = to_uri_py(o)
            out.add((su, pu, ou, "u"))
            out.add((ou, RDF_LABEL, o, "l"))
        else:
            out.add((su, pu, o, "l"))
        out.add((su, RDF_LABEL, s, "l"))
        out.add((pu, RDF_LABEL, p, "l"))
    return out


def one_chunk(spark):
    return spark.createDataFrame(
        [("c1", "r1", "default", 0, "text")],
        "chunk_id string, root_id string, collection string, turn_idx int, text string",
    )


@given(
    defs=st.lists(
        st.fixed_dictionaries({"entity": text_strat, "definition": text_strat}),
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None)
def test_definitions_property(spark, defs):
    got = {
        (r.s, r.p, r.o, r.otype)
        for r in definitions_to_triples(
            extract_definitions(one_chunk(spark), FixtureExtractor(defs=defs))
        ).collect()
    }
    assert got == expected_def_triples(defs)


@given(
    rels=st.lists(
        st.fixed_dictionaries(
            {
                "subject": text_strat,
                "predicate": text_strat,
                "object": text_strat,
                "object-entity": st.booleans(),
            }
        ),
        max_size=6,
    )
)
@settings(max_examples=10, deadline=None)
def test_relationships_property(spark, rels):
    got = {
        (r.s, r.p, r.o, r.otype)
        for r in relationships_to_triples(
            extract_relationships(one_chunk(spark), FixtureExtractor(rels=rels))
        ).collect()
    }
    assert got == expected_rel_triples(rels)
