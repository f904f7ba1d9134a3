"""Eval-set decontamination (operators/decontam.py) vs a Python
replay of the pinned 13-gram collision rule."""

import pytest

from trustgraph_spark.operators.decontam import ngram_contamination

WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi "
         "psi omega").split()


def _doc(i, nwords=30):
    # tokens unique to (doc, position): the only 13-gram collisions are
    # the spans EVALS lifts verbatim
    return " ".join(f"{WORDS[k % len(WORDS)]}{i}x{k}"
                    for k in range(nwords))


DOCS = [(i, _doc(i)) for i in range(8)] + [
    (8, "too short for a thirteen gram"),
    (9, ""),
]

# eval doc 0 lifts a 16-word span from doc 2; eval doc 1 lifts a span
# from doc 5; eval doc 2 is novel text
EVALS = [
    (0, " ".join(DOCS[2][1].split()[4:20])),
    (1, " ".join(DOCS[5][1].split()[0:14])),
    (2, " ".join("novel" + str(k) for k in range(20))),
]


def py_grams(text, n=13):
    w = [x for x in text.lower().split() if x]
    return {" ".join(w[i:i + n]) for i in range(len(w) - n + 1)}


def py_report(docs, evals, n=13):
    eg = {}
    for eid, t in evals:
        for g in py_grams(t, n):
            eg.setdefault(g, set()).add(eid)
    out = {}
    for did, t in docs:
        gs = py_grams(t, n)
        hit = {g for g in gs if g in eg}
        eids = set()
        for g in hit:
            eids |= eg[g]
        frac = round(len(hit) / len(gs), 6) if gs else 0.0
        out[did] = (len(gs), len(hit), frac, len(eids), bool(hit))
    return out


@pytest.fixture(scope="module")
def frames(spark):
    return (spark.createDataFrame(DOCS, "doc_id long, text string"),
            spark.createDataFrame(EVALS, "eval_id long, text string"))


def test_contamination_matches_python_replay(spark, frames):
    docs, evals = frames
    got = {r["doc_id"]: (r["n_grams"], r["n_overlap"], r["overlap_frac"],
                         r["n_eval_docs"], r["contaminated"])
           for r in ngram_contamination(docs, evals).collect()}
    exp = py_report(DOCS, EVALS)
    assert set(got) == set(exp)
    for k in exp:
        assert got[k] == pytest.approx(exp[k]), (k, got[k], exp[k])


def test_contamination_flags_planted_spans(spark, frames):
    docs, evals = frames
    got = {r["doc_id"]: r.asDict()
           for r in ngram_contamination(docs, evals).collect()}
    assert got[2]["contaminated"] is True
    assert got[5]["contaminated"] is True
    # the 16-word lift contains 4 distinct 13-grams
    assert got[2]["n_overlap"] == 4
    assert got[5]["n_overlap"] == 2
    for clean in (0, 1, 3, 4, 6, 7):
        assert got[clean]["contaminated"] is False, clean
    # short/empty docs: zero grams, clean, still present
    assert got[8] == dict(doc_id=8, n_grams=0, n_overlap=0,
                          overlap_frac=0.0, n_eval_docs=0,
                          contaminated=False)
    assert got[9]["n_grams"] == 0 and got[9]["contaminated"] is False


def test_contamination_plan_broadcasts_eval(spark, frames):
    docs, evals = frames
    df = ngram_contamination(docs, evals)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Python" not in plan
