"""Integration test for the composed corpus-hygiene pipeline
(trustgraph_spark/hygiene.py): planted dirt of every category must be
scrubbed by the right stage, and the composition must be internally
consistent."""

import pytest

from trustgraph_spark.hygiene import HygieneConfig, run_hygiene

W = ("alpha beta gamma delta epsilon zeta eta theta iota kappa lambda "
     "mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega").split()


def base(i, nwords=55):
    # tokens unique to (doc, position) except scattered stopwords at
    # doc-specific offsets (so no 5-token run repeats across docs, but
    # every doc clears the Gopher stopword floor)
    toks = [f"{W[k % len(W)]}{i}w{k}" for k in range(nwords)]
    toks[10 + i % 3] = "the"
    toks[20 + i % 5] = "and"
    toks[40 + i % 7] = "of"
    return " ".join(toks)


SPAN = "copied span aa bb cc dd ee"     # 7 tokens, shared 2 <-> 3
BANNER = "SHARED COOKIE BANNER LINE"

DOCS = [
    (0, base(0)),
    (1, base(1)),
    (2, base(2) + " " + SPAN),                      # first span copy
    (3, base(3) + " " + SPAN),                      # loses the span
    (4, BANNER + "\n" + base(4)),                   # first banner copy
    (5, BANNER + "\n" + base(5)),                   # loses the banner
    (6, base(6) + " contact someone@example.org today"),
    (7, "way too short"),                           # Gopher word floor
    (8, "spam " * 60),                              # Gopher stopwords
    (9, base(0)),                                   # exact dup of doc 0
]


@pytest.fixture(scope="module")
def result(spark):
    docs = spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in DOCS],
        "doc_id long, text string, source string")
    return run_hygiene(docs, HygieneConfig(
        span_n=5, seq_len=32, lm_vocab_size=400))


def test_report_counts(result):
    rep = {r["stage"]: r["n_docs"] for r in result["report"].collect()}
    assert rep["input"] == 10
    assert rep["after_dedup"] == 9          # doc 9 collapses into doc 0
    assert rep["after_scrub_filter"] == 7   # docs 7 and 8 fail Gopher


def test_stage_effects(result):
    cleaned = {r["doc_id"]: r.asDict()
               for r in result["cleaned"].collect()}
    assert set(cleaned) == {0, 1, 2, 3, 4, 5, 6}
    # span dedup: doc 2 (first occurrence) keeps the span, doc 3 lost it
    assert "copied" in cleaned[2]["text"]
    assert "copied" not in cleaned[3]["text"]
    assert "aa" not in cleaned[3]["text"].split()
    # line dedup: the banner survives only in doc 4 (lowercased by the
    # span stage's token rebuild)
    assert "shared cookie banner line" in cleaned[4]["text"]
    assert "shared" not in cleaned[5]["text"]
    # PII redacted
    assert "<EMAIL>" in cleaned[6]["text"]
    assert "someone@example.org" not in cleaned[6]["text"]
    # dedup resolution accounting: doc 0 canonicalizes {0, 9}
    assert cleaned[0]["cluster_size"] == 2
    assert cleaned[1]["cluster_size"] == 1
    # every survivor carries an LM score
    assert all(r["mean_logprob"] < 0 for r in cleaned.values())


def test_packing_consistent(result):
    packed = {r["doc_id"]: r.asDict() for r in result["packed"].collect()}
    cleaned = {r["doc_id"] for r in result["cleaned"].collect()}
    assert set(packed) == cleaned
    # offsets tile the concatenated stream: disjoint and contiguous
    spans = sorted((p["start_tok"], p["start_tok"] + p["n_tokens"])
                   for p in packed.values())
    assert spans[0][0] == 0
    assert all(spans[i][1] == spans[i + 1][0]
               for i in range(len(spans) - 1))


def test_mix_targets_path(spark):
    docs = spark.createDataFrame(
        [(i, t, f"src{i % 2}") for i, t in DOCS],
        "doc_id long, text string, source string")
    out = run_hygiene(docs, HygieneConfig(
        span_n=5, seq_len=32, lm_vocab_size=400,
        mix_targets={"src0": 0.7, "src1": 0.3}))
    rows = out["cleaned"].collect()
    assert rows and all(r["epoch"] >= 1 and r["rate"] > 0 for r in rows)
    # packing reflects the REALIZED corpus: one block row per
    # (doc_id, epoch) copy the mixture stage emitted, offsets tiling
    # the concatenated stream
    packed = out["packed"].collect()
    assert {(p["doc_id"], p["epoch"]) for p in packed} \
        == {(r["doc_id"], r["epoch"]) for r in rows}
    spans = sorted((p["start_tok"], p["start_tok"] + p["n_tokens"])
                   for p in packed)
    assert spans[0][0] == 0
    assert all(spans[i][1] == spans[i + 1][0]
               for i in range(len(spans) - 1))


def test_semdedup_and_dsir_stages(spark):
    import numpy as np

    rng = np.random.RandomState(3)
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, text string")
    vecs = {i: rng.randn(16) for i, _ in DOCS}
    vecs[4] = vecs[1] + rng.randn(16) * 0.01   # semantic near-dup pair
    emb = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in vecs.items()],
        "doc_id long, embedding array<double>")
    target = docs.where("doc_id IN (0, 1)").select("doc_id", "text")

    out = run_hygiene(
        docs,
        HygieneConfig(span_n=5, seq_len=32, lm_vocab_size=400,
                      dsir_keep=3),
        embeddings=emb, dsir_target=target)
    rep = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert rep["after_dedup"] == 9
    assert rep["after_semdedup"] == 8       # one of the {1, 4} pair goes
    assert rep["after_dsir"] == 3
    cleaned = {r["doc_id"] for r in out["cleaned"].collect()}
    assert len(cleaned) == 3
    # survivors are a subset of the semdedup'd, gopher-passing docs
    assert cleaned <= {0, 1, 2, 3, 4, 5, 6}
    packed = {r["doc_id"] for r in out["packed"].collect()}
    assert packed == cleaned


def test_docs_without_embeddings_are_kept(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, text string")
    # embeddings only for docs 0 and 1, well separated
    emb = spark.createDataFrame(
        [(0, [1.0] + [0.0] * 15), (1, [0.0] * 15 + [1.0])],
        "doc_id long, embedding array<double>")
    out = run_hygiene(docs, HygieneConfig(span_n=5, seq_len=32),
                      embeddings=emb)
    rep = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert rep["after_semdedup"] == 9       # nothing semantic to drop


def test_no_overlapping_embeddings_skips_semdedup(spark):
    """An embeddings table whose doc_ids never match a survivor (stale
    or mismatched file) must skip the stage cleanly — not crash inside
    k-means on an empty training frame."""
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, text string")
    emb = spark.createDataFrame(
        [(999, [1.0] * 16)], "doc_id long, embedding array<double>")
    out = run_hygiene(docs, HygieneConfig(span_n=5, seq_len=32),
                      embeddings=emb)
    rep = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert rep["after_semdedup"] == rep["after_dedup"]


def test_dsir_target_without_keep_errors(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, text string")
    with pytest.raises(ValueError, match="dsir_keep"):
        run_hygiene(docs, HygieneConfig(span_n=5, seq_len=32),
                    dsir_target=docs.select("doc_id", "text"))


def test_no_gopher_filter_keeps_everything(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in DOCS], "doc_id long, text string")
    out = run_hygiene(docs, HygieneConfig(
        span_n=5, seq_len=32, apply_gopher_filter=False))
    rep = {r["stage"]: r["n_docs"] for r in out["report"].collect()}
    assert rep["after_scrub_filter"] == 9   # only the exact dup drops
