"""The corpus-hygiene pipeline — every scrub stage this package ships,
composed in the order the stages are actually sound:

1. **exact-dedup resolution** — collapse verbatim documents FIRST:
   span dedup would otherwise gut every later copy to an empty doc
   (all its n-grams are repeats) and the quality filter would silently
   eat them, losing the cluster accounting.
1b. **SemDedup** (optional, embeddings given) — drop semantic
   near-duplicates exact dedup cannot see, while the doc set is
   already free of verbatim copies (which would otherwise all land in
   one cluster and burn pair-join budget re-discovering stage 1).
2. **corpus line dedup** (C4 keep-first) — strip cross-document
   boilerplate lines while LINE STRUCTURE still exists (span dedup
   re-joins tokens with spaces, destroying newlines).
3. **span dedup** (exact-substring, keep-first) — remove residual
   verbatim repeated spans.
4. **PII redaction** — chained-replace scrub.
5. **Gopher document filter** — drop documents failing the
   repetition/structure rules, computed on the CLEANED text.
5b. **DSIR selection** (optional, target corpus given) — importance-
   resample the survivors toward the target distribution; runs on
   scrubbed, quality-passed text so the hashed-n-gram models never
   fit on boilerplate that later stages would have removed.
6. **LM quality score** — corpus-fitted unigram mean-logprob for
   downstream thresholding.
7. **mixture sampling** (optional, targets given) — realize per-source
   token shares with deterministic hash sampling.
8. **sequence packing** — block assignment for the REALIZED training
   corpus: post-mix when mixing ran (each epoch copy packs
   separately), else the scrub survivors.

Each stage is the already-oracled operator; this module only wires
them.  The composition is integration-tested
(tests/test_hygiene_pipeline.py) and runnable as one spark-submit job
(jobs/run_hygiene.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class HygieneConfig:
    span_n: int = 50
    line_min_count: int = 2
    seq_len: int = 2048
    lm_vocab_size: int = 65536
    apply_gopher_filter: bool = True
    mix_targets: dict = field(default_factory=dict)
    mix_salt: str = "mix"
    semdedup_eps: float = 0.95
    semdedup_cluster_size: int = 512
    dsir_keep: int = 0           # 0 = keep everything
    dsir_buckets: int = 8192


def run_hygiene(documents: DataFrame,
                config: HygieneConfig | None = None,
                embeddings: DataFrame | None = None,
                dsir_target: DataFrame | None = None) -> dict:
    """Run the scrub chain over (doc_id, text[, source]); returns a
    dict of DataFrames: cleaned (the surviving corpus with scores and
    dup-cluster sizes), packed (block assignments), report (per-stage
    doc counts).

    ``embeddings`` — optional (doc_id, embedding) table: enables the
    SemDedup stage (centroids k-means-refined at n_docs /
    semdedup_cluster_size lists, the operator's k-proportional-to-N
    cost model).  Docs without an embedding row are kept (nothing to
    compare).  ``dsir_target`` — optional (doc_id, text) corpus:
    enables DSIR selection of the top ``dsir_keep`` survivors."""
    from trustgraph_spark.operators.dedup import resolve_duplicates
    from trustgraph_spark.operators.dsir import dsir_sample
    from trustgraph_spark.operators.linededup import corpus_line_dedup
    from trustgraph_spark.operators.lmquality import unigram_logprob_score
    from trustgraph_spark.operators.mixing import sample_to_mix
    from trustgraph_spark.operators.packing import pack_blocks
    from trustgraph_spark.operators.pii import redact_col
    from trustgraph_spark.operators.quality import gopher_pass_col
    from trustgraph_spark.operators.semdedup import semdedup
    from trustgraph_spark.operators.spandedup import exact_substring_dedup

    cfg = config or HygieneConfig()
    has_source = "source" in documents.columns
    sources = (documents.select("doc_id", "source")
               if has_source else None)

    n0 = documents.count()

    # 1. exact dedup: pair every doc with the min doc of its normalized
    # content hash, resolve via CC, keep canonicals (+ cluster sizes)
    hashed = documents.select(
        "doc_id",
        F.md5(F.trim(F.regexp_replace(F.lower("text"), r"\s+", " ")))
        .alias("h"))
    firsts = hashed.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    dup_pairs = (hashed.join(firsts, "h")
                 .where(F.col("doc_id") != F.col("first_doc"))
                 .select(F.col("doc_id").alias("a"),
                         F.col("first_doc").alias("b")))
    resolved = resolve_duplicates(documents, dup_pairs)
    # localCheckpoint each stage boundary the report forces an action on
    # anyway: canon feeds 3+ downstream subtrees (SemDedup join, line
    # dedup, the cluster-size join) and would otherwise re-run the
    # hash+CC dedup once per consumer.
    canon = (documents.join(
        resolved.where("is_canonical").select("doc_id", "cluster_size"),
        "doc_id")).localCheckpoint()
    n_dedup = canon.count()
    stages = [("input", n0), ("after_dedup", n_dedup)]

    # 1b. SemDedup over the exact-dedup survivors (embeddings given)
    if embeddings is not None:
        from trustgraph_spark.operators.embeddings import ivf_kmeans

        emb = embeddings.join(canon.select("doc_id"), "doc_id") \
            .localCheckpoint()
        n_emb = emb.count()
        if n_emb > 0:
            # k proportional to N (expected cluster size ~
            # cluster_size); never more lists than needed — a tiny
            # corpus is ONE cluster
            n_lists = max(1, -(-n_emb // cfg.semdedup_cluster_size))
            cents = ivf_kmeans(emb, n_lists=n_lists, id_col="doc_id",
                               vec_col="embedding")
            sem_drop = (semdedup(emb, cents, eps=cfg.semdedup_eps,
                                 id_col="doc_id", vec_col="embedding")
                        .where(~F.col("kept")).select("doc_id"))
            canon = canon.join(sem_drop, "doc_id", "left_anti") \
                .localCheckpoint()
        # n_emb == 0: no survivor has an embedding row — nothing to
        # compare, everything kept (the documented no-embedding rule)
        stages.append(("after_semdedup", canon.count()))

    # 2-4. line dedup (needs intact newlines), span dedup, redaction
    lined = (corpus_line_dedup(canon.select("doc_id", "text"),
                               min_count=cfg.line_min_count)
             .select("doc_id", "text"))
    spanned = (exact_substring_dedup(lined, n=cfg.span_n)
               .select("doc_id", "text"))
    redacted = spanned.select(
        "doc_id", redact_col(F.col("text")).alias("text"))

    # 5. Gopher filter on the cleaned text
    if cfg.apply_gopher_filter:
        filtered = redacted.where(gopher_pass_col(F.col("text")))
    else:
        filtered = redacted
    # filtered feeds the LM-score fit, the score join, DSIR, and the
    # report count — checkpoint so the scrub chain runs once, not 4x.
    filtered = filtered.localCheckpoint()
    n_filtered = filtered.count()
    stages.append(("after_scrub_filter", n_filtered))

    # 5b. DSIR selection over the scrubbed, quality-passed survivors
    if dsir_target is not None:
        if cfg.dsir_keep <= 0:
            raise ValueError(
                "dsir_target given but dsir_keep is 0 — set "
                "HygieneConfig.dsir_keep to the number of documents "
                "to select (the target corpus enables DSIR; the keep "
                "count sizes it)")
        sel = dsir_sample(filtered, dsir_target, k=cfg.dsir_keep,
                          n_buckets=cfg.dsir_buckets)
        filtered = filtered.join(sel.select("doc_id"), "doc_id") \
            .localCheckpoint()
        stages.append(("after_dsir", filtered.count()))

    # 6. LM quality score (model fitted on the surviving corpus)
    scored = (filtered
              .join(unigram_logprob_score(
                  filtered, vocab_size=cfg.lm_vocab_size), "doc_id")
              .join(canon.select("doc_id", "cluster_size"), "doc_id"))

    cleaned = scored
    if cfg.mix_targets:
        if not has_source:
            raise ValueError("mix_targets given but no source column")
        sampled = sample_to_mix(
            scored.join(sources, "doc_id"), cfg.mix_targets,
            salt=cfg.mix_salt)
        cleaned = scored.join(
            sampled.select("doc_id", "epoch", "rate"), "doc_id")

    # 8. packing over the REALIZED training corpus: post-mix when
    # mixing ran (each epoch copy packs separately, doc-major
    # (doc_id, epoch) concatenation order via a synthetic unique key
    # — pack_blocks requires unique integer ids), else the scrub
    # survivors directly.
    if cfg.mix_targets:
        # epochs are 1..n_ep; key = doc_id * n_ep + (epoch - 1) is
        # unique and (doc_id, epoch)-lexicographic for doc_id >= 0
        n_ep = cleaned.agg(F.max("epoch")).first()[0] or 1
        pack_in = cleaned.select(
            F.expr(f"doc_id * {n_ep} + epoch - 1").alias("doc_id"),
            "text")
        packed = (pack_blocks(pack_in, seq_len=cfg.seq_len)
                  .withColumn("epoch",
                              F.expr(f"doc_id % {n_ep} + 1").cast("int"))
                  .withColumn("doc_id", F.expr(f"doc_id div {n_ep}")))
    else:
        packed = pack_blocks(cleaned, seq_len=cfg.seq_len)

    report_df = documents.sparkSession.createDataFrame(
        stages, "stage string, n_docs long")
    return {"cleaned": cleaned, "packed": packed, "report": report_df}
