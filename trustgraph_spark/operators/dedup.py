"""Deduplication operators for large-scale training-data pipelines.

Beyond the reference's PK-dedup (exact quad dedup, cassandra_kg.py:620,637),
these are the document-level dedup family a 100 TB corpus pipeline needs:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

All operators are pure DataFrame programs (portable to a DuckDB oracle):
hashing uses md5 (identical in Spark and DuckDB), tokenization is
whitespace split. Pair generation is always blocked/bucketed — never an
unblocked cross join — so the shuffle is bounded by bucket sizes at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def normalize_text_col(col):
    """lower + collapse whitespace; the canonical form for exact dedup."""
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))


def exact_dedup_groups(
    documents: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Exact duplicate groups by md5 of normalized text: hash-groupBy (one
    shuffle on the 32-char digest, map-side combinable). Returns groups with
    >1 member: (text_hash, n_docs, representative=min id)."""
    return (
        documents.select(
            F.col(id_col), F.md5(normalize_text_col(F.col(text_col))).alias("text_hash")
        )
        .groupBy("text_hash")
        .agg(F.count("*").alias("n_docs"), F.min(id_col).alias("representative"))
        .where(F.col("n_docs") > 1)
    )


def shingles(documents: DataFrame, id_col="doc_id", text_col="text", n: int = 3) -> DataFrame:
    """Token n-gram shingles per document: split -> sliding window via
    a zip_with concat chain -> explode. Pure column expressions.

    The window is built as quality.ngram_array builds grams — one
    element-wise zip_with concat pass per extra token over shifted
    slices — instead of the earlier per-index ``slice + array_join``
    transform: that shape pays ~30µs/gram in Spark's interpreted
    higher-order-function path (it allocates a fresh n-element array
    per gram), measured 11x slower in quality.ngram_array and ~3x on
    this operator's shingle stage at sf1.0.  Trailing zip_with
    null-pads concat to null and are sliced off; docs shorter than n
    tokens slice to an empty array (never a descending sequence).

    The tokenization is materialized as its own projection BEFORE the
    sliding-window transform: a lambda body referencing the outer
    split(regexp_replace(...)) expression re-evaluates it per element
    (no common-subexpression elimination inside higher-order functions),
    i.e. one full regex+split pass per shingle — measured 6.5x slower
    at sf0.1.

    The INNER explode below is deliberate and safe: its child is the
    computed array expression itself, which InferFiltersFromGenerate
    skips (the rule only infers size()>0 for cheap/attribute children).
    The pushed-Filter trap documented in quality.ngram_repetition bites
    only when the exploded array is first BOUND to an attribute — the
    alias substitution is what inlines the chain into a per-row Filter
    (both shapes plan-verified on Spark 4.1).  Do not "fix" this into
    bind-then-inner-explode."""
    tk = F.col("__tk")
    g = tk
    for k in range(1, n):
        g = F.zip_with(
            g,
            F.slice(tk, k + 1, F.greatest(F.size(tk) - k, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b))
    sh = F.slice(g, 1, F.greatest(F.size(tk) - (n - 1), F.lit(0)))
    return documents.select(
        F.col(id_col),
        F.split(normalize_text_col(F.col(text_col)), " ").alias("__tk"),
    ).select(F.col(id_col), F.explode(F.array_distinct(sh)).alias("shingle"))


def ngram_jaccard_pairs(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Exact-Jaccard near-duplicate pairs.  Public entry point — routes to
    the AllPairs/PPJoin prefix-filtered implementation
    (ngram_jaccard_pairs_prefix), which produces the identical result set
    (asserted across thresholds in test_dedup_bruteforce) without the
    hot-shingle ~df^2 candidate term of the plain inverted-index join.
    The superseded plain-index body survives as
    _ngram_jaccard_pairs_invindex for parity testing only."""
    return ngram_jaccard_pairs_prefix(
        documents, id_col, text_col, n, threshold, max_shingle_freq
    )


def _ngram_jaccard_pairs_invindex(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int = 1000,
) -> DataFrame:
    """Near-duplicate pairs by shingle-set Jaccard: inverted-index join on
    shingle (each shingle a blocking key; hot shingles above
    max_shingle_freq dropped as stop-shingles), count intersections per
    pair, then |A∩B| / (|A|+|B|-|A∩B|) >= threshold.

    Superseded by ngram_jaccard_pairs_prefix (the public
    ngram_jaccard_pairs routes there): this body carries a ~per-shingle
    df^2 candidate term that the prefix filter eliminates. Kept private as
    the independent implementation for the prefix==exact parity test.

    The score is the exact Jaccard of the KEPT-shingle sets (sizes and
    intersections both computed post-stop-shingle-filter) — computing sizes
    pre-filter would systematically underestimate similarity for documents
    containing hot shingles."""
    sh = shingles(documents, id_col, text_col, n)

    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh_kept = sh.join(
        F.broadcast(freq.where(F.col("df") > max_shingle_freq).select("shingle")),
        "shingle",
        "left_anti",
    )
    sizes = sh_kept.groupBy(id_col).agg(F.count("*").alias("sz"))

    a = sh_kept.select(F.col(id_col).alias("id_a"), "shingle")
    b = sh_kept.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("sz").alias("sz_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("sz").alias("sz_b")), "id_b")
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def ngram_jaccard_pairs_prefix(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_freq: int = 1000,
    counters: dict | None = None,
) -> DataFrame:
    """Exact-Jaccard near-dup pairs with AllPairs/PPJoin prefix filtering
    (Bayardo et al., WWW'07) — the 100x-scale path for the same result set
    as ngram_jaccard_pairs (asserted equal in tests).

    counters: pass a dict to record ``candidate_pairs`` (the post-filter
    pre-verification candidate count — the quantity whose growth rate
    proves the prefix filter scales; forces an extra checkpoint+count, so
    bench/diagnostics only).

    Candidate generation indexes only each document's PREFIX: with shingles
    globally ordered by ascending document frequency (rarest first), a pair
    with Jaccard >= t must share a shingle among each side's first
    |d| - ceil(t*|d|) + 1 shingles. The inverted-index join therefore
    touches the rare end of the df distribution — pair blowup shrinks by
    ~(1-t)^2 and the hot-shingle quadratic term disappears from candidate
    generation entirely. Verification computes the exact intersection with
    one array_intersect over the two docs' (small) kept-shingle arrays —
    two hash joins on doc id, no pair-x-shingle shuffle, no groupBy of the
    candidate blowup.

    Same kept-set semantics as ngram_jaccard_pairs: stop-shingles with
    df > max_shingle_freq are dropped before sizes, prefixes, and
    intersections.

    Shingles are hashed to 64-bit keys immediately after generation: every
    downstream shuffle (df count, doc grouping, prefix index) and the
    verify-stage array_intersect move 8-byte longs instead of variable-
    length strings — at corpus scale this is most of the operator's bytes.
    Collisions (~n^2/2^65) are far below hardware error rates; equality to
    the string-keyed exact path is asserted in tests. The AllPairs prefix
    only needs a single consistent global order — rarest-first with hash
    tie-break serves."""
    sh = shingles(documents, id_col, text_col, n).select(
        F.col(id_col), F.xxhash64("shingle").alias("shingle")
    )
    # materialize the shingle set ONCE: it feeds the df count, the
    # stop-shingle anti-join and (via docs_arr) four downstream joins —
    # unchecked, Catalyst re-runs the whole split/slice/explode chain per
    # reference (~5x measured at sf0.1; 19s -> ~6s for the operator)
    sh = sh.localCheckpoint()
    freq = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    sh_kept = sh.join(
        F.broadcast(freq.where(F.col("df") > max_shingle_freq).select("shingle")),
        "shingle",
        "left_anti",
    ).join(freq, "shingle")

    # per-doc kept shingles ordered rarest-first (df, then hash for
    # determinism); one shuffle on doc id
    docs_arr = (
        sh_kept.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("sh_sorted")
        )
        .withColumn("sz", F.size("sh_sorted"))
        # prefix length |d| - ceil(t*|d|) + 1
        .withColumn(
            "prefix",
            F.slice(
                "sh_sorted",
                1,
                (F.col("sz") - F.ceil(F.lit(threshold) * F.col("sz")) + 1).cast("int"),
            ),
        )
        # referenced by both sides of the index self-join AND both verify
        # joins — materialize instead of recomputing the groupBy 4x
        .localCheckpoint()
    )

    idx = docs_arr.select(
        F.col(id_col),
        F.col("sz"),
        F.posexplode("prefix").alias("pos", "shingle"),
    )
    # Two PPJoin filters inside the index join, before the distinct:
    # - length filter (AllPairs): J(A,B) >= t forces t*|A| <= |B| <= |A|/t;
    # - positional filter (PPJoin proper): a shared prefix token at
    #   0-based sorted positions (i, j) bounds the overlap by
    #   min(|A|-i, |B|-j) (all common tokens sort at-or-after the shared
    #   one), and J >= t needs overlap >= t*(|A|+|B|)/(1+t).  A true
    #   positive always passes at its FIRST common token, so keeping
    #   pairs where ANY shared token passes is lossless (asserted vs the
    #   plain-index path in tests) while pruning candidates whose shared
    #   tokens sit too deep in either prefix.
    cand = (
        idx.alias("a")
        .join(idx.alias("b"), "shingle")
        .where(
            (F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            & (F.col("b.sz") >= F.lit(threshold) * F.col("a.sz"))
            & (F.col("a.sz") >= F.lit(threshold) * F.col("b.sz"))
            & (
                F.least(
                    F.col("a.sz") - F.col("a.pos"), F.col("b.sz") - F.col("b.pos")
                )
                >= F.lit(threshold) / (1.0 + threshold)
                * (F.col("a.sz") + F.col("b.sz"))
            )
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )
    if counters is not None:
        cand = cand.localCheckpoint()
        counters["candidate_pairs"] = cand.count()

    sets = docs_arr.select(F.col(id_col), "sh_sorted", "sz")
    # inter is nd_guard-pinned: without it, predicate pushdown folds the
    # jaccard filter into the verify JOIN CONDITION with array_intersect
    # inlined — 3 intersect evaluations per candidate pair instead of 1
    # (plan-confirmed; ~2x the verify stage at sf1.0, where candidates
    # run to ~25M pairs at threshold 0.3)
    from trustgraph_spark.operators.catalyst import nd_guard

    verified = (
        cand.join(
            sets.select(
                F.col(id_col).alias("id_a"),
                F.col("sh_sorted").alias("sh_a"),
                F.col("sz").alias("sz_a"),
            ),
            "id_a",
        )
        .join(
            sets.select(
                F.col(id_col).alias("id_b"),
                F.col("sh_sorted").alias("sh_b"),
                F.col("sz").alias("sz_b"),
            ),
            "id_b",
        )
        .withColumn("inter",
                    nd_guard(F.size(F.array_intersect("sh_a", "sh_b"))))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return verified


#: Mersenne prime 2^31 - 1 — the affine-permutation modulus.  Residues
#: stay below 2^31, so a*x + b never exceeds 2^62 and is safe under
#: Spark 4.1's ANSI bigint arithmetic (and replays exactly in DuckDB).
MINHASH_PRIME = 2147483647


def minhash_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic affine coefficients (a_i, b_i), a_i in [1, P-1],
    b_i in [0, P-1], derived from md5 of fixed labels (the shared
    quality.md5_label_int derivation) so both engines (and the DuckDB
    oracles) embed identical literals."""
    from trustgraph_spark.operators.quality import md5_label_int

    out = []
    for i in range(num_hashes):
        a = md5_label_int(f"mh-a{i}") % (MINHASH_PRIME - 1) + 1
        b = md5_label_int(f"mh-b{i}") % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_signatures(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signatures over token shingles with a universal affine
    family (the datasketch scheme): ONE portable base hash per shingle
    x = int(md5(shingle)[:15 hex]) mod P, then h_i(doc) = min over
    shingles of (a_i*x + b_i) mod P.  One md5 + num_hashes codegen'd
    multiply-adds per shingle — the earlier form paid num_hashes full
    md5 passes per shingle (measured 2.8x slower at sf0.1 for 16
    hashes).  md5/conv replay identically in DuckDB
    (('0x' || substr(md5(s),1,15))::BIGINT); min is a
    map-side-combinable agg. Output: (id, sig array<bigint>[num_hashes])."""
    sh = shingles(documents, id_col, text_col, n)
    base = (
        F.conv(F.substring(F.md5(F.col("shingle")), 1, 15), 16, 10)
        .cast("long") % MINHASH_PRIME
    )
    hs = sh.select(F.col(id_col), base.alias("x"))
    aggs = [
        F.min((F.lit(a).cast("long") * F.col("x") + F.lit(b)) % MINHASH_PRIME)
        .alias(f"h{i}")
        for i, (a, b) in enumerate(minhash_coeffs(num_hashes))
    ]
    sig = hs.groupBy(id_col).agg(*aggs)
    return sig.select(
        F.col(id_col), F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_band_index(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """The LSH band index (id, band, band_sig): the signature sliced
    into ``bands`` bands of num_hashes/bands rows. This is the
    PERSISTED face of the archive for incremental dedup — written once
    (bucketed on (band, band_sig) at scale) so daily increments probe
    it with an equi-join and never recompute archive signatures.

    Index-version note: band_sig values are a function of the hash
    scheme (since the affine-family rewrite: joined bigint residues,
    previously joined md5 strings).  An archive index persisted under
    a different scheme never collides with fresh probes — rebuild the
    index when the scheme (or n/num_hashes/bands) changes."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(documents, id_col, text_col, n, num_hashes)
    return sig.select(
        F.col(id_col),
        F.posexplode(
            F.array(
                *[
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), i * rows_per_band + 1,
                                    rows_per_band),
                            lambda c: c.cast("string"),
                        ),
                        "|",
                    )
                    for i in range(bands)
                ]
            )
        ).alias("band", "band_sig"),
    )


def minhash_lsh_candidates(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """MinHash-LSH candidate pairs: slice the signature into ``bands`` bands
    of num_hashes/bands rows, bucket-join on (band index, band value) —
    a pair collides if ANY band matches. Returns distinct (id_a, id_b)."""
    banded = minhash_band_index(
        documents, id_col, text_col, n, num_hashes, bands)
    a = banded.select(F.col(id_col).alias("id_a"), "band", "band_sig")
    b = banded.select(F.col(id_col).alias("id_b"), "band", "band_sig")
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


def incremental_lsh_candidates(
    archive_index: DataFrame,
    new_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    validate_archive_scheme: bool = True,
) -> DataFrame:
    """Incremental dedup: a NEW batch against a persisted archive band
    index (minhash_band_index output) plus within-batch pairs — the
    daily-increment shape a 100 TB corpus actually needs. The archive
    side is never re-read as text and never re-hashed: only its
    (id, band, band_sig) index joins, partition-prunable when bucketed
    on the band key; the new batch (typically orders of magnitude
    smaller) is hashed once and probes both itself and the index.

    Returns (new_id, match_id, source) with source 'archive' or
    'batch'; batch pairs are ordered new_id < match_id. No reference
    analog — the reference dedupes nothing; brief-mandated
    training-data-pipeline operator, same family as
    minhash_lsh_candidates.

    ``validate_archive_scheme`` (default on) probes ONE archive row and
    rejects band_sig values that are not joined decimal residues — an
    index persisted under the pre-affine scheme (joined md5 hex) would
    otherwise never match any probe and silently admit every archive
    duplicate.  The probe is a single bounded head(1) action; pass
    False to keep the call fully lazy (e.g. inside a stream planner
    that validated the index at startup)."""
    if validate_archive_scheme:
        import re as _re

        probe = archive_index.select("band_sig").head(1)
        if probe and probe[0][0] is not None and not _re.fullmatch(
                r"\d+(\|\d+)*", probe[0][0]):
            raise ValueError(
                "archive_index band_sig %r is not the affine-family "
                "scheme (joined decimal residues) — the index was "
                "persisted under a different hash scheme (or a "
                "different n/num_hashes/bands); rebuild it with "
                "minhash_band_index before probing, or a stale index "
                "would silently match nothing." % (probe[0][0][:40],))
    new_banded = minhash_band_index(
        new_docs, id_col, text_col, n, num_hashes, bands)
    a = new_banded.select(
        F.col(id_col).alias("new_id"), "band", "band_sig")
    vs_archive = (
        a.join(
            archive_index.select(
                F.col(id_col).alias("match_id"), "band", "band_sig"),
            ["band", "band_sig"])
        .select("new_id", "match_id")
        .distinct()
        .withColumn("source", F.lit("archive"))
    )
    b = new_banded.select(
        F.col(id_col).alias("match_id"), "band", "band_sig")
    within = (
        a.join(b, ["band", "band_sig"])
        .where(F.col("new_id") < F.col("match_id"))
        .select("new_id", "match_id")
        .distinct()
        .withColumn("source", F.lit("batch"))
    )
    return vs_archive.unionByName(within)


def simhash(
    documents: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 32,
) -> DataFrame:
    """SimHash fingerprints: per token take md5-derived bit pattern, sum
    +1/-1 per bit position weighted by term frequency, sign -> bit.
    Expressed as token explode + per-bit conditional agg (no UDF).
    Output: (id, simhash bigint)."""
    toks = documents.select(
        F.col(id_col),
        F.explode(F.split(normalize_text_col(F.col(text_col)), " ")).alias("tok"),
    ).where(F.col("tok") != "")
    # 32 hex chars = 128 bits; take the low `bits` via conv of hex nibbles
    hashed = toks.withColumn("h", F.md5(F.col("tok")))
    aggs = []
    for i in range(bits):
        nibble = F.conv(F.substring("h", (i // 4) + 1, 1), 16, 10).cast("int")
        bit = F.shiftright(nibble, i % 4).bitwiseAND(F.lit(1))
        aggs.append(F.sum(F.when(bit == 1, 1).otherwise(-1)).alias(f"b{i}"))
    sums = hashed.groupBy(id_col).agg(*aggs)
    fp = F.lit(0).cast("long")
    for i in range(bits):
        fp = fp + F.when(F.col(f"b{i}") > 0, F.lit(2**i).cast("long")).otherwise(F.lit(0).cast("long"))
    return sums.select(F.col(id_col), fp.alias("simhash"))


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, LSH-bucketed: bucket by
    hyperplane signature then exact cosine within buckets — the blocked
    self-join never goes all-pairs.

    The vector NORM is computed once per vector before the self-join and
    carried through it, so each candidate pair pays only the dot-product
    fold instead of three (dot + both norms re-folded per pair — the
    pair side is quadratic in bucket occupancy, the vector side linear;
    measured ~2x on the pair stage at sf1.0).  ``dot/(na*nb)`` with the
    identical per-vector fold is bit-for-bit the cosine _cosine_expr
    computes."""
    from .embeddings import lsh_signature_col, random_hyperplanes

    planes = random_hyperplanes(dim, n_planes)
    vec_d = F.col(vec_col).cast("array<double>")
    v = embeddings.select(
        F.col(id_col),
        vec_d.alias("_vd"),
        lsh_signature_col(F.col(vec_col), planes).alias("bucket"),
        F.sqrt(F.aggregate(vec_d, F.lit(0.0), lambda s, x: s + x * x))
        .alias("_norm"),
    )
    a = v.select(F.col(id_col).alias("id_a"), F.col("_vd").alias("vec_a"),
                 F.col("_norm").alias("_na"), "bucket")
    b = v.select(F.col(id_col).alias("id_b"), F.col("_vd").alias("vec_b"),
                 F.col("_norm").alias("_nb"), "bucket")
    from trustgraph_spark.operators.catalyst import nd_guard

    dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"), lambda x, y: x * y),
        F.lit(0.0), lambda s, x: s + x)
    # nd_guard: the threshold filter would otherwise push into the
    # bucket join's condition with the dot fold inlined (one extra
    # evaluation per candidate pair — see catalyst.nd_guard)
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            nd_guard(
                F.when((F.col("_na") > 0) & (F.col("_nb") > 0),
                       dot / (F.col("_na") * F.col("_nb")))
                .otherwise(F.lit(0.0))))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def resolve_duplicates(
    documents: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "a",
    b_col: str = "b",
) -> DataFrame:
    """End-to-end duplicate RESOLUTION: verified duplicate pairs (from
    any of this module's candidate generators — MinHash-LSH, PPJoin,
    SimHash, embedding buckets) -> duplicate clusters -> one canonical
    per cluster -> per-doc verdict (doc_id, canonical_id, cluster_size,
    is_canonical).  Keeping ``is_canonical`` rows IS the dedup'd corpus.

    Clusters come from linking.connected_components (the alternating-
    star algorithm, O(log n) checkpointed rounds — duplicate chains
    a~b~c collapse even when (a, c) was never a candidate pair).  The
    canonical is the cluster's minimum PRESENT doc id — deterministic
    under any partitioning, and pair ids absent from documents (stale
    candidates over a filtered corpus) can participate in clustering
    without ever being elected, so every cluster keeps exactly one
    is_canonical survivor.  Docs in no pair are their own singleton
    canonicals (left join + coalesce, no data lost)."""
    from trustgraph_spark.operators.linking import connected_components

    cc = connected_components(pairs, src=a_col, dst=b_col)
    docs = documents.select(F.col(id_col).alias("doc_id"))
    comp = (docs
            .join(cc.withColumnRenamed("node", "doc_id"), "doc_id", "left")
            .select("doc_id",
                    F.coalesce("component", F.col("doc_id"))
                    .alias("comp")))
    # elect the canonical among PRESENT docs: a stale pair id absent
    # from documents must never become the canonical (it would leave
    # its whole cluster without an is_canonical survivor)
    canon = comp.groupBy("comp").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("cluster_size"))
    return (comp.join(canon, "comp")
            .select("doc_id", "canonical_id",
                    F.col("cluster_size").cast("long").alias("cluster_size"),
                    (F.col("doc_id") == F.col("canonical_id"))
                    .alias("is_canonical")))
