"""Gopher-style corpus quality rules — the repetition and document
filters a pre-training data pipeline applies before anything reaches a
tokenizer (published in Rae et al. 2021, "Scaling Language Models:
Methods, Analysis & Insights from Training Gopher", appendix A1.1;
the same rule family ships in public corpus tooling).  Complements
textstats.quality_score (length/stopword/punct ratios) with the
line-structure and repetition rules that catch boilerplate and
auto-generated spam.

Two operators, two execution shapes, both UDF-free:

* :func:`gopher_doc_metrics` — every per-document rule that needs no
  cross-row state: word count bounds, mean word length, symbol-to-word
  ratio, bullet / ellipsis line fractions, alphabetic-word fraction,
  stopword hits, duplicate-line fraction and duplicate-line character
  fraction (computed per row with ``array_distinct`` — O(lines)),
  plus the combined ``gopher_pass`` verdict.  ONE narrow projection,
  no shuffle: at 100 TB this runs at scan speed.

* :func:`ngram_repetition` — the top-n-gram and duplicated-n-gram
  character fractions.  N-grams travel as 62-bit polynomial hashes +
  exact char lengths (``ngram_hash_folds`` — one md5 per word, one
  shared zip_with multiply-add chain for every n; gram strings are
  never built), then ONE explode feeds a map-side-combinable
  (doc, n, key) count whose per-(doc, n) rollup joins back to the
  per-doc character denominator.  Keys are (doc, gram-hash) so the
  shuffle cannot skew onto a hot key even when one document dominates.

Exact formulas (mirrored by the driver oracle; the paper's prose
leaves room, so this module PINS the semantics):

* words = lowercased whitespace tokens; ``denom`` = characters of the
  words joined with single spaces.
* top_ngram_char_fraction(n)  = max over grams of count·len(gram) / denom
* dup_ngram_char_fraction(n)  = sum over grams with count > 1 of
  count·len(gram) / denom
* duplicate_line_fraction      = (lines - distinct lines) / lines
* duplicate_line_char_fraction = (line chars - distinct line chars) /
  line chars  (characters in occurrences after the first)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Gopher A1.1 thresholds
MIN_WORDS = 50
MAX_WORDS = 100_000
MIN_MEAN_WORD_LEN = 3.0
MAX_MEAN_WORD_LEN = 10.0
MAX_SYMBOL_WORD_RATIO = 0.1
MAX_BULLET_LINE_FRACTION = 0.9
MAX_ELLIPSIS_LINE_FRACTION = 0.3
MIN_ALPHA_WORD_FRACTION = 0.8
MIN_STOPWORD_HITS = 2

GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")

# The bullet rule is the regex class '^[•‣▶*\-]' inline in
# gopher_metric_exprs (and mirrored verbatim in the DuckDB oracle) —
# the pinned artifact is the pattern string itself, not a token list.


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def _lines(text: Column) -> Column:
    return F.filter(F.transform(F.split(text, "\n"), F.trim),
                    lambda x: x != "")


def _safe_div(num: Column, den: Column) -> Column:
    return F.round(F.when(den > 0, num.cast("double") / den)
                   .otherwise(F.lit(0.0)), 4)


def gopher_metric_exprs(t: Column) -> dict[str, Column]:
    """The nine Gopher rule metrics as named column expressions over a
    text column — reused by the batch projection and the streaming
    hygiene path (a plain dict of Columns composes onto any frame
    without a join)."""
    words = _words(t)
    n_words = F.size(words)
    word_chars = F.aggregate(words, F.lit(0),
                             lambda acc, w: acc + F.length(w))
    mean_word_len = _safe_div(word_chars, n_words)

    n_symbols = (F.length(t) - F.length(F.regexp_replace(t, "#", ""))
                 + F.regexp_count(t, F.lit(r"\.\.\."))
                 + F.regexp_count(t, F.lit("…")))
    symbol_word_ratio = _safe_div(n_symbols, n_words)

    alpha_words = F.size(F.filter(words,
                                  lambda w: w.rlike("[a-zA-Z]")))
    alpha_word_fraction = _safe_div(alpha_words, n_words)

    sw = F.array(*[F.lit(w) for w in GOPHER_STOPWORDS])
    stopword_hits = F.size(F.filter(
        sw, lambda s: F.array_contains(words, s)))

    lines = _lines(t)
    n_lines = F.size(lines)
    bullets = F.size(F.filter(lines, lambda ln: ln.rlike("^[•‣▶*\\-]")))
    ellipses = F.size(F.filter(
        lines, lambda ln: ln.endswith("...") | ln.endswith("…")))
    bullet_line_fraction = _safe_div(bullets, n_lines)
    ellipsis_line_fraction = _safe_div(ellipses, n_lines)

    line_chars = F.aggregate(lines, F.lit(0),
                             lambda acc, ln: acc + F.length(ln))
    distinct_lines = F.array_distinct(lines)
    distinct_line_chars = F.aggregate(distinct_lines, F.lit(0),
                                      lambda acc, ln: acc + F.length(ln))
    duplicate_line_fraction = _safe_div(
        n_lines - F.size(distinct_lines), n_lines)
    duplicate_line_char_fraction = _safe_div(
        line_chars - distinct_line_chars, line_chars)

    return {
        "n_words": n_words,
        "mean_word_len": mean_word_len,
        "symbol_word_ratio": symbol_word_ratio,
        "bullet_line_fraction": bullet_line_fraction,
        "ellipsis_line_fraction": ellipsis_line_fraction,
        "alpha_word_fraction": alpha_word_fraction,
        "stopword_hits": stopword_hits,
        "duplicate_line_fraction": duplicate_line_fraction,
        "duplicate_line_char_fraction": duplicate_line_char_fraction,
    }


def gopher_pass_col(t: Column) -> Column:
    """The combined verdict over the (rounded) metric expressions —
    identical to the flag gopher_doc_metrics emits."""
    m = gopher_metric_exprs(t)
    return ((m["n_words"] >= MIN_WORDS)
            & (m["n_words"] <= MAX_WORDS)
            & (m["mean_word_len"] >= MIN_MEAN_WORD_LEN)
            & (m["mean_word_len"] <= MAX_MEAN_WORD_LEN)
            & (m["symbol_word_ratio"] <= MAX_SYMBOL_WORD_RATIO)
            & (m["bullet_line_fraction"] <= MAX_BULLET_LINE_FRACTION)
            & (m["ellipsis_line_fraction"] <= MAX_ELLIPSIS_LINE_FRACTION)
            & (m["alpha_word_fraction"] >= MIN_ALPHA_WORD_FRACTION)
            & (m["stopword_hits"] >= MIN_STOPWORD_HITS))


def gopher_doc_metrics(documents: DataFrame, id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """Per-document Gopher rules as one narrow projection (no shuffle,
    no UDF) — metrics plus the combined ``gopher_pass`` flag."""
    t = F.col(text_col)
    metrics = gopher_metric_exprs(t)
    return documents.select(
        F.col(id_col),
        *[c.alias(name) for name, c in metrics.items()],
        gopher_pass_col(t).alias("gopher_pass"),
    )


def ngram_array(words: Column, n: int) -> Column:
    """Array of space-joined n-grams, built as a zip_with chain of
    shifted arrays — one element-wise concat pass per extra token.
    The obvious per-index ``slice + array_join`` costs ~30µs/gram in
    Spark's interpreted higher-order-function path (measured 21s for
    0.77M grams); this formulation is ~11x faster because each gram
    is O(n) cheap concats, no per-gram array allocation.  Documents
    shorter than n words yield an empty array (the trailing zip_with
    null-pads are sliced off), never a descending sequence."""
    g = words
    for k in range(1, n):
        g = F.zip_with(
            g,
            F.slice(words, k + 1,
                    F.greatest(F.size(words) - k, F.lit(0))),
            lambda a, b: F.concat(a, F.lit(" "), b))
    return F.slice(g, 1, F.greatest(F.size(words) - (n - 1), F.lit(0)))


#: modulus of the n-gram polynomial hash lanes (2^31 - 1 — products of
#: two residues stay under 2^62, inside int64 with Spark 4.1 ANSI on)
NGRAM_PRIME = 2147483647


def md5_label_int(label: str) -> int:
    """First 8 hex chars of md5(label) as an int — the shared
    deterministic-literal derivation for hash-family coefficients
    (the n-gram lane bases here, the MinHash affine family in
    operators/dedup.minhash_coeffs): reproducible by any engine and
    embedded as plain literals in the DuckDB oracles."""
    import hashlib

    return int(hashlib.md5(label.encode()).hexdigest()[:8], 16)


def _poly_consts(lane: str, max_n: int) -> list[int]:
    """c^k mod P for k in [0, max_n), with the lane's base c derived
    from md5 of a fixed label — deterministic literals, reproducible by
    any engine."""
    c = md5_label_int(lane) % (NGRAM_PRIME - 2) + 2
    out, acc = [], 1
    for _ in range(max_n):
        out.append(acc)
        acc = (acc * c) % NGRAM_PRIME
    return out


def ngram_digests(words: Column) -> Column:
    """One md5 hex digest per word — the shared input of BOTH hash
    lanes.  MUST be bound to an attribute (its own select stage)
    before :func:`ngram_lanes_from_digests` references it twice:
    Catalyst expression trees duplicate per reference and
    higher-order-function bodies are excluded from codegen
    subexpression elimination, so an unbound digest transform re-runs
    the md5 pass once per lane (and drags the word-split chain along
    with it)."""
    return F.transform(words, F.md5)


def ngram_lanes_from_digests(digests: Column) -> tuple:
    """Two independent 31-bit lanes from the BOUND digest attribute
    (hex [1:15] and [17:31] of the same md5).  The returned lane
    expressions must themselves be bound to attributes before
    :func:`ngram_hash_folds` folds over them — the fold references
    each lane once per step (measured 5x slower end-to-end at sf0.1
    for n=13 when unbound).  CollapseProject keeps both select-stage
    boundaries because the digest/lane aliases are non-cheap and
    multi-referenced."""
    p = F.lit(NGRAM_PRIME).cast("long")
    x1 = F.transform(digests, lambda h: F.conv(
        F.substring(h, 1, 15), 16, 10).cast("long") % p)
    x2 = F.transform(digests, lambda h: F.conv(
        F.substring(h, 17, 15), 16, 10).cast("long") % p)
    return x1, x2


def word_length_lane(words: Column) -> Column:
    """Per-word character lengths — the optional length lane of
    :func:`ngram_hash_folds`."""
    return F.transform(words, lambda w: F.length(w).cast("long"))


def ngram_hash_folds(x1: Column, x2: Column,
                     ns: tuple, wl: Column = None) -> list[tuple]:
    """Per-n n-gram KEYS (62-bit hash) and character LENGTHS without
    ever materializing gram strings: the bound lane attributes from
    :func:`ngram_lanes_from_digests` feed one incremental zip_with fold of
    multiply-adds that grows the polynomial hash from n to n+1 — so
    all the requested n share a single chain.  Returns
    [(n, keys, lens), ...] where keys[i] = H1(i)*2^31 + H2(i),
    H_j(i) = sum_k x_j[i+k]*c_j^k mod P, and lens[i] = the exact
    character length of the space-joined gram (sum of word lengths +
    n-1; ``None`` when no ``wl`` lane is passed — callers that only
    need gram IDENTITY, decontam and span dedup, skip the whole
    length lane).

    Collisions: two lanes give 62 effective bits; a document of G
    grams collides internally with probability ~G^2/2^63 (~5e-13 at
    G=3,000), and a 10M x 10M train-vs-eval key intersection expects
    ~2e-5 false hits — both far below any measurable effect on the
    count/fraction outputs these keys feed (the DuckDB oracles group
    by the actual gram strings, so a collision would surface as a gate
    hash mismatch)."""
    with_len = wl is not None
    max_n = max(ns)
    p = F.lit(NGRAM_PRIME).cast("long")
    c1 = _poly_consts("ngram-lane1", max_n)
    c2 = _poly_consts("ngram-lane2", max_n)
    size = F.size(x1)

    # PySpark derives HOF arity from the lambda's parameter count, so
    # constants must be captured via a closure factory, never as
    # default args (a 3-param lambda breaks zip_with).
    def _mul_add(cst: int):
        return lambda a, b: (a + b * F.lit(cst).cast("long")) % p

    g1, g2, gl = x1, x2, wl
    out = []
    for k in range(max_n):
        if k > 0:
            tail = F.greatest(size - k, F.lit(0))
            g1 = F.zip_with(g1, F.slice(x1, k + 1, tail), _mul_add(c1[k]))
            g2 = F.zip_with(g2, F.slice(x2, k + 1, tail), _mul_add(c2[k]))
            if with_len:
                gl = F.zip_with(
                    gl, F.slice(wl, k + 1, tail),
                    lambda a, b: a + b + 1)
        n = k + 1
        if n in ns:
            cnt = F.greatest(size - k, F.lit(0))
            keys = F.zip_with(
                F.slice(g1, 1, cnt), F.slice(g2, 1, cnt),
                lambda a, b: a * F.lit(1 << 31).cast("long") + b)
            out.append((n, keys,
                        F.slice(gl, 1, cnt) if with_len else None))
    return out


def _ngram_structs(x1: Column, x2: Column, wl: Column,
                   ns: tuple) -> Column:
    def _mk(n: int):
        return lambda h, le: F.struct(
            F.lit(n).alias("n"), h.alias("h"), le.alias("len"))

    return F.concat(*[
        F.zip_with(keys, lens, _mk(n))
        for n, keys, lens in ngram_hash_folds(x1, x2, ns, wl=wl)])


def ngram_repetition(documents: DataFrame, ns: tuple = (2, 3, 4),
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Top-/duplicated-n-gram character fractions, long format:
    one row per (doc, n).  One explode -> one (doc, n, key) count
    (map-side combinable) -> one (doc, n) rollup joined to the per-doc
    denominator.  Grams travel as 16-byte (hash, len) pairs from
    ngram_hash_folds, never as strings — the shuffle row shrinks ~4x
    and the gram build skips all string concatenation.  Three bound
    select stages (words -> digests -> lanes): each alias is expensive
    and referenced more than once downstream, and Catalyst duplicates
    expression trees per reference (see ngram_digests /
    ngram_lanes_from_digests), so every bind saves a full re-run of
    the chain below it — the split pass runs once instead of 4x, the
    md5 pass once instead of 2x."""
    t = F.col(text_col)
    toks = documents.select(
        F.col(id_col).alias("doc_id"), _words(t).alias("_w"))
    w = F.col("_w")
    dg = toks.select(
        "doc_id",
        F.length(F.array_join(w, " ")).alias("denom"),
        ngram_digests(w).alias("_dg"),
        word_length_lane(w).alias("_wl"),
    )
    x1, x2 = ngram_lanes_from_digests(F.col("_dg"))
    lanes = dg.select(
        "doc_id", "denom",
        x1.alias("_x1"), x2.alias("_x2"), "_wl",
    )
    base = lanes.select(
        "doc_id", "denom",
        _ngram_structs(F.col("_x1"), F.col("_x2"), F.col("_wl"),
                       ns).alias("grams"),
    )
    # denom rides the grouping keys (functionally dependent on doc_id):
    # saves a second corpus scan + join-back for an extra 8B per
    # shuffle row
    # explode_OUTER + a post-Generate null filter, never inner explode:
    # InferFiltersFromGenerate would turn an inner explode into a
    # size(grams) > 0 filter pushed below the lane projection, which
    # inlines the whole fold (lanes included) into a per-row Filter
    # condition — measured 4.5x slower than this shape at sf0.1.
    counts = (base
              .select("doc_id", "denom",
                      F.explode_outer("grams").alias("g"))
              .where(F.col("g").isNotNull())
              .groupBy("doc_id", "denom", F.col("g.n").alias("n"),
                       F.col("g.h").alias("h"), F.col("g.len").alias("len"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    rolled = (counts
              .withColumn("chars", F.col("cnt") * F.col("len"))
              .groupBy("doc_id", "denom", "n")
              .agg(F.max("chars").alias("top_chars"),
                   F.sum(F.when(F.col("cnt") > 1, F.col("chars"))
                         .otherwise(F.lit(0))).alias("dup_chars")))
    return rolled.select(
        "doc_id", "n",
        _safe_div(F.col("top_chars"), F.col("denom"))
        .alias("top_ngram_char_frac"),
        _safe_div(F.col("dup_chars"), F.col("denom"))
        .alias("dup_ngram_char_frac"))
