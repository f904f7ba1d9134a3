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
  character fractions.  N-grams are built natively (``sequence`` +
  ``slice`` + ``array_join``), then ONE explode feeds a map-side-
  combinable (doc, n, gram) count whose per-(doc, n) rollup joins back
  to the per-doc character denominator.  Keys are (doc, gram) so the
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


def _ngram_structs(words: Column, n: int) -> Column:
    return F.transform(
        ngram_array(words, n),
        lambda s: F.struct(F.lit(n).alias("n"), s.alias("gram")))


def ngram_repetition(documents: DataFrame, ns: tuple = (2, 3, 4),
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Top-/duplicated-n-gram character fractions, long format:
    one row per (doc, n).  One explode -> one (doc, n, gram) count
    (map-side combinable) -> one (doc, n) rollup joined to the per-doc
    denominator."""
    t = F.col(text_col)
    words = _words(t)
    base = documents.select(
        F.col(id_col).alias("doc_id"),
        F.length(F.array_join(words, " ")).alias("denom"),
        F.concat(*[_ngram_structs(words, n) for n in ns]).alias("grams"),
    )
    # denom rides the grouping keys (functionally dependent on doc_id):
    # saves a second corpus scan + join-back for an extra 8B per
    # shuffle row
    counts = (base
              .select("doc_id", "denom", F.explode("grams").alias("g"))
              .groupBy("doc_id", "denom", F.col("g.n").alias("n"),
                       F.col("g.gram").alias("gram"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    rolled = (counts
              .withColumn("chars", F.col("cnt") * F.length("gram"))
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
