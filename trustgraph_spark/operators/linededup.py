"""Corpus-level line deduplication — the C4 / RefinedWeb cleaning step
that removes boilerplate lines repeated ACROSS documents (nav bars,
cookie banners, license headers).  Published semantics: C4 (Raffel et
al. 2020 §2.2) keeps one occurrence of each duplicated span;
RefinedWeb-style filtering drops every copy.  Both policies here via
``keep_first``.

Complements operators/dedup.py, which dedups whole documents; this
operator works at line granularity across the corpus.

Semantics (pinned, mirrored by the DuckDB oracle):

* lines = ``split(text, '\\n')`` kept VERBATIM; the dedup key is the
  trimmed line.
* blank-key lines (whitespace-only) are structural, never deduped.
* a key is "duplicated" when its corpus-wide occurrence count >=
  ``min_count`` (default 2).
* ``keep_first=True`` keeps the globally-first occurrence — minimum
  ``(doc_id, line_pos)`` — and drops the rest; ``False`` drops all.
* cleaned text = kept lines re-joined with ``'\\n'`` in original
  order; docs whose every line is dropped keep an empty string.

Scale shape (the whole point at 100 TB):

* ONE explode (posexplode of the split — no data duplication beyond
  the line rows themselves).
* the occurrence count groups on ``xxhash64(trimmed line)`` — a
  map-side-combinable partial aggregate, so the billion-fold repeated
  cookie-banner line arrives at the reducer as one partial row per
  map task, not a hot key of raw rows.
* first-occurrence election is ``min_by`` on the same grouping —
  same shuffle, no window over the raw line table.
* the verdict joins BACK to the line rows on the hash — an equi-join
  whose build side (duplicated keys only) is a small fraction of the
  corpus and usually broadcastable after the count filter.
* reassembly groups by doc — partitioned on doc_id, no skew (a doc
  has bounded lines).

Hash note: the join key is the 64-bit xxhash64 of the trimmed line,
not the line itself, so shuffle rows stay narrow; collisions would
need ~2^32 DISTINCT boilerplate lines in one corpus (birthday bound)
and the kept-line text itself is never hashed away — a collision can
only mis-classify a line as duplicated, never corrupt output text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def corpus_line_stats(documents: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text",
                      min_count: int = 2) -> DataFrame:
    """Corpus-wide duplicated-line table: one row per line key with
    occurrence count >= min_count — (key_hash, n_occurrences, first
    doc/pos, sample line).  The build side of the dedup join, exposed
    for inspection and for the driver oracle."""
    lines = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("line_pos", "line"),
    ).withColumn("key", F.trim(F.col("line"))).where(F.col("key") != "")
    return (lines
            .groupBy(F.xxhash64("key").alias("key_hash"))
            .agg(F.count(F.lit(1)).alias("n_occurrences"),
                 F.min(F.struct("doc_id", "line_pos")).alias("first"),
                 F.min("key").alias("line_key"))
            .where(F.col("n_occurrences") >= min_count)
            .select("key_hash", "n_occurrences",
                    F.col("first.doc_id").alias("first_doc_id"),
                    F.col("first.line_pos").alias("first_line_pos"),
                    "line_key"))


def corpus_line_dedup(documents: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", min_count: int = 2,
                      keep_first: bool = True) -> DataFrame:
    """Remove corpus-duplicated lines from every document; returns
    (doc_id, text, n_lines_kept, n_lines_dropped)."""
    lines = documents.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), "\n"))
        .alias("line_pos", "line"),
    ).withColumn("key", F.trim(F.col("line")))

    dup = corpus_line_stats(documents, id_col, text_col, min_count)

    flagged = (lines
               .join(dup.withColumnRenamed("key_hash", "kh"),
                     F.xxhash64("key") == F.col("kh"), "left")
               .withColumn(
                   "drop",
                   F.when(F.col("key") == "", F.lit(False))
                   .when(F.col("kh").isNull(), F.lit(False))
                   .otherwise(
                       F.lit(not keep_first)
                       | ~((F.col("doc_id") == F.col("first_doc_id"))
                           & (F.col("line_pos")
                              == F.col("first_line_pos"))))))

    return (flagged
            .groupBy("doc_id")
            .agg(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.when(
                            ~F.col("drop"),
                            F.struct("line_pos", "line")))),
                        lambda s: s["line"]),
                    "\n").alias("text"),
                F.sum(F.when(~F.col("drop"), 1).otherwise(0))
                .cast("long").alias("n_lines_kept"),
                F.sum(F.when(F.col("drop"), 1).otherwise(0))
                .cast("long").alias("n_lines_dropped")))
