"""Text analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure column expressions (JVM-side, whole-stage-codegen'd; no Python in
the hot path) and portable to a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Stopword marker sets per language for the n-gram/stopword heuristic
# language identifier. Deliberately tiny: the operator shape (explode ->
# broadcast join -> per-language hit count -> argmax) is what scales, the
# dictionaries are swappable.
LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "is", "in", "that", "it", "for", "was"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"],
    "fr": ["le", "la", "les", "et", "est", "dans", "que", "pour", "une", "des"],
    "es": ["el", "la", "los", "y", "es", "en", "que", "por", "una", "para"],
}

STOPWORDS_EN = LANG_MARKERS["en"] + ["a", "an", "on", "at", "by", "with", "as", "be"]

# a BPE-ish token approximation: word pieces of letters, digits, or single
# punctuation — a cheap standalone token counter when no tokenizer is at hand
BPEISH_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text_col):
    return F.split(F.trim(F.regexp_replace(F.lower(text_col), r"\s+", " ")), " ")


def token_count(documents: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count per document."""
    t = F.col(text_col)
    ws = F.size(F.filter(tokens_col(t), lambda x: x != ""))
    bpeish = F.size(F.regexp_extract_all(t, F.lit(BPEISH_TOKEN_RE), 0))
    return documents.select(
        F.col(id_col),
        ws.alias("n_tokens_ws"),
        bpeish.alias("n_tokens_bpeish"),
        F.length(t).alias("n_chars"),
    )


def quality_score(documents: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Heuristic quality features: length, mean token length, stopword
    ratio, punctuation ratio, alpha ratio — the standard pre-training
    corpus filters, one narrow projection."""
    t = F.col(text_col)
    toks = F.filter(tokens_col(t), lambda x: x != "")
    n_toks = F.size(toks)
    sw = F.array(*[F.lit(w) for w in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    n_alpha = F.length(t) - F.length(F.regexp_replace(t, r"[A-Za-z]", ""))
    mean_tok_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0), lambda acc, x: acc + F.length(x)) / n_toks,
    ).otherwise(F.lit(0.0))
    return documents.select(
        F.col(id_col),
        F.length(t).alias("n_chars"),
        n_toks.alias("n_tokens"),
        F.round(mean_tok_len, 4).alias("mean_token_len"),
        F.round(
            F.when(n_toks > 0, n_stop / n_toks).otherwise(F.lit(0.0)), 4
        ).alias("stopword_ratio"),
        F.round(
            F.when(F.length(t) > 0, n_punct / F.length(t)).otherwise(F.lit(0.0)), 4
        ).alias("punct_ratio"),
        F.round(
            F.when(F.length(t) > 0, n_alpha / F.length(t)).otherwise(F.lit(0.0)), 4
        ).alias("alpha_ratio"),
    )


def language_id(documents: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Marker-word language ID: per-language hit count over the token set,
    argmax with deterministic tie-break (hit count desc, lang asc);
    CJK-dominant text short-circuits to 'zh'. No UDF: one pass building a
    hits map, then greatest-of."""
    t = F.col(text_col)
    toks = tokens_col(t)
    hits = {}
    for lang, markers in sorted(LANG_MARKERS.items()):
        arr = F.array(*[F.lit(w) for w in markers])
        hits[lang] = F.size(F.filter(toks, lambda x: F.array_contains(arr, x)))
    # explicit argmax chain (first language in asc order wins ties) — the
    # same CASE WHEN is expressible verbatim in an ANSI-SQL oracle
    langs = sorted(LANG_MARKERS)
    expr = None
    for lang in langs:
        cond = (hits[lang] > 0) & F.lit(True)
        for other in langs:
            if other != lang and (other < lang):
                cond = cond & (hits[lang] > hits[other])
            elif other != lang:
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)) if expr is None else expr.when(cond, F.lit(lang))
    cjk = F.length(F.regexp_replace(t, r"[^一-鿿]", ""))
    pred = F.when(cjk * 2 > F.length(t), F.lit("zh")).otherwise(
        expr.otherwise(F.lit("und"))
    )
    return documents.select(F.col(id_col), pred.alias("lang_pred"))


def doc_fingerprint(documents: DataFrame, id_col="doc_id", text_col="text") -> DataFrame:
    """Order-insensitive content fingerprint: md5 of the sorted distinct
    token list — a cheap rolling-hash-style identity for shuffled/reflowed
    duplicates. Portable to DuckDB byte-for-byte."""
    toks = F.array_sort(F.array_distinct(F.filter(tokens_col(F.col(text_col)), lambda x: x != "")))
    return documents.select(
        F.col(id_col), F.md5(F.array_join(toks, " ")).alias("fingerprint")
    )
