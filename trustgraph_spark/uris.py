"""URI minting and entity-name normalization.

``to_uri`` must be bit-exact with the reference extractors
(extract/kg/definitions/extract.py:89-95, relationships/extract.py:80-86):

    TRUSTGRAPH_ENTITIES + urllib.parse.quote(text.replace(" ", "-").lower().encode("utf-8"))

i.e. spaces -> hyphens, Python str.lower(), UTF-8 percent-encoding with
``/`` kept unencoded (quote's default safe='/'; asserted by the reference
test test_relationships_batching.py:392-406). Spark's ``url_encode`` is
application/x-www-form-urlencoded (space->'+', '/'->'%2F') — wrong — so the
exact path is a vectorized pandas UDF (one of the three sanctioned Python
seams, SURVEY.md §2.8).

For inputs known to be URI-safe ASCII (e.g. dictionary-matched mention
tokens), ``to_uri_native`` produces the identical result with pure JVM-side
column expressions — use it on hot paths where the input contract allows.
"""

from __future__ import annotations

import re
import urllib.parse

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .constants import TRUSTGRAPH_ENTITIES


def to_uri_py(text: str) -> str:
    """Reference-exact URI minting (pure Python, used by golden derivation)."""
    part = text.replace(" ", "-").lower().encode("utf-8")
    return TRUSTGRAPH_ENTITIES + urllib.parse.quote(part)


@F.pandas_udf(T.StringType())
def to_uri_udf(texts: pd.Series) -> pd.Series:
    """Vectorized reference-exact URI minting (Arrow-batched)."""
    prefix = TRUSTGRAPH_ENTITIES

    def mint(t):
        if t is None:
            return None
        return prefix + urllib.parse.quote(t.replace(" ", "-").lower().encode("utf-8"))

    return texts.map(mint)


def to_uri_native(col: Column) -> Column:
    """JVM-side URI minting, identical to to_uri_py for inputs whose
    space-hyphenated lowercase form contains only URI-unreserved chars or
    '/' (``[a-z0-9/._~-]``). percent-encoding never fires on such input, so
    lower + replace is the whole transformation.
    """
    return F.concat(
        F.lit(TRUSTGRAPH_ENTITIES),
        F.lower(F.regexp_replace(col, " ", "-")),
    )


# --- ontology-style normalizer (reference: extract/kg/ontology/entity_normalizer.py:11-38)


def normalize_entity_name_py(entity_name: str) -> str:
    normalized = entity_name.lower()
    normalized = re.sub(r"[\s_]+", "-", normalized)
    normalized = re.sub(r"[^\w\-.]", "", normalized)
    normalized = normalized.strip("-")
    normalized = re.sub(r"-+", "-", normalized)
    return normalized


def normalize_entity_name_col(col: Column) -> Column:
    """Native-SQL replica of normalize_entity_name (lower, [\\s_]+ -> '-',
    strip non-word, trim/collapse hyphens). Java regex \\w is ASCII-only while
    Python's is Unicode-aware, so include Unicode letter/digit classes
    explicitly to preserve CJK/accented names exactly like the reference."""
    c = F.lower(col)
    c = F.regexp_replace(c, r"[\s_]+", "-")
    c = F.regexp_replace(c, r"[^\p{L}\p{N}_\-.]", "")
    c = F.regexp_replace(c, r"^-+|-+$", "")
    c = F.regexp_replace(c, r"-+", "-")
    return c
