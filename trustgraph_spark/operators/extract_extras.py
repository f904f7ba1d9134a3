"""Secondary extraction operators: topics (E7), the agent URI dialect (E4),
JSONL parsing (E9), and schema-directed row extraction (E8).
"""

from __future__ import annotations

import json
import re
import urllib.parse
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..constants import (
    DEFAULT_GRAPH,
    DEFINITION,
    OTYPE_LITERAL,
    RDF_LABEL,
    TRUSTGRAPH_ENTITIES,
)
from .extract import Extractor, _explode_triples, _triple_struct


# --- E4: agent URI dialect ---------------------------------------------------


def to_uri_agent_py(text: str) -> str:
    """The kg-extract-agent variant deliberately does NOT lowercase or
    hyphenate (extract/kg/agent/extract.py:114-115): TRUSTGRAPH_ENTITIES +
    quote(text). Documented dialect; E2/E3 semantics are the parity default.
    """
    return TRUSTGRAPH_ENTITIES + urllib.parse.quote(text)


@F.pandas_udf(T.StringType())
def to_uri_agent_udf(texts: pd.Series) -> pd.Series:
    return texts.map(lambda t: None if t is None else TRUSTGRAPH_ENTITIES + urllib.parse.quote(t))


# --- E4: combined type-discriminated agent extraction flow --------------------


class AgentExtractor:
    """Single-prompt agent extraction (extract/kg/agent/extract.py:200-343):
    one agent call per chunk returns mixed JSONL with a 'type' discriminator
    ('definition' | 'relationship'); relationship objects default
    object-entity to True when the key is absent (:307). ``agent_fn`` is the
    LLM boundary: chunk text -> raw JSONL string (fences tolerated; invalid
    lines skipped — truncation resilience via parse_jsonl_py)."""

    def __init__(self, agent_fn):
        self._fn = agent_fn

    def extract_combined(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parse_jsonl_py(self._fn(t or "")))


def extract_agent(chunks: DataFrame, agent: AgentExtractor) -> DataFrame:
    """One mapInPandas pass: agent call -> JSONL parse -> kind-tagged rows
    in the extract_all schema ('def'/'rel'), so split_extractions and the
    triple constructors apply unchanged. Objects without a recognized type
    are dropped (reference categorizes by type and ignores the rest)."""
    from .extract import _ALL_OUT_SCHEMA

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["chunk_id", "root_id", "collection", "kind", "entity",
                "definition", "subject", "predicate", "object", "object_entity"]
        for pdf in batches:
            base = pdf[["chunk_id", "root_id", "collection"]].copy()
            base["obj"] = agent.extract_combined(pdf["text"])
            ex = base.explode("obj").dropna(subset=["obj"])
            # vectorized column unpack (no per-row iterrows loop): split
            # by the type discriminator, pull fields with .str.get
            types = ex["obj"].str.get("type")
            d = ex[types == "definition"].copy()
            d["kind"] = "def"
            d["entity"] = d["obj"].str.get("entity")
            d["definition"] = d["obj"].str.get("definition")
            d["subject"] = None
            d["predicate"] = None
            d["object"] = None
            d["object_entity"] = None
            r = ex[types == "relationship"].copy()
            r["kind"] = "rel"
            r["entity"] = None
            r["definition"] = None
            r["subject"] = r["obj"].str.get("subject")
            r["predicate"] = r["obj"].str.get("predicate")
            r["object"] = r["obj"].str.get("object")
            r["object_entity"] = r["obj"].map(
                lambda o: bool(o.get("object-entity", True)))
            parts = [x[cols] for x in (d, r) if len(x)]
            if parts:
                yield pd.concat(parts, ignore_index=True)
            else:
                yield pd.DataFrame(columns=cols)

    return chunks.select("chunk_id", "root_id", "collection", "text").mapInPandas(
        gen, schema=_ALL_OUT_SCHEMA
    )


def agent_extractions_to_triples(extractions: DataFrame) -> DataFrame:
    """Agent post-processing (extract/kg/agent/extract.py:252-343): the same
    triple shapes as E2/E3 but minted with the agent URI dialect (quote
    only — no lowercase/hyphenation, :114-115)."""
    from .extract import (
        definitions_to_triples,
        relationships_to_triples,
        split_extractions,
    )

    defs, rels = split_extractions(extractions)
    return definitions_to_triples(defs, mint=to_uri_agent_udf).unionByName(
        relationships_to_triples(rels, mint=to_uri_agent_udf)
    )


def agent_entity_contexts(extractions: DataFrame) -> DataFrame:
    """The agent flow emits ONE EntityContext per definition (context =
    definition only, extract.py:295-298) — unlike E2's name+definition
    pair."""
    from .extract import split_extractions

    defs, _ = split_extractions(extractions)
    d = defs.where(
        F.col("entity").isNotNull()
        & (F.col("entity") != "")
        & F.col("definition").isNotNull()
        & (F.col("definition") != "")
    ).withColumn("entity_uri", to_uri_agent_udf(F.col("entity")))
    return d.select(
        "collection", "entity_uri", F.col("definition").alias("context"), "chunk_id"
    )


# --- E7: topics extractor ----------------------------------------------------


def topics_to_triples(topics: DataFrame) -> DataFrame:
    """kg-extract-topics (extract/kg/topics/extract.py:31-143): objects
    {topic, definition} -> label + skos:definition triples for the minted
    topic URI (same E1 dialect); empty/None filtered. Input schema:
    (chunk_id, root_id, collection, topic, definition)."""
    from ..uris import to_uri_udf

    d = topics.where(
        F.col("topic").isNotNull()
        & (F.col("topic") != "")
        & F.col("definition").isNotNull()
        & (F.col("definition") != "")
    ).withColumn("t_uri", to_uri_udf(F.col("topic")))
    arr = F.array(
        _triple_struct(F.col("t_uri"), F.lit(RDF_LABEL), F.col("topic"), F.lit(OTYPE_LITERAL)),
        _triple_struct(F.col("t_uri"), F.lit(DEFINITION), F.col("definition"), F.lit(OTYPE_LITERAL)),
    )
    return _explode_triples(d, arr)


# --- E9: resilient JSONL parsing ---------------------------------------------

_FENCE_RE = re.compile(r"^```(?:json)?\s*|```\s*$", re.MULTILINE)


def parse_jsonl_py(text: str) -> list[dict]:
    """Reference JSONL contract (template/prompt_manager.py:97-132):
    strip markdown code fences, parse line by line, SKIP invalid lines
    (truncation resilience), keep only JSON objects."""
    if not text:
        return []
    cleaned = _FENCE_RE.sub("", text)
    out = []
    for line in cleaned.splitlines():
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(obj, dict):
            out.append(obj)
    return out


@F.pandas_udf(T.ArrayType(T.StringType()))
def parse_jsonl_udf(texts: pd.Series) -> pd.Series:
    """Vectorized: raw LLM output -> array of canonical JSON object strings
    (downstream from_json applies the typed schema)."""
    return texts.map(
        lambda t: None if t is None else [json.dumps(o, sort_keys=True) for o in parse_jsonl_py(t)]
    )


class JsonlExtractor:
    """LLM-response-shaped extractor: wraps a callable text -> raw JSONL
    string (the prompt/LLM boundary) and applies the resilient parser —
    drop-in for the Extractor protocol when replaying recorded LLM output."""

    def __init__(self, definitions_fn=None, relationships_fn=None):
        self._dfn = definitions_fn or (lambda t: "")
        self._rfn = relationships_fn or (lambda t: "")

    def extract_definitions(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parse_jsonl_py(self._dfn(t or "")))

    def extract_relationships(self, texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: parse_jsonl_py(self._rfn(t or "")))


# --- E8: schema-directed row extraction ---------------------------------------


def validate_rows(
    objects: DataFrame,
    fields: list[dict],
    json_col: str = "obj_json",
) -> DataFrame:
    """kg-extract-rows validation (extract/kg/rows/processor.py:187-245):
    parse each JSON object against a RowSchema — required (primary) fields
    present and non-empty, enum membership enforced, values converted to
    strings. fields: [{name, type, primary?, enum_values?}]. Returns one
    column per field (string, the reference's storage form) plus _valid."""
    schema = T.StructType(
        [T.StructField(f["name"], T.StringType(), True) for f in fields]
    )
    parsed = objects.withColumn("_row", F.from_json(F.col(json_col), schema))
    out = parsed.select(
        "*", *[F.col(f"_row.{f['name']}").alias(f["name"]) for f in fields]
    ).drop("_row")
    valid = F.lit(True)
    for f in fields:
        c = F.col(f["name"])
        if f.get("primary"):
            valid = valid & c.isNotNull() & (c != "")
        if f.get("enum_values"):
            valid = valid & (c.isNull() | c.isin(f["enum_values"]))
    return out.withColumn("_valid", valid)
