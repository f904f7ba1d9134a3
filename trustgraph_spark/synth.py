"""Deterministic synthetic transcript corpus.

BASELINE.json's input is an Iceberg table of multi-turn transcripts
(conv_id, turn_idx, role, text, tool, ts). No such table exists in
/root/testdata, so we synthesize it deterministically (seeded, no external
data), fully distributed: the generator is a pure column-expression program
over ``spark.range`` — no driver-side data, no Python UDFs — so it scales to
any row count.

Turn texts embed known entity/definition/relationship mentions following the
reference's mocked-LLM fixture strategy
(tests/integration/test_kg_extract_store_integration.py:34-66): a
deterministic rule-based extractor recovers exactly the planted facts, so
golden triples are computable without an LLM and extraction parity is
measurable as P/R against them.

The corpus deliberately includes hot-conversation skew (conv 0 gets
``hot_factor``x the median turn count) to exercise salted repartitioning,
plus empty turns, no-fact turns, CJK / accented / '/'-containing entity
names to exercise URI encoding (FIXTURES.md §1).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .constants import DEFAULT_COLLECTION
from .uris import to_uri_py

SEED = 42

# Entity vocabulary: includes CJK, accents, '/' (kept unencoded by quote),
# multi-word names, and mixed case — the URI-encoding edge cases from
# reference test test_relationships_batching.py:392-406.
ENTITIES = [
    "Machine Learning",
    "Artificial Intelligence",
    "Spark Engine",
    "Graph Database",
    "TCP/IP Protocol",
    "Naïve Bayes",
    "数据处理",
    "Knowledge Graph",
    "Vector Index",
    "Query Planner",
    "Entity Resolution",
    "Stream Processor",
]

DEFINITIONS = [
    "a subset of artificial intelligence that learns from data",
    "a system that stores entities and relationships",
    "an engine for distributed columnar computation",
    "a method for probabilistic classification",
    "a structure for approximate nearest neighbour search",
    "a component that orders operators for execution",
    "the process of merging duplicate entity records",
    "a service that consumes unbounded event data",
]

REL_VERBS = ["uses", "contains", "extends"]

LITERAL_VALUES = ["42", "high throughput", "release candidate"]

NO_FACT_TEXTS = [
    "ok thanks, proceeding.",
    "let me check on that and get back to you.",
    "",  # empty turn — must produce zero output rows
]

# Conversational filler around the planted facts: realistic turn lengths so
# the extraction cost profile matches real transcripts. Deliberately free of
# every extractable pattern (no "is defined as", no relationship verbs, no
# "produces value") so golden parity is unaffected.
FILLERS = [
    "Thanks for the earlier clarification, that resolved my confusion about the setup.",
    "Before we continue, note that the staging environment was refreshed overnight.",
    "I looked through the logs you sent and most of the warnings appear benign.",
    "Please also double-check the configuration flags we discussed yesterday.",
    "As a reminder, the deadline for the migration plan review was moved to Friday.",
    "The dashboard showed a brief latency spike around noon but it recovered quickly.",
    "For context, the previous attempt failed because a credential had expired.",
    "Let me summarize where we stand so the rest of the team can follow along.",
    "I appreciate the detailed walkthrough, it made the tradeoffs much clearer.",
    "On an unrelated note, the documentation page for the API was updated today.",
    "We should capture this decision in the design notes once the call wraps up.",
    "The test suite finished without regressions after the dependency bump.",
]

ROLES = ["user", "assistant", "tool", "system"]


@dataclass
class SynthSpec:
    n_convs: int = 100
    turns_per_conv: int = 20
    hot_factor: int = 50  # conv 0 gets hot_factor * turns_per_conv turns
    collection: str = DEFAULT_COLLECTION

    @property
    def total_turns(self) -> int:
        return self.n_convs * self.turns_per_conv + (self.hot_factor - 1) * self.turns_per_conv


def _pick(arr: list[str], h, offset: int):
    """Deterministically pick arr[h+offset mod len] as a column expression."""
    exprs = F.array(*[F.lit(x) for x in arr])
    return F.element_at(exprs, (F.pmod(h + F.lit(offset), F.lit(len(arr))) + 1).cast("int"))


def synth_transcripts(spark: SparkSession, spec: SynthSpec | None = None) -> DataFrame:
    """Generate the transcripts table. Pure column expressions over range()."""
    spec = spec or SynthSpec()
    hot_turns = spec.hot_factor * spec.turns_per_conv

    df = spark.range(spec.total_turns)

    # conv 0 is the hot conversation occupying global ids [0, hot_turns);
    # remaining ids map uniformly onto convs 1..n_convs-1.
    in_hot = F.col("id") < hot_turns
    rest = F.col("id") - F.lit(hot_turns)
    conv_num = F.when(in_hot, F.lit(0)).otherwise(
        (rest / spec.turns_per_conv).cast("long") + 1
    )
    turn_idx = F.when(in_hot, F.col("id")).otherwise(
        F.pmod(rest, F.lit(spec.turns_per_conv))
    ).cast("int")

    df = df.select(
        F.concat(F.lit("conv-"), F.format_string("%05d", conv_num)).alias("conv_id"),
        turn_idx.alias("turn_idx"),
    )

    h = F.xxhash64(F.col("conv_id"), F.col("turn_idx"), F.lit(SEED))
    template = F.pmod(h, F.lit(10))

    entity = _pick(ENTITIES, h, 0)
    entity2 = _pick(ENTITIES, h, 5)
    defn = _pick(DEFINITIONS, h, 2)
    verb = _pick(REL_VERBS, h, 1)
    lit_val = _pick(LITERAL_VALUES, h, 3)
    nofact = _pick(NO_FACT_TEXTS, h, 0)

    def_sentence = F.concat(entity, F.lit(" is defined as "), defn, F.lit("."))
    rel_sentence = F.concat(entity, F.lit(" "), verb, F.lit(" "), entity2, F.lit("."))
    litrel_sentence = F.concat(entity, F.lit(" produces value "), lit_val, F.lit("."))

    filler_a = _pick(FILLERS, h, 4)
    filler_b = _pick(FILLERS, h, 9)
    filler_c = _pick(FILLERS, h, 6)

    def wrap(core):
        return F.concat(filler_a, F.lit(" "), core, F.lit(" "), filler_b,
                        F.lit(" "), filler_c)

    text = (
        F.when(template < 3, wrap(def_sentence))
        .when(template < 6, wrap(rel_sentence))
        .when(template < 7, wrap(litrel_sentence))
        .when(template < 9, nofact)
        .otherwise(wrap(F.concat(def_sentence, F.lit(" "), rel_sentence)))
    )

    role = _pick(ROLES, h, 7)
    tool = F.when(role == "tool", F.lit("search")).otherwise(F.lit(""))
    ts = F.timestamp_seconds(F.lit(1700000000) + F.col("turn_idx").cast("long") * 60)

    return df.select(
        "conv_id",
        "turn_idx",
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )


# --- golden derivation (independent pure-Python path, reference semantics) ---

_DEF_RE = re.compile(r"([^.]+?) is defined as (.+?)\.")
_REL_RE = re.compile(r"([^.]+?) (uses|contains|extends) ([^.]+?)\.")
_LITREL_RE = re.compile(r"([^.]+?) produces value ([^.]+?)\.")

from .constants import DEFAULT_GRAPH, DEFINITION, OTYPE_LITERAL, OTYPE_URI, RDF_LABEL  # noqa: E402


def golden_objects(text: str) -> tuple[list[dict], list[dict]]:
    """Parse planted facts out of a turn text — the mocked-LLM contract.

    Returns (definitions, relationships) JSONL-shaped object lists exactly as
    the reference prompt service would (FIXTURES.md §3).
    """
    if not text:
        return [], []
    defs = [
        {"entity": m.group(1).strip(), "definition": m.group(2).strip()}
        for m in _DEF_RE.finditer(text)
    ]
    rels = [
        {
            "subject": m.group(1).strip(),
            "predicate": m.group(2),
            "object": m.group(3).strip(),
            "object-entity": True,
        }
        for m in _REL_RE.finditer(text)
    ]
    rels += [
        {
            "subject": m.group(1).strip(),
            "predicate": "produces value",
            "object": m.group(2).strip(),
            "object-entity": False,
        }
        for m in _LITREL_RE.finditer(text)
    ]
    # Sentences are dot-terminated and [^.] cannot cross a sentence
    # boundary, and no vocabulary definition/value contains a relationship
    # verb or a dot, so the three patterns never overlap.
    return defs, rels


def golden_triples_for_text(text: str) -> list[tuple[str, str, str, str]]:
    """Reference post-processing (definitions/extract.py:158-201,
    relationships/extract.py:140-195) applied to the planted facts.
    Returns (s, p, o, otype) content triples (default graph)."""
    defs, rels = golden_objects(text)
    out: list[tuple[str, str, str, str]] = []
    for d in defs:
        s, o = d["entity"], d["definition"]
        if not s or not o:
            continue
        s_uri = to_uri_py(s)
        out.append((s_uri, RDF_LABEL, s, OTYPE_LITERAL))
        out.append((s_uri, DEFINITION, o, OTYPE_LITERAL))
    for r in rels:
        s, p, o = r["subject"], r["predicate"], r["object"]
        if not s or not p or not o:
            continue
        s_uri = to_uri_py(s)
        p_uri = to_uri_py(p)
        if r["object-entity"]:
            o_uri = to_uri_py(o)
            out.append((s_uri, p_uri, o_uri, OTYPE_URI))
            out.append((o_uri, RDF_LABEL, o, OTYPE_LITERAL))
        else:
            out.append((s_uri, p_uri, o, OTYPE_LITERAL))
        out.append((s_uri, RDF_LABEL, s, OTYPE_LITERAL))
        out.append((p_uri, RDF_LABEL, p, OTYPE_LITERAL))
    return out


def golden_triple_set(rows: list[tuple[str, int, str]]) -> set[tuple[str, str, str, str]]:
    """Golden content-triple set for collected (conv_id, turn_idx, text) rows."""
    golden: set[tuple[str, str, str, str]] = set()
    for _conv, _idx, text in rows:
        golden.update(golden_triples_for_text(text))
    return golden
