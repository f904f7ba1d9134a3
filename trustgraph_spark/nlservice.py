"""Service-side deterministic kernels of the NL-query service: backend
routing, SPARQL query optimization, result caching, and question-level
language detection.

Companions to :mod:`trustgraph_spark.nlquery` (the semantic pipeline).
Reference behavior reproduced (not code):

- query/ontology/backend_router.py — priority / adaptive / round-robin
  routing over configured backends with fallback; the adaptive scorer's
  per-backend heuristics (:187-245).  Routing is fully deterministic in
  the reference; only the 'cassandra' (SPARQL) route is executable in
  this repo — alternative graph sinks are scoped out (SURVEY §2.1 S8) —
  but the routing DECISION logic is complete, so a deployment that adds
  a Cypher executor plugs into the same router.
- query/ontology/query_optimizer.py — the SPARQL arm: performance
  rewrites (LIMIT injection, OPTIONAL-to-end motion, index hints),
  accuracy rewrites (type-constraint insertion, DISTINCT for retrieval),
  regex cost model (:386-423), cache policy (:468-499) and md5 cache key
  (:501-519).  The Cypher arm is omitted with the S8 sinks.  Unlike the
  reference, the rewrites here are VERIFIED against a real engine:
  test_nlservice executes original and optimized queries through
  ``sparql_select`` and asserts result equivalence.
- query/ontology/cache.py — the in-memory TTL cache with eviction and
  hit/miss/eviction stats, compacted (no pickle/file backends — a Spark
  deployment caches DATA in the warehouse; this caches per-question
  service results).
- query/ontology/multi_language.py:201-230 — the rule-based question
  language detector (the library-backed paths are import-gated in the
  reference and those libraries are absent here; corpus-scale language
  ID lives in operators/textstats.language_id).

Everything in this module is per-request driver-side work over bounded
inputs, as in the reference; the data plane stays in sparql_select.
"""

from __future__ import annotations

import hashlib
import re
import time
from dataclasses import dataclass, field
from enum import Enum

from .nlquery import GeneratedSPARQL, QuestionComponents, QuestionType

# ---------------------------------------------------------------------------
# backend routing (backend_router.py)
# ---------------------------------------------------------------------------


class BackendType(Enum):
    """Supported backend labels (backend_router.py:17-22)."""

    CASSANDRA = "cassandra"
    NEO4J = "neo4j"
    MEMGRAPH = "memgraph"
    FALKORDB = "falkordb"


@dataclass
class BackendConfig:
    type: BackendType
    priority: int = 0
    enabled: bool = True
    config: dict | None = None


@dataclass
class QueryRoute:
    backend_type: BackendType
    query_language: str  # 'sparql' | 'cypher'
    confidence: float
    reasoning: str


def _language_for(backend: BackendType) -> str:
    return "sparql" if backend == BackendType.CASSANDRA else "cypher"


class BackendRouter:
    """Routes queries to backends by configuration + heuristics
    (backend_router.py:43-305).  config keys: primary (default
    'cassandra'), fallback (list), routing_strategy
    (priority|adaptive|round_robin), enable_fallback."""

    def __init__(self, config: dict | None = None):
        self.config = config or {}
        self.backends = self._parse_backend_config(self.config)
        self.routing_strategy = self.config.get("routing_strategy", "priority")
        self.enable_fallback = self.config.get("enable_fallback", True)

    def _parse_backend_config(self, config: dict) -> dict:
        backends: dict[BackendType, BackendConfig] = {}
        primary = config.get("primary", "cassandra")
        if primary:
            try:
                bt = BackendType(primary)
                backends[bt] = BackendConfig(
                    type=bt, priority=100, enabled=True,
                    config=config.get(primary, {}),
                )
            except ValueError:
                pass  # unknown primary: reference logs and skips
        for i, fb in enumerate(config.get("fallback", [])):
            try:
                bt = BackendType(fb)
                backends[bt] = BackendConfig(
                    type=bt, priority=50 - i * 10, enabled=True,
                    config=config.get(fb, {}),
                )
            except ValueError:
                pass
        return backends

    def route_query(
        self,
        components: QuestionComponents,
        subsets: list[dict],
    ) -> QueryRoute:
        """subsets: list of subset dicts (nlquery.subset_to_dicts shape) —
        one per matched ontology, as the reference passes its
        QueryOntologySubset list."""
        if self.routing_strategy == "adaptive":
            return self._route_adaptive(components, subsets)
        if self.routing_strategy == "round_robin":
            return self._route_round_robin()
        return self._route_by_priority()

    def _route_by_priority(self) -> QueryRoute:
        best, best_p = None, -1
        for bt, bc in self.backends.items():
            if bc.enabled and bc.priority > best_p:
                best, best_p = bt, bc.priority
        if best is None:
            raise RuntimeError("No enabled backends available")
        return QueryRoute(
            backend_type=best,
            query_language=_language_for(best),
            confidence=1.0,
            reasoning=f"Priority routing to {best.value}",
        )

    def _route_adaptive(
        self, components: QuestionComponents, subsets: list[dict]
    ) -> QueryRoute:
        scores = {
            bt: self._backend_score(bt, components, subsets)
            for bt, bc in self.backends.items()
            if bc.enabled
        }
        if not scores:
            raise RuntimeError("No enabled backends available")
        # max() over dict iteration: break score ties by insertion order
        # (primary first), as the reference's max(scores.keys()) does
        best = max(scores, key=lambda k: scores[k])
        return QueryRoute(
            backend_type=best,
            query_language=_language_for(best),
            confidence=scores[best],
            reasoning=f"Adaptive routing: {best.value} scored {scores[best]:.2f}",
        )

    def _backend_score(
        self,
        bt: BackendType,
        components: QuestionComponents,
        subsets: list[dict],
    ) -> float:
        """The reference's adaptive heuristics (backend_router.py:187-245):
        SPARQL favours factual/aggregation questions, multi-ontology and
        large subsets; Cypher favours relationship/retrieval questions,
        extracted relationships, and small subsets."""
        score = self.backends[bt].priority / 100.0
        qt = components.question_type.value
        if bt == BackendType.CASSANDRA:
            if qt in ("factual", "aggregation"):
                score += 0.3
            if len(subsets) > 1:
                score += 0.2
        else:
            if qt in ("relationship", "retrieval"):
                score += 0.3
            if components.relationships:
                score += 0.2
        total_elements = sum(
            len(s.get("classes", {}))
            + len(s.get("object_properties", {}))
            + len(s.get("datatype_properties", {}))
            for s in subsets
        )
        if bt == BackendType.CASSANDRA:
            if total_elements > 20:
                score += 0.2
        else:
            if total_elements <= 10:
                score += 0.2
        if components.aggregations:
            score += 0.1 if bt == BackendType.CASSANDRA else 0.2
        return min(score, 1.0)

    def _route_round_robin(self) -> QueryRoute:
        enabled = [bt for bt, bc in self.backends.items() if bc.enabled]
        if not enabled:
            raise RuntimeError("No enabled backends available")
        bt = enabled[0]  # the reference's 'round robin' is stateless too
        return QueryRoute(
            backend_type=bt,
            query_language=_language_for(bt),
            confidence=0.8,
            reasoning=f"Round-robin routing to {bt.value}",
        )

    def get_fallback_route(self, failed: BackendType) -> QueryRoute | None:
        if not self.enable_fallback:
            return None
        candidates = sorted(
            (
                (bt, bc)
                for bt, bc in self.backends.items()
                if bc.enabled and bt != failed
            ),
            key=lambda x: x[1].priority,
            reverse=True,
        )
        if not candidates:
            return None
        bt = candidates[0][0]
        return QueryRoute(
            backend_type=bt,
            query_language=_language_for(bt),
            confidence=0.7,
            reasoning=f"Fallback from {failed.value} to {bt.value}",
        )

    def get_available_backends(self) -> list[BackendType]:
        return [bt for bt, bc in self.backends.items() if bc.enabled]

    def is_backend_enabled(self, bt: BackendType) -> bool:
        bc = self.backends.get(bt)
        return bc is not None and bc.enabled

    def update_backend_status(self, bt: BackendType, enabled: bool):
        if bt in self.backends:
            self.backends[bt].enabled = enabled


# ---------------------------------------------------------------------------
# SPARQL query optimization (query_optimizer.py, SPARQL arm)
# ---------------------------------------------------------------------------


class OptimizationStrategy(Enum):
    PERFORMANCE = "performance"
    ACCURACY = "accuracy"
    BALANCED = "balanced"


@dataclass
class OptimizationHint:
    strategy: OptimizationStrategy
    max_results: int | None = None
    timeout_seconds: int | None = None
    use_indices: bool = True
    enable_parallel: bool = False
    cache_results: bool = True


@dataclass
class QueryPlan:
    original_query: str
    optimized_query: str
    estimated_cost: float
    optimization_notes: list[str] = field(default_factory=list)
    index_hints: list[str] = field(default_factory=list)
    execution_order: list[str] = field(default_factory=list)


class QueryOptimizer:
    """SPARQL query optimizer (query_optimizer.py:49-127, SPARQL arm).
    Config: default_strategy (performance|accuracy|balanced)."""

    def __init__(self, config: dict | None = None):
        self.config = config or {}
        self.default_strategy = OptimizationStrategy(
            self.config.get("default_strategy", "balanced")
        )

    def optimize_sparql(
        self,
        gen: GeneratedSPARQL,
        components: QuestionComponents,
        subset: dict,
        hint: OptimizationHint | None = None,
    ) -> tuple[GeneratedSPARQL, QueryPlan]:
        hint = hint or OptimizationHint(strategy=self.default_strategy)
        optimized = gen.query
        notes: list[str] = []
        index_hints: list[str] = []

        if hint.strategy in (
            OptimizationStrategy.PERFORMANCE, OptimizationStrategy.BALANCED
        ):
            optimized, perf_notes, perf_hints = self._performance(
                optimized, hint, query_type=gen.query_type
            )
            notes.extend(perf_notes)
            index_hints.extend(perf_hints)

        if hint.strategy in (
            OptimizationStrategy.ACCURACY, OptimizationStrategy.BALANCED
        ):
            optimized, acc_notes = self._accuracy(
                optimized, components, subset
            )
            notes.extend(acc_notes)

        plan = QueryPlan(
            original_query=gen.query,
            optimized_query=optimized,
            estimated_cost=self.estimate_sparql_cost(optimized, subset),
            optimization_notes=notes,
            index_hints=index_hints,
        )
        out = GeneratedSPARQL(
            query=optimized,
            variables=gen.variables,
            query_type=gen.query_type,
            explanation=f"Optimized: {gen.explanation}",
            complexity_score=min(gen.complexity_score * 0.8, 1.0),
        )
        return out, plan

    def _performance(
        self, query: str, hint: OptimizationHint, query_type: str = "SELECT"
    ) -> tuple[str, list[str], list[str]]:
        """LIMIT injection, OPTIONAL-to-end motion, index hints
        (query_optimizer.py:191-250).  The OPTIONAL regex is non-nesting,
        as in the reference — nested groups inside OPTIONAL are left in
        place (the template generator never emits them).

        Deliberate deviations, both in service of 'the optimized query
        stays valid' (this repo EXECUTES the rewritten form; the
        reference never does):
        - moved OPTIONALs re-insert just INSIDE the WHERE group's closing
          brace (before any trailing ORDER BY/LIMIT), where the reference
          appends them after the whole string (:224-232, unparseable);
          test_nlservice executes both forms and asserts equal results
        - ASK queries are exempt from LIMIT injection — ASK takes no
          solution modifier, so the reference's unconditional append
          (:212-214) would make every boolean question unexecutable"""
        optimized = query
        notes: list[str] = []
        index_hints: list[str] = []

        if (
            hint.max_results
            and query_type != "ASK"
            and "LIMIT" not in optimized.upper()
        ):
            optimized = f"{optimized.rstrip()}\nLIMIT {hint.max_results}"
            notes.append(
                f"Added LIMIT {hint.max_results} to prevent large result sets"
            )

        optionals = re.findall(
            r"OPTIONAL\s*\{[^}]+\}", optimized, re.IGNORECASE | re.DOTALL
        )
        if optionals:
            for opt in optionals:
                optimized = optimized.replace(opt, "")
            tail = len(optimized)
            for m in re.finditer(r"ORDER\s+BY|\bLIMIT\b", optimized, re.IGNORECASE):
                tail = min(tail, m.start())
            close = optimized.rfind("}", 0, tail)
            if close == -1:
                close = len(optimized.rstrip())
            for opt in optionals:
                optimized = (
                    optimized[:close] + f"  {opt}\n" + optimized[close:]
                )
            notes.append("Moved OPTIONAL clauses to end for better performance")

        if "WHERE" in optimized.upper():
            if "?subject rdf:type" in optimized or "?entity rdf:type" in optimized:
                index_hints.append("type_index")
            if "rdfs:subClassOf" in optimized:
                index_hints.append("hierarchy_index")
        if re.findall(r"FILTER\s*\([^)]+\)", optimized, re.IGNORECASE):
            notes.append(
                "FILTER clauses present - ensure they're positioned optimally"
            )
        return optimized, notes, index_hints

    def _accuracy(
        self, query: str, components: QuestionComponents, subset: dict
    ) -> tuple[str, list[str]]:
        """Type-constraint insertion + DISTINCT for retrieval
        (query_optimizer.py:252-296)."""
        optimized = query
        notes: list[str] = []
        classes = subset.get("classes", {})

        if "?entity" in optimized and "rdf:type" not in optimized and classes:
            m = re.search(r"WHERE\s*\{(.+)\}", optimized, re.DOTALL | re.IGNORECASE)
            if m:
                main_class = next(iter(classes))
                constraint = f"\n  ?entity rdf:type :{main_class} ."
                start = m.start(1)
                optimized = optimized[:start] + constraint + optimized[start:]
                notes.append(
                    f"Added type constraint for {main_class} to improve accuracy"
                )

        if (
            components.question_type == QuestionType.RETRIEVAL
            and "DISTINCT" not in optimized.upper()
            and "SELECT" in optimized.upper()
        ):
            optimized = optimized.replace("SELECT ", "SELECT DISTINCT ", 1)
            notes.append("Added DISTINCT to eliminate duplicate results")
        return optimized, notes

    def estimate_sparql_cost(self, query: str, subset: dict) -> float:
        """Regex cost model (query_optimizer.py:386-423)."""
        cost = len(query.split("\n")) * 0.01
        cost += len(re.findall(r"\?\w+\s+\?\w+\s+\?\w+", query)) * 0.1
        cost += len(re.findall(r"OPTIONAL", query, re.IGNORECASE)) * 0.15
        cost += len(re.findall(r"FILTER", query, re.IGNORECASE)) * 0.1
        cost += len(re.findall(r"\*|\+", query)) * 0.2
        total_elements = (
            len(subset.get("classes", {}))
            + len(subset.get("object_properties", {}))
            + len(subset.get("datatype_properties", {}))
        )
        cost += (total_elements / 100.0) * 0.1
        return min(cost, 1.0)

    def should_use_cache(
        self,
        query: str,
        components: QuestionComponents,
        hint: OptimizationHint,
    ) -> bool:
        """Cache policy (query_optimizer.py:468-499).  Note the reference
        checks time-sensitivity LAST, so a retrieval/factual question
        caches even when it says 'latest' — reproduced as-is.  (The
        reference's explicit time-sensitivity branch is consequently a
        no-op — every remaining path returns False — so it is not
        repeated here.)"""
        if not hint.cache_results:
            return False
        if components.question_type in (
            QuestionType.RETRIEVAL, QuestionType.FACTUAL
        ):
            return True
        if components.question_type == QuestionType.AGGREGATION and (
            "COUNT" in query.upper() or "SUM" in query.upper()
        ):
            return True
        return False

    def get_cache_key(self, query: str, subset: dict) -> str:
        """Stable md5 over query + sorted ontology element ids
        (query_optimizer.py:501-519)."""
        ontology_repr = (
            f"{sorted(subset.get('classes', {}))}"
            f"-{sorted(subset.get('object_properties', {}))}"
        )
        combined = f"{query.strip()}-{ontology_repr}"
        return hashlib.md5(combined.encode()).hexdigest()


# ---------------------------------------------------------------------------
# result cache (cache.py InMemoryCache, compacted)
# ---------------------------------------------------------------------------


@dataclass
class CacheStats:
    hits: int = 0
    misses: int = 0
    evictions: int = 0

    @property
    def hit_rate(self) -> float:
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


class QueryResultCache:
    """In-memory TTL cache with LRU-style eviction and stats
    (cache.py InMemoryCache:94-…, compacted: single backend, no
    pickle/file tiers — a Spark deployment caches DATA in the warehouse;
    this caches per-question service results).  ``clock`` is injectable
    for deterministic expiry tests."""

    def __init__(self, max_size: int = 1000, default_ttl: int | None = None,
                 clock=time.monotonic):
        self.max_size = max_size
        self.default_ttl = default_ttl
        self._clock = clock
        self._entries: dict[str, tuple[object, float, float | None]] = {}
        self.stats = CacheStats()

    def get(self, key: str):
        e = self._entries.get(key)
        now = self._clock()
        if e is not None:
            value, _, expires = e
            if expires is None or now < expires:
                # touch: move to MRU position
                del self._entries[key]
                self._entries[key] = (value, now, expires)
                self.stats.hits += 1
                return value
            del self._entries[key]
        self.stats.misses += 1
        return None

    def set(self, key: str, value, ttl_seconds: int | None = None):
        ttl = self.default_ttl if ttl_seconds is None else ttl_seconds
        now = self._clock()
        if key in self._entries:
            del self._entries[key]
        elif len(self._entries) >= self.max_size:
            # evict least-recently-used (insertion order = recency here)
            oldest = next(iter(self._entries))
            del self._entries[oldest]
            self.stats.evictions += 1
        self._entries[key] = (
            value, now, None if ttl is None else now + ttl
        )

    def delete(self, key: str) -> bool:
        return self._entries.pop(key, None) is not None

    def clear(self):
        self._entries.clear()

    def __len__(self) -> int:
        return len(self._entries)


# ---------------------------------------------------------------------------
# question-level language detection (multi_language.py rule fallback)
# ---------------------------------------------------------------------------

_LANG_KEYWORDS = {
    "es": ["qué", "cuál", "cuándo", "dónde", "cómo", "por qué", "cuántos"],
    "fr": ["que", "quel", "quand", "où", "comment", "pourquoi", "combien"],
    "de": ["was", "welche", "wann", "wo", "wie", "warum", "wieviele"],
    "it": ["che", "quale", "quando", "dove", "come", "perché", "quanti"],
    "pt": ["que", "qual", "quando", "onde", "como", "por que", "quantos"],
    "nl": ["wat", "welke", "wanneer", "waar", "hoe", "waarom", "hoeveel"],
}


def detect_question_language(
    question: str, default: str = "en"
) -> tuple[str, float]:
    """Rule-based question language detection
    (multi_language.py:201-230 — the fallback the reference uses when no
    detection library is importable, which is also this image's state).
    Substring keyword hits per language, best count wins, confidence
    min(0.8, hits/3); no hits -> (default, 0.1).  Corpus-scale language
    ID is operators/textstats.language_id; this is the per-question
    twin."""
    q = question.lower()
    best, best_score = default, 0
    for lang, kws in _LANG_KEYWORDS.items():
        score = sum(1 for k in kws if k in q)
        if score > best_score:
            best, best_score = lang, score
    conf = min(0.8, best_score / 3.0) if best_score > 0 else 0.1
    return best, conf


# ---------------------------------------------------------------------------
# query explanation (query_explanation.py, compacted)
# ---------------------------------------------------------------------------


@dataclass
class ExplanationStep:
    """One processing step (query_explanation.py:21-32)."""

    step_number: int
    component: str
    operation: str
    input_data: dict
    output_data: dict
    explanation: str
    duration_ms: float = 0.0
    success: bool = True
    metadata: dict = field(default_factory=dict)


@dataclass
class QueryExplanation:
    """Complete processing explanation (query_explanation.py:35-48)."""

    query_id: str
    original_question: str
    processing_steps: list
    final_answer: str
    confidence_score: float
    ontologies_used: list
    backend_used: str
    reasoning_chain: list
    user_friendly_explanation: str


_STEP_TEMPLATES = {
    "question_analysis": {
        "basic": "I analyzed your question to understand what you're asking.",
        "detailed": "I analyzed your question '{question}' and identified it "
                    "as a {question_type} query about {entities}.",
        "technical": "Question analysis: Type={question_type}, "
                     "Entities={entities}, Keywords={keywords}, "
                     "Expected answer={answer_type}",
    },
    "ontology_matching": {
        "basic": "I found relevant knowledge about {entities} in the "
                 "available ontologies.",
        "detailed": "I searched through {ontology_count} ontologies and "
                    "found {selected_elements} relevant concepts related to "
                    "your question.",
        "technical": "Ontology matching: Selected {classes} classes, "
                     "{properties} properties from {ontologies}",
    },
    "query_generation": {
        "basic": "I generated a query to search for the information.",
        "detailed": "I created a {query_type} query using {query_language} "
                    "to search the {backend} database.",
        "technical": "Query generation: {query_language} query with "
                     "{variables} variables, complexity score {complexity}",
    },
    "query_execution": {
        "basic": "I searched the database and found {result_count} results.",
        "detailed": "I executed the query against the {backend} database and "
                    "retrieved {result_count} results in {duration}ms.",
        "technical": "Query execution: {backend} backend, {result_count} "
                     "results, execution time {duration}ms",
    },
    "answer_generation": {
        "basic": "I generated a natural language answer from the results.",
        "detailed": "I processed {result_count} results and generated an "
                    "answer with {confidence}% confidence.",
        "technical": "Answer generation: {result_count} input results, "
                     "{generation_method} method, confidence {confidence}",
    },
}

_REASONING_TEMPLATES = {
    "entity_identification": "I identified '{entity}' as a key concept in "
                             "your question.",
    "ontology_selection": "I selected the '{ontology}' ontology because it "
                          "contains relevant information about {concepts}.",
    "query_strategy": "I chose a {strategy} query approach because {reason}.",
    "confidence_assessment": "I'm {confidence}% confident in this answer "
                             "because {reasoning}.",
}


class QueryExplainer:
    """Deterministic explanation of the question->answer pipeline
    (query_explanation.py:51-639, compacted to this repo's shapes:
    subsets are nlquery subset dicts optionally carrying 'ontology_id',
    results are the executed rows list, the query is a GeneratedSPARQL).
    Config: explanation_level (basic|detailed|technical),
    max_reasoning_steps."""

    def __init__(self, config: dict | None = None):
        self.config = config or {}
        self.level = self.config.get("explanation_level", "detailed")
        self.max_reasoning_steps = self.config.get("max_reasoning_steps", 10)

    def explain(
        self,
        question: str,
        components: QuestionComponents,
        subsets: list[dict],
        gen: GeneratedSPARQL,
        rows: list[dict],
        final_answer: str,
        metadata: dict | None = None,
    ) -> QueryExplanation:
        metadata = metadata or {}
        backend = metadata.get("backend_used", "spark")
        n = len(rows)
        duration = float(metadata.get("execution_time_ms", 0.0))
        confidence_pct = metadata.get("answer_confidence", 0.8) * 100

        total_elements = sum(
            len(s.get("classes", {}))
            + len(s.get("object_properties", {}))
            + len(s.get("datatype_properties", {}))
            for s in subsets
        )

        def t(step, **kw):
            return _STEP_TEMPLATES[step][self.level].format(**kw)

        if self.level == "basic":
            qa = _STEP_TEMPLATES["question_analysis"]["basic"]
            om = t("ontology_matching",
                   entities=", ".join(components.entities[:3]))
            qg = _STEP_TEMPLATES["query_generation"]["basic"]
            qe = t("query_execution", result_count=n)
            ag = _STEP_TEMPLATES["answer_generation"]["basic"]
        elif self.level == "technical":
            qa = t("question_analysis",
                   question_type=components.question_type.value,
                   entities=components.entities,
                   keywords=components.keywords,
                   answer_type=components.expected_answer_type)
            om = t("ontology_matching",
                   classes=sum(len(s.get("classes", {})) for s in subsets),
                   properties=sum(
                       len(s.get("object_properties", {}))
                       + len(s.get("datatype_properties", {}))
                       for s in subsets
                   ),
                   ontologies=", ".join(
                       s.get("ontology_id", "unknown") for s in subsets
                   ))
            qg = t("query_generation", query_language="SPARQL",
                   variables=len(gen.variables),
                   complexity=f"{gen.complexity_score:.2f}")
            qe = t("query_execution", backend=backend, result_count=n,
                   duration=f"{duration:.1f}")
            ag = t("answer_generation", result_count=n,
                   generation_method=metadata.get(
                       "generation_method", "template_based"
                   ),
                   confidence=f"{confidence_pct:.1f}")
        else:  # detailed
            qa = t("question_analysis", question=question,
                   question_type=components.question_type.value.replace("_", " "),
                   entities=", ".join(components.entities[:3]))
            om = t("ontology_matching", ontology_count=len(subsets),
                   selected_elements=total_elements)
            qg = t("query_generation", query_type=gen.query_type,
                   query_language="SPARQL", backend=backend)
            qe = t("query_execution", backend=backend, result_count=n,
                   duration=f"{duration:.1f}")
            ag = t("answer_generation", result_count=n,
                   confidence=f"{confidence_pct:.0f}")

        steps = [
            ExplanationStep(1, "question_analyzer", "analyze_question",
                            {"question": question},
                            {"question_type": components.question_type.value,
                             "entities": components.entities,
                             "keywords": components.keywords}, qa),
            ExplanationStep(2, "ontology_matcher", "select_relevant_subset",
                            {"entities": components.entities},
                            {"ontology_count": len(subsets),
                             "total_elements": total_elements}, om),
            ExplanationStep(3, "query_generator", "generate_query",
                            {"query_type": gen.query_type},
                            {"query_language": "SPARQL",
                             "variables": gen.variables,
                             "complexity": gen.complexity_score}, qg,
                            metadata={"generated_query": gen.query}),
            ExplanationStep(4, "query_executor", "execute_query",
                            {"query": gen.query},
                            {"result_count": n,
                             "execution_time_ms": duration}, qe,
                            duration_ms=duration),
            ExplanationStep(5, "answer_generator", "generate_answer",
                            {"result_count": n},
                            {"answer": final_answer,
                             "confidence": confidence_pct / 100}, ag,
                            success=bool(final_answer)),
        ]

        return QueryExplanation(
            query_id=metadata.get("query_id", "query"),
            original_question=question,
            processing_steps=steps,
            final_answer=final_answer,
            confidence_score=self._confidence(components, n, metadata),
            ontologies_used=[
                s.get("ontology_id", "unknown") for s in subsets
            ],
            backend_used=backend,
            reasoning_chain=self._reasoning(
                components, subsets, metadata
            ),
            user_friendly_explanation=self._user_friendly(
                question, components, subsets, final_answer
            ),
        )

    def _reasoning(
        self,
        components: QuestionComponents,
        subsets: list[dict],
        metadata: dict,
    ) -> list[str]:
        """Reasoning chain (query_explanation.py:409-471)."""
        out = []
        for entity in components.entities[:3]:
            out.append(_REASONING_TEMPLATES["entity_identification"].format(
                entity=entity
            ))
        if subsets:
            primary = subsets[0]
            out.append(_REASONING_TEMPLATES["ontology_selection"].format(
                ontology=primary.get("ontology_id", "primary"),
                concepts=", ".join(list(primary.get("classes", {}))[:3]),
            ))
        if components.question_type == QuestionType.AGGREGATION:
            strategy, reason = "aggregation", "you asked for a count or sum"
        elif components.question_type == QuestionType.BOOLEAN:
            strategy, reason = "boolean", "you asked a yes/no question"
        else:
            strategy, reason = "retrieval", "you asked for specific information"
        out.append(_REASONING_TEMPLATES["query_strategy"].format(
            strategy=strategy, reason=reason
        ))
        confidence = metadata.get("answer_confidence", 0.8) * 100
        if confidence > 90:
            why = "the query matched well with available data"
        elif confidence > 70:
            why = "the query found relevant information with some uncertainty"
        else:
            why = "the available data partially matches your question"
        out.append(_REASONING_TEMPLATES["confidence_assessment"].format(
            confidence=f"{confidence:.0f}", reasoning=why
        ))
        return out[: self.max_reasoning_steps]

    @staticmethod
    def _confidence(
        components: QuestionComponents, result_count: int, metadata: dict
    ) -> float:
        """Confidence model (query_explanation.py:473-499)."""
        c = 0.8
        if result_count > 0:
            c += 0.1
        if result_count > 5:
            c += 0.05
        if components.entities:
            c += 0.05
        if metadata.get("all_steps_successful", True):
            c += 0.05
        return min(c, 1.0)

    @staticmethod
    def _user_friendly(
        question: str,
        components: QuestionComponents,
        subsets: list[dict],
        final_answer: str,
    ) -> str:
        """Workspace-friendly summary (query_explanation.py:501-534)."""
        parts = [f"To answer your question '{question}', I followed these steps:"]
        if components.question_type == QuestionType.AGGREGATION:
            parts.append("1. I recognized this as a counting or aggregation question")
        elif components.question_type == QuestionType.BOOLEAN:
            parts.append("1. I recognized this as a yes/no question")
        else:
            parts.append("1. I analyzed your question to understand what "
                         "information you need")
        if subsets:
            if len(subsets) == 1:
                parts.append("2. I searched through the relevant knowledge base")
            else:
                parts.append(
                    f"2. I searched through {len(subsets)} knowledge bases"
                )
        parts.append("3. I found the relevant information and generated your answer")
        parts.append(f"The answer is: {final_answer}")
        return " ".join(parts)


def format_explanation(exp: QueryExplanation, format_type: str = "markdown") -> str:
    """Render a QueryExplanation (query_explanation.py:546-639; html /
    markdown / text)."""
    if format_type == "html":
        parts = [
            f"<h2>Query Explanation: {exp.query_id}</h2>",
            f"<p><strong>Question:</strong> {exp.original_question}</p>",
            f"<p><strong>Answer:</strong> {exp.final_answer}</p>",
            f"<p><strong>Confidence:</strong> {exp.confidence_score:.1%}</p>",
            "<h3>Processing Steps:</h3>", "<ol>",
        ]
        parts += [
            f"<li><strong>{s.component}</strong>: {s.explanation}</li>"
            for s in exp.processing_steps
        ]
        parts += ["</ol>", "<h3>Reasoning:</h3>", "<ul>"]
        parts += [f"<li>{r}</li>" for r in exp.reasoning_chain]
        parts.append("</ul>")
        return "".join(parts)
    if format_type == "markdown":
        parts = [
            f"## Query Explanation: {exp.query_id}",
            f"**Question:** {exp.original_question}",
            f"**Answer:** {exp.final_answer}",
            f"**Confidence:** {exp.confidence_score:.1%}",
            "", "### Processing Steps:", "",
        ]
        parts += [
            f"{i}. **{s.component}**: {s.explanation}"
            for i, s in enumerate(exp.processing_steps, 1)
        ]
        parts += ["", "### Reasoning:", ""]
        parts += [f"- {r}" for r in exp.reasoning_chain]
        return "\n".join(parts)
    parts = [
        f"Query Explanation: {exp.query_id}",
        f"Question: {exp.original_question}",
        f"Answer: {exp.final_answer}",
        f"Confidence: {exp.confidence_score:.1%}",
        "", "Processing Steps:",
    ]
    parts += [
        f"  {i}. {s.component}: {s.explanation}"
        for i, s in enumerate(exp.processing_steps, 1)
    ]
    parts += ["", "Reasoning:"]
    parts += [f"  - {r}" for r in exp.reasoning_chain]
    return "\n".join(parts)


# ---------------------------------------------------------------------------
# service composition: cache + monitor around the NL orchestration
# ---------------------------------------------------------------------------


def cached_nl_graph_query(
    edges,
    elements,
    question: str,
    cache: "QueryResultCache",
    monitor=None,
    pattern_analyzer=None,
    ttl: int | None = None,
    clock=None,
    **nl_kwargs,
) -> dict:
    """query_service-style composition (query/ontology/query_service.py
    process + the cache.py cached-query wrapper :620-650): md5-key the
    question (+collection), short-circuit on a cache hit, otherwise run
    :func:`trustgraph_spark.nlquery.nl_graph_query`, store the result,
    and record metrics either way — request duration + success on the
    'nlquery' component, cache hit/miss on the 'query_results' cache,
    and the question pattern for the analyzer. ``monitor`` is a
    :class:`trustgraph_spark.nlmonitor.PerformanceMonitor` (optional);
    ``clock`` overrides the duration source for deterministic tests.

    The cached value is the SERVICE result dict (answer, sparql,
    confidence, bounded rows) — the reference caches exactly this
    per-question response; corpus-scale data caching belongs to the
    warehouse, not here."""
    import hashlib
    import time as _time

    from .nlquery import nl_graph_query

    clock = clock or _time.monotonic
    # Key covers the question plus every value-typed kwarg (namespace,
    # top_k, thresholds, collection, ...) so differing configurations
    # never share an entry — the reference wrapper hashes all
    # args+kwargs (cache.py:633-635). Callable seams and the
    # edges/elements frames are NOT keyable: the cache instance is
    # scoped to one store + seam configuration (as the reference's is
    # to its service instance); bind a fresh cache per configuration.
    keyable = sorted(
        (k, repr(v)) for k, v in nl_kwargs.items() if not callable(v)
    )
    key = "nlq:" + hashlib.md5(
        (question + "\x00" + repr(keyable)).encode()
    ).hexdigest()

    hit = cache.get(key)
    if hit is not None:
        if monitor is not None:
            monitor.record_cache_access(True, cache_type="query_results")
        return hit

    if monitor is not None:
        monitor.record_cache_access(False, cache_type="query_results")
    t0 = clock()
    result = nl_graph_query(edges, elements, question, **nl_kwargs)
    duration = clock() - t0
    # nl_graph_query shapes its own errors (error answer, confidence 0.0,
    # metadata.error) instead of raising — mirror that in the metrics
    ok = not (result.get("metadata") or {}).get("error")
    if monitor is not None:
        monitor.record_request("nlquery", "nl_graph_query", duration,
                               success=ok)
    if pattern_analyzer is not None:
        comp = result.get("components")
        gen = result.get("sparql")
        pattern_analyzer.record_query_pattern(
            getattr(comp.question_type, "value", str(comp.question_type)),
            comp.entities,
            complexity=(gen.complexity_score if gen is not None else 0.0),
            backend=(result.get("metadata") or {}).get("backend_used",
                                                       "spark"),
            duration=duration,
            success=ok,
        )
    if ok:
        cache.set(key, result, ttl_seconds=ttl)
    return result
