"""Error taxonomy, retry/fallback recovery, and error reporting for the
NL-query service — the deterministic kernel of
query/ontology/error_handling.py, compacted and synchronous (our pipeline
is synchronous driver-side orchestration; the reference's async wrappers
exist for its event-loop processors).

Reference behavior reproduced (not code):
- the severity/category taxonomy and typed exception hierarchy (:19-114)
- per-category RetryConfig table (:143-171) with exponential backoff +
  jitter and a windowed circuit breaker (:274-290)
- per-category fallbacks (:301-405): keyword question analysis, the
  all-triples LIMIT 10 SPARQL, empty execution results, apology answers,
  None for backend connections
- the with_error_handling decorator (:408-478, sync arm) and
  ErrorReporter with bounded log + hourly summary (:481-557)

Determinism hooks (this repo adds them; the reference reaches for
time.sleep/random directly): ``sleep``, ``rng`` and ``clock`` are
injectable so retry/jitter/circuit/summary behavior is exactly testable.
"""

from __future__ import annotations

import random as _random
import time
from dataclasses import dataclass, field
from enum import Enum
from functools import wraps

from .nlquery import GeneratedSPARQL, QuestionComponents, QuestionType


class ErrorSeverity(Enum):
    LOW = "low"
    MEDIUM = "medium"
    HIGH = "high"
    CRITICAL = "critical"


class ErrorCategory(Enum):
    ONTOLOGY_LOADING = "ontology_loading"
    QUESTION_ANALYSIS = "question_analysis"
    QUERY_GENERATION = "query_generation"
    QUERY_EXECUTION = "query_execution"
    ANSWER_GENERATION = "answer_generation"
    BACKEND_CONNECTION = "backend_connection"
    CACHE_ERROR = "cache_error"
    VALIDATION_ERROR = "validation_error"
    TIMEOUT_ERROR = "timeout_error"
    AUTHENTICATION_ERROR = "authentication_error"


@dataclass
class ErrorContext:
    category: ErrorCategory
    severity: ErrorSeverity
    component: str
    operation: str
    user_message: str | None = None
    technical_details: str | None = None
    suggestion: str | None = None
    retry_count: int = 0
    max_retries: int = 3
    metadata: dict = field(default_factory=dict)


class OntoRAGError(Exception):
    """Base error carrying context + cause (error_handling.py:56-79)."""

    def __init__(self, message: str, context: ErrorContext | None = None,
                 cause: Exception | None = None):
        super().__init__(message)
        self.message = message
        self.context = context or ErrorContext(
            category=ErrorCategory.VALIDATION_ERROR,
            severity=ErrorSeverity.MEDIUM,
            component="unknown",
            operation="unknown",
        )
        self.cause = cause
        self.timestamp = time.time()


class OntologyLoadingError(OntoRAGError):
    pass


class QuestionAnalysisError(OntoRAGError):
    pass


class QueryGenerationError(OntoRAGError):
    pass


class QueryExecutionError(OntoRAGError):
    pass


class AnswerGenerationError(OntoRAGError):
    pass


class BackendConnectionError(OntoRAGError):
    pass


class QueryTimeoutError(OntoRAGError):
    """The reference names this TimeoutError, shadowing the builtin; the
    distinct name here avoids that trap — isinstance checks against the
    builtin would otherwise silently match the wrong type."""


@dataclass
class RetryConfig:
    max_retries: int = 3
    base_delay: float = 1.0
    max_delay: float = 60.0
    exponential_backoff: bool = True
    jitter: bool = True
    retry_on_exceptions: tuple = ()


_FALLBACK_ANSWERS = [
    "I'm experiencing some technical difficulties. Please try rephrasing "
    "your question.",
    "I couldn't process your question at the moment. Could you try asking "
    "it differently?",
    "There seems to be an issue with my analysis. Please try again in a "
    "moment.",
    "I'm having trouble understanding your question right now. Please try "
    "again.",
]


class ErrorRecoveryStrategy:
    """Retry with backoff, circuit breaking, and per-category fallbacks
    (error_handling.py:128-405).  config: circuit_breaker_threshold (10),
    circuit_breaker_window (300s)."""

    def __init__(self, config: dict | None = None, sleep=time.sleep,
                 rng=None, clock=time.time):
        self.config = config or {}
        self._sleep = sleep
        self._rng = rng or _random.Random()
        self._clock = clock
        self.retry_configs = self._build_retry_configs()
        self.fallback_strategies = {
            ErrorCategory.QUESTION_ANALYSIS: self._fallback_question_analysis,
            ErrorCategory.QUERY_GENERATION: self._fallback_query_generation,
            ErrorCategory.QUERY_EXECUTION: self._fallback_query_execution,
            ErrorCategory.ANSWER_GENERATION: self._fallback_answer_generation,
            ErrorCategory.BACKEND_CONNECTION: self._fallback_backend_connection,
        }
        self.error_counters: dict[str, int] = {}
        self.circuit_breakers: dict[str, dict] = {}

    def _build_retry_configs(self) -> dict:
        """Per-category retry table (error_handling.py:143-171)."""
        return {
            ErrorCategory.BACKEND_CONNECTION: RetryConfig(
                max_retries=5, base_delay=2.0,
                retry_on_exceptions=(
                    BackendConnectionError, ConnectionError, QueryTimeoutError
                ),
            ),
            ErrorCategory.QUERY_EXECUTION: RetryConfig(
                max_retries=3, base_delay=1.0,
                retry_on_exceptions=(QueryExecutionError, QueryTimeoutError),
            ),
            ErrorCategory.ONTOLOGY_LOADING: RetryConfig(
                max_retries=2, base_delay=0.5,
                retry_on_exceptions=(OntologyLoadingError, IOError),
            ),
            ErrorCategory.QUESTION_ANALYSIS: RetryConfig(
                max_retries=2, base_delay=1.0,
                retry_on_exceptions=(QuestionAnalysisError, QueryTimeoutError),
            ),
            ErrorCategory.ANSWER_GENERATION: RetryConfig(
                max_retries=2, base_delay=1.0,
                retry_on_exceptions=(AnswerGenerationError, QueryTimeoutError),
            ),
        }

    def handle_error(self, error: Exception, context: ErrorContext,
                     operation, *args, **kwargs):
        """Retry if the category's config covers the exception type and
        retries remain; else fall back (error_handling.py:183-220)."""
        error_key = f"{context.category.value}:{context.component}"
        self.error_counters[error_key] = self.error_counters.get(error_key, 0) + 1

        if self._is_circuit_open(error_key):
            return self._execute_fallback(context, *args, **kwargs)

        rc = self.retry_configs.get(context.category)
        if rc and context.retry_count < rc.max_retries:
            if isinstance(error, rc.retry_on_exceptions or ()):
                return self._retry_operation(
                    operation, context, rc, *args, **kwargs
                )

        return self._execute_fallback(context, *args, **kwargs)

    def _retry_operation(self, operation, context: ErrorContext,
                         rc: RetryConfig, *args, **kwargs):
        context.retry_count += 1
        delay = rc.base_delay
        if rc.exponential_backoff:
            delay *= 2 ** (context.retry_count - 1)
        delay = min(delay, rc.max_delay)
        if rc.jitter:
            delay *= 0.5 + self._rng.random()
        self._sleep(delay)
        try:
            return operation(*args, **kwargs)
        except Exception as e:
            return self.handle_error(e, context, operation, *args, **kwargs)

    def _execute_fallback(self, context: ErrorContext, *args, **kwargs):
        fb = self.fallback_strategies.get(context.category)
        if fb:
            try:
                return fb(context, *args, **kwargs)
            except Exception:
                pass
        return self._default_fallback(context)

    def _is_circuit_open(self, error_key: str) -> bool:
        """Windowed error-count circuit (error_handling.py:274-290)."""
        circuit = self.circuit_breakers.get(error_key, {})
        threshold = self.config.get("circuit_breaker_threshold", 10)
        window = self.config.get("circuit_breaker_window", 300)
        now = self._clock()
        start = circuit.get("window_start", now)
        if now - start > window:
            self.circuit_breakers[error_key] = {"window_start": now}
            self.error_counters[error_key] = 0
            return False
        if error_key not in self.circuit_breakers:
            self.circuit_breakers[error_key] = {"window_start": now}
        return self.error_counters.get(error_key, 0) >= threshold

    def _default_fallback(self, context: ErrorContext):
        if context.category == ErrorCategory.ANSWER_GENERATION:
            return ("I'm sorry, I encountered an error while processing "
                    "your question. Please try again.")
        if context.category == ErrorCategory.QUERY_EXECUTION:
            return {"error": "Query execution failed", "results": []}
        return None

    # per-category fallbacks (error_handling.py:301-405)

    def _fallback_question_analysis(
        self, context: ErrorContext, question: str = "", **kwargs
    ) -> QuestionComponents:
        """Keyword-only analysis when the full analyzer fails
        (:303-336).  Note this fallback maps what/which/who/where to
        RETRIEVAL — coarser than the main analyzer's taxonomy, as in the
        reference."""
        import re

        q = question.lower()
        if any(w in q for w in ("how many", "count", "number")):
            qtype = QuestionType.AGGREGATION
        elif q.startswith(("is", "are", "does", "can")):
            qtype = QuestionType.BOOLEAN
        elif any(w in q for w in ("what", "which", "who", "where")):
            qtype = QuestionType.RETRIEVAL
        else:
            qtype = QuestionType.FACTUAL
        words = re.findall(r"\b[a-zA-Z]+\b", question)
        stop = {"what", "which", "where", "when", "who", "how", "does",
                "are", "the"}
        entities = [w for w in words if len(w) > 3 and w.lower() not in stop]
        return QuestionComponents(
            original_question=question,
            question_type=qtype,
            entities=entities[:3],
            keywords=words[:5],
            aggregations=(
                ["count"] if qtype == QuestionType.AGGREGATION else []
            ),
            expected_answer_type="text",
        )

    def _fallback_query_generation(
        self, context: ErrorContext, **kwargs
    ) -> GeneratedSPARQL:
        """The all-triples LIMIT 10 safety query (:338-358; the Cypher
        arm is omitted with the S8 sinks)."""
        query = (
            "PREFIX rdf: <http://www.w3.org/1999/02/22-rdf-syntax-ns#>\n"
            "PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>\n\n"
            "SELECT ?subject ?predicate ?object WHERE {\n"
            "  ?subject ?predicate ?object .\n}\nLIMIT 10"
        )
        return GeneratedSPARQL(
            query=query,
            variables=["object", "predicate", "subject"],
            query_type="SELECT",
            explanation="Fallback SPARQL query",
            complexity_score=0.1,
        )

    def _fallback_query_execution(self, context: ErrorContext, **kwargs):
        """Empty results (:370-387)."""
        return []

    def _fallback_answer_generation(
        self, context: ErrorContext, question: str | None = None, **kwargs
    ) -> str:
        return self._rng.choice(_FALLBACK_ANSWERS)

    def _fallback_backend_connection(self, context: ErrorContext, **kwargs):
        return None


def with_error_handling(category: ErrorCategory, component: str,
                        operation: str,
                        severity: ErrorSeverity = ErrorSeverity.MEDIUM):
    """Decorator wrapping failures into OntoRAGError with context, or
    delegating to the instance's ``_error_strategy`` when the wrapped
    method's object carries one (error_handling.py:408-478, sync arm)."""

    def decorator(func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            try:
                return func(*args, **kwargs)
            except Exception as e:
                context = ErrorContext(
                    category=category,
                    severity=severity,
                    component=component,
                    operation=operation,
                    technical_details=str(e),
                    metadata={"args": str(args), "kwargs": str(kwargs)},
                )
                strategy = getattr(args[0], "_error_strategy", None) if args else None
                if strategy is not None:
                    return strategy.handle_error(
                        e, context, func, *args, **kwargs
                    )
                raise OntoRAGError(
                    f"Error in {component}.{operation}: {e}",
                    context=context,
                    cause=e,
                )

        return wrapper

    return decorator


class ErrorReporter:
    """Bounded error log + hourly summary (error_handling.py:481-557).
    config: max_log_size (1000)."""

    def __init__(self, config: dict | None = None, clock=time.time):
        self.config = config or {}
        self._clock = clock
        self.error_log: list[dict] = []
        self.max_log_size = self.config.get("max_log_size", 1000)

    def report_error(self, error: OntoRAGError):
        self.error_log.append({
            "timestamp": error.timestamp,
            "message": error.message,
            "category": error.context.category.value,
            "severity": error.context.severity.value,
            "component": error.context.component,
            "operation": error.context.operation,
            "retry_count": error.context.retry_count,
            "technical_details": error.context.technical_details,
        })
        if len(self.error_log) > self.max_log_size:
            self.error_log = self.error_log[-self.max_log_size:]

    def get_error_summary(self) -> dict:
        if not self.error_log:
            return {"total_errors": 0}
        now = self._clock()
        recent = [e for e in self.error_log if now - e["timestamp"] < 3600]
        cats: dict[str, int] = {}
        sevs: dict[str, int] = {}
        comps: dict[str, int] = {}
        for e in recent:
            cats[e["category"]] = cats.get(e["category"], 0) + 1
            sevs[e["severity"]] = sevs.get(e["severity"], 0) + 1
            comps[e["component"]] = comps.get(e["component"], 0) + 1
        return {
            "total_errors": len(self.error_log),
            "recent_errors": len(recent),
            "category_breakdown": cats,
            "severity_breakdown": sevs,
            "component_breakdown": comps,
            "most_recent_error": self.error_log[-1],
        }
