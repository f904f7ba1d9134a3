"""Error taxonomy + recovery for the NL-query service
(trustgraph_spark.nlerrors; parity model query/ontology/error_handling.py)."""

import pytest

from trustgraph_spark.nlerrors import (
    AnswerGenerationError,
    ErrorCategory,
    ErrorContext,
    ErrorRecoveryStrategy,
    ErrorReporter,
    ErrorSeverity,
    OntoRAGError,
    QueryExecutionError,
    with_error_handling,
)
from trustgraph_spark.nlquery import QuestionType


class _Rng:
    """Deterministic rng: random() always 0.5 (jitter factor exactly 1.0),
    choice() returns the first option."""

    def random(self):
        return 0.5

    def choice(self, seq):
        return seq[0]


def _ctx(cat, retries=0):
    return ErrorContext(
        category=cat, severity=ErrorSeverity.MEDIUM,
        component="test", operation="op", retry_count=retries,
    )


def test_retry_with_exponential_backoff_then_success():
    sleeps = []
    s = ErrorRecoveryStrategy(sleep=sleeps.append, rng=_Rng())
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 2:
            raise QueryExecutionError("transient")
        return "ok"

    ctx = _ctx(ErrorCategory.QUERY_EXECUTION)
    out = s.handle_error(QueryExecutionError("boom"), ctx, flaky)
    assert out == "ok"
    # base_delay 1.0, exponential x jitter(=1.0): 1.0 then 2.0
    assert sleeps == [1.0, 2.0]
    assert ctx.retry_count == 2


def test_unretryable_exception_falls_back():
    s = ErrorRecoveryStrategy(sleep=lambda d: None, rng=_Rng())
    # ValueError is not in QUERY_EXECUTION's retry_on_exceptions
    out = s.handle_error(
        ValueError("nope"), _ctx(ErrorCategory.QUERY_EXECUTION),
        lambda: pytest.fail("must not retry"),
    )
    assert out == []  # the empty-results execution fallback


def test_retries_exhausted_uses_fallback():
    s = ErrorRecoveryStrategy(sleep=lambda d: None, rng=_Rng())

    def always_fails():
        raise AnswerGenerationError("still broken")

    out = s.handle_error(
        AnswerGenerationError("x"), _ctx(ErrorCategory.ANSWER_GENERATION),
        always_fails,
    )
    # deterministic rng -> first apology message
    assert out.startswith("I'm experiencing some technical difficulties")


def test_circuit_breaker_opens_and_resets():
    now = [0.0]
    s = ErrorRecoveryStrategy(
        config={"circuit_breaker_threshold": 3, "circuit_breaker_window": 100},
        sleep=lambda d: None, rng=_Rng(), clock=lambda: now[0],
    )
    ctx_cat = ErrorCategory.BACKEND_CONNECTION
    calls = {"n": 0}

    def fails():
        calls["n"] += 1
        raise ConnectionError("down")

    # each handle_error bumps the counter; exhausting retries per call
    for _ in range(3):
        s.handle_error(ConnectionError("down"), _ctx(ctx_cat, retries=99),
                       fails)
    assert calls["n"] == 0  # retries=99 >= max_retries -> straight fallback
    # counter reached threshold -> circuit open -> fallback without retry
    ctx = _ctx(ctx_cat)
    out = s.handle_error(ConnectionError("down"), ctx, fails)
    assert out is None and ctx.retry_count == 0
    # window expiry resets the breaker
    now[0] = 200.0
    def flaky_once():
        if calls["n"] == 0:
            calls["n"] += 1
            raise ConnectionError("down")
        return "up"
    assert s.handle_error(ConnectionError("x"), _ctx(ctx_cat), flaky_once) == "up"


def test_fallback_question_analysis_shapes():
    s = ErrorRecoveryStrategy(sleep=lambda d: None, rng=_Rng())
    c = s._fallback_question_analysis(
        _ctx(ErrorCategory.QUESTION_ANALYSIS),
        "how many widgets does the factory have",
    )
    assert c.question_type == QuestionType.AGGREGATION
    assert c.aggregations == ["count"]
    assert len(c.entities) <= 3 and len(c.keywords) <= 5
    assert "factory" in c.entities or "widgets" in c.entities
    c2 = s._fallback_question_analysis(
        _ctx(ErrorCategory.QUESTION_ANALYSIS), "is the gateway online"
    )
    assert c2.question_type == QuestionType.BOOLEAN
    c3 = s._fallback_question_analysis(
        _ctx(ErrorCategory.QUESTION_ANALYSIS), "what devices exist"
    )
    assert c3.question_type == QuestionType.RETRIEVAL


def test_fallback_query_generation_executes(spark):
    """The safety query is valid SPARQL against the real engine."""
    from trustgraph_spark.sparql import sparql_select

    s = ErrorRecoveryStrategy(sleep=lambda d: None, rng=_Rng())
    gen = s._fallback_query_generation(_ctx(ErrorCategory.QUERY_GENERATION))
    edges = spark.createDataFrame(
        [("default", "", f"http://e/s{i}", "http://e/p", f"o{i}", "l", "", "")
         for i in range(15)],
        "collection string, g string, s string, p string, o string, "
        "otype string, dtype string, lang string",
    )
    assert sparql_select(edges, gen.query).count() == 10  # LIMIT 10


def test_decorator_wraps_and_delegates():
    @with_error_handling(ErrorCategory.QUERY_GENERATION, "gen", "make")
    def free_fn():
        raise ValueError("inner")

    with pytest.raises(OntoRAGError) as ei:
        free_fn()
    assert ei.value.context.category == ErrorCategory.QUERY_GENERATION
    assert ei.value.context.component == "gen"
    assert isinstance(ei.value.cause, ValueError)

    class Svc:
        def __init__(self):
            self._error_strategy = ErrorRecoveryStrategy(
                sleep=lambda d: None, rng=_Rng()
            )

        @with_error_handling(ErrorCategory.QUERY_EXECUTION, "svc", "run")
        def run(self):
            raise ValueError("not retryable")

    # delegated: the category fallback receives the method's self as a
    # stray positional arg and raises (the reference's fallback
    # signatures have the same shape), so the DEFAULT execution fallback
    # answers
    assert Svc().run() == {"error": "Query execution failed", "results": []}


def test_error_reporter_summary_and_trim():
    now = [1000.0]
    r = ErrorReporter({"max_log_size": 5}, clock=lambda: now[0])
    for i in range(7):
        err = OntoRAGError(
            f"e{i}",
            _ctx(ErrorCategory.CACHE_ERROR if i % 2 else
                 ErrorCategory.TIMEOUT_ERROR),
        )
        err.timestamp = 900.0 if i < 2 else 999.0
        r.report_error(err)
    assert len(r.error_log) == 5  # trimmed
    summary = r.get_error_summary()
    assert summary["total_errors"] == 5
    assert summary["recent_errors"] == 5  # all within the hour
    assert summary["most_recent_error"]["message"] == "e6"
    now[0] = 999.0 + 3601
    assert r.get_error_summary()["recent_errors"] == 0
    assert ErrorReporter().get_error_summary() == {"total_errors": 0}
