"""Metrics + performance monitoring for the NL-query service
(trustgraph_spark.nlmonitor; parity model query/ontology/monitoring.py)."""

import pytest

from trustgraph_spark.nlmonitor import (
    MetricsCollector,
    PerformanceMonitor,
    QueryPatternAnalyzer,
    _build_key,
    _extract_metric_label,
    monitor_performance,
)


class _Clock:
    def __init__(self):
        self.t = 1000.0

    def __call__(self):
        return self.t


def test_metric_keys_and_label_extraction():
    assert _build_key("x", None) == "x"
    k = _build_key("req", {"b": "2", "a": "1"})
    assert k == "req{a=1,b=2}"  # labels sorted
    assert _extract_metric_label(k, "a") == "1"
    assert _extract_metric_label(k, "b") == "2"
    assert _extract_metric_label(k, "c") is None
    assert _extract_metric_label("plain", "a") is None


def test_collector_counters_gauges_timers():
    clk = _Clock()
    mc = MetricsCollector(clock=clk)
    mc.increment("reqs", labels={"c": "x"})
    mc.increment("reqs", 2.0, labels={"c": "x"})
    assert mc.get_counter("reqs", {"c": "x"}) == 3.0
    assert mc.get_counter("reqs", {"c": "y"}) == 0.0
    mc.set_gauge("g", 0.7)
    assert mc.get_gauge("g") == 0.7
    for d in [0.1, 0.2, 0.3, 0.4, 1.0]:
        mc.record_timer("dur", d)
    st = mc.get_timer_stats("dur")
    assert st["count"] == 5 and st["min"] == 0.1 and st["max"] == 1.0
    assert st["avg"] == pytest.approx(0.4)
    assert st["p50"] == 0.3  # index-based percentile (reference math)
    assert st["p95"] == 1.0
    assert mc.get_timer_stats("missing") == {}


def test_collector_retention_cleanup():
    clk = _Clock()
    mc = MetricsCollector(retention_hours=1, clock=clk)
    mc.increment("old")
    clk.t += 3700  # past retention
    mc.increment("fresh")
    assert len(mc.get_metrics()) == 1  # old filtered out of reads
    mc.cleanup_old_metrics()
    assert "old" not in mc.metrics and "fresh" in mc.metrics


def test_monitor_stats_health_and_report():
    clk = _Clock()
    m = PerformanceMonitor(clock=clk)
    for i in range(8):
        m.record_request("sparql", "select", 0.1 * (i + 1), success=True)
    m.record_request("sparql", "select", 2.0, success=False)
    m.record_cache_access(True, "results")
    m.record_cache_access(False, "results")
    m.record_query_complexity(0.3, "SELECT", "spark")
    m.record_ontology_selection(4, 6, "kb")

    st = m.get_component_stats("sparql")
    assert st.total_requests == 9 and st.failed_requests == 1
    assert st.error_rate == pytest.approx(1 / 9)
    assert st.min_response_time == pytest.approx(0.1)
    assert st.max_response_time == 2.0
    assert st.throughput_per_second == pytest.approx(9 / 60.0)

    h = m.get_system_health()
    assert h.status == "degraded"  # 11% error rate > 10%
    assert h.cache_hit_rate == 0.5
    assert h.error_rate == pytest.approx(1 / 9)

    rep = m.get_performance_report()
    assert rep["cache_performance"]["results"]["hit_rate"] == 0.5
    assert rep["top_slow_operations"][0]["stats"]["count"] == 9
    assert m.metrics_collector.get_gauge(
        "ontology_selection_ratio", {"ontology_id": "kb"}
    ) == pytest.approx(4 / 6)


def test_health_thresholds():
    m = PerformanceMonitor(clock=_Clock())
    for _ in range(6):
        m.record_request("c", "o", 0.1, success=True)
    for _ in range(4):
        m.record_request("c", "o", 0.1, success=False)
    assert m.get_system_health().status == "unhealthy"  # 40% > 30%
    m2 = PerformanceMonitor(clock=_Clock())
    m2.record_request("c", "o", 0.1, success=True)
    assert m2.get_system_health().status == "healthy"


def test_monitor_decorator_and_disabled():
    clk = _Clock()
    m = PerformanceMonitor(clock=clk)

    @monitor_performance("svc", "op", m)
    def work(x):
        clk.t += 0.5
        if x < 0:
            raise ValueError("bad")
        return x * 2

    assert work(3) == 6
    with pytest.raises(ValueError):
        work(-1)
    st = m.get_component_stats("svc")
    assert st.total_requests == 2 and st.failed_requests == 1
    assert st.min_response_time == pytest.approx(0.5)

    off = PerformanceMonitor({"enabled": False}, clock=clk)

    @monitor_performance("svc", "op", off)
    def quiet():
        return 1

    assert quiet() == 1
    assert off.get_component_stats("svc") is None


def test_pattern_analyzer_insights():
    clk = _Clock()
    m = PerformanceMonitor(clock=clk)
    a = QueryPatternAnalyzer(m, clock=clk)
    # slow + failing pattern
    for ok in (True, False, False):
        a.record_query_pattern("retrieval", ["Device"], 0.3, "spark", 6.0, ok)
    # fast healthy pattern on a second backend
    for _ in range(4):
        a.record_query_pattern("aggregation", [], 0.2, "duck", 0.5, True)
    ins = a.get_optimization_insights()
    assert ins["slow_patterns"][0]["pattern"] == "retrieval:1"
    assert ins["common_failures"][0]["success_rate"] == pytest.approx(1 / 3)
    assert set(ins["backend_performance"]) == {"spark", "duck"}
    recs = " ".join(ins["recommendations"])
    assert "retrieval:1" in recs and "duck" in recs  # duck is faster

    # 24h retention: old patterns age out
    clk.t += 25 * 3600
    a.record_query_pattern("retrieval", ["Device"], 0.3, "spark", 0.1, True)
    assert len(a.query_patterns["retrieval:1"]) == 1
