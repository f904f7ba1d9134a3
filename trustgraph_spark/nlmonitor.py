"""Metrics collection, performance monitoring, and query-pattern analysis
for the NL-query service — the deterministic kernel of
query/ontology/monitoring.py, compacted.

Reference behavior reproduced (not code):
- MetricsCollector (:80-277): labeled counters / gauges / timers with
  the ``name{k=v,...}`` key encoding, timer percentile stats (count /
  sum / avg / min / max / p50 / p95 / p99 over the last 1000 samples),
  retention cleanup
- PerformanceMonitor (:300-552): request recording (totals / successes /
  failures / durations), query-complexity and cache-access and
  ontology-selection gauges, per-component PerformanceStats with
  percentiles + error rate + 1-minute throughput, SystemHealth with the
  10% / 30% error-rate thresholds, and the performance report (top slow
  operations by p95, per-cache-type hit rates)
- monitor_performance decorator (:571-633, sync arm)
- QueryPatternAnalyzer (:636-759): per-(question_type, entity_count)
  pattern log with 24h retention, slow-pattern (>5s) and low-success
  (<0.8) detection, per-backend latency stats, recommendation strings

Differences, deliberate: no background cleanup thread (the reference
spawns a daemon; here ``cleanup_old_metrics`` is on-demand — a Spark
driver's lifecycle owns its threads) and ``clock`` is injectable so
retention / throughput / health math is exactly testable.  The batch
pipeline's own metrics live in pipeline.Pipeline.metrics; this module is
the per-request service twin.
"""

from __future__ import annotations

import re
import statistics
import time
from collections import defaultdict, deque
from dataclasses import dataclass, field
from enum import Enum
from functools import wraps


class MetricType(Enum):
    COUNTER = "counter"
    GAUGE = "gauge"
    HISTOGRAM = "histogram"
    TIMER = "timer"


@dataclass
class Metric:
    name: str
    value: float
    timestamp: float
    labels: dict = field(default_factory=dict)
    metric_type: MetricType = MetricType.GAUGE


@dataclass
class PerformanceStats:
    total_requests: int = 0
    successful_requests: int = 0
    failed_requests: int = 0
    avg_response_time: float = 0.0
    min_response_time: float = float("inf")
    max_response_time: float = 0.0
    p95_response_time: float = 0.0
    p99_response_time: float = 0.0
    throughput_per_second: float = 0.0
    error_rate: float = 0.0


@dataclass
class SystemHealth:
    status: str = "healthy"  # healthy | degraded | unhealthy
    uptime_seconds: float = 0.0
    cache_hit_rate: float = 0.0
    error_rate: float = 0.0


def _build_key(name: str, labels: dict | None) -> str:
    if not labels:
        return name
    label_str = ",".join(f"{k}={v}" for k, v in sorted(labels.items()))
    return f"{name}{{{label_str}}}"


def _extract_metric_label(metric_key: str, label: str) -> str | None:
    """Pull one label value back out of a ``name{k=v,...}`` key
    (monitoring.py:280-297)."""
    start = metric_key.find("{")
    end = metric_key.find("}", start + 1)
    if start == -1 or end == -1:
        return None
    labels = metric_key[start + 1:end]
    m = re.search(rf'(?:^|,){re.escape(label)}=(?:"([^"]*)"|([^,]*))', labels)
    if not m:
        return None
    quoted, unquoted = m.groups()
    return quoted if quoted is not None else unquoted


#: timer samples kept per key (monitoring.py:137)
_MAX_TIMER_VALUES = 1000


class MetricsCollector:
    """Labeled counters / gauges / timers with bounded retention
    (monitoring.py:80-277)."""

    def __init__(self, max_metrics: int = 10000, retention_hours: int = 24,
                 clock=time.time):
        self.max_metrics = max_metrics
        self.retention_hours = retention_hours
        self._clock = clock
        self.metrics: dict[str, deque] = defaultdict(
            lambda: deque(maxlen=max_metrics)
        )
        self.counters: dict[str, float] = defaultdict(float)
        self.gauges: dict[str, float] = defaultdict(float)
        self.timers: dict[str, list[float]] = defaultdict(list)

    def increment(self, name: str, value: float = 1.0, labels: dict | None = None):
        self.counters[_build_key(name, labels)] += value
        self._add(name, value, MetricType.COUNTER, labels)

    def set_gauge(self, name: str, value: float, labels: dict | None = None):
        self.gauges[_build_key(name, labels)] = value
        self._add(name, value, MetricType.GAUGE, labels)

    def record_timer(self, name: str, duration: float, labels: dict | None = None):
        key = _build_key(name, labels)
        self.timers[key].append(duration)
        if len(self.timers[key]) > _MAX_TIMER_VALUES:
            self.timers[key] = self.timers[key][-_MAX_TIMER_VALUES:]
        self._add(name, duration, MetricType.TIMER, labels)

    def get_counter(self, name: str, labels: dict | None = None) -> float:
        return self.counters.get(_build_key(name, labels), 0.0)

    def get_gauge(self, name: str, labels: dict | None = None) -> float:
        return self.gauges.get(_build_key(name, labels), 0.0)

    def get_timer_stats(self, key_or_name: str, labels: dict | None = None) -> dict:
        """count/sum/avg/min/max + index-based p50/p95/p99
        (monitoring.py:191-217).  Accepts a bare name+labels or an
        already-built key."""
        key = _build_key(key_or_name, labels)
        values = self.timers.get(key, [])
        if not values:
            return {}
        s = sorted(values)
        return {
            "count": len(values),
            "sum": sum(values),
            "avg": statistics.mean(values),
            "min": min(values),
            "max": max(values),
            "p50": s[int(len(s) * 0.5)],
            "p95": s[int(len(s) * 0.95)],
            "p99": s[int(len(s) * 0.99)],
        }

    def get_metrics(self, name_pattern: str | None = None,
                    since: float | None = None) -> list[Metric]:
        cutoff = since if since is not None else (
            self._clock() - self.retention_hours * 3600
        )
        out = []
        for name, q in self.metrics.items():
            if name_pattern and name_pattern not in name:
                continue
            out.extend(m for m in q if m.timestamp >= cutoff)
        return sorted(out, key=lambda m: m.timestamp)

    def cleanup_old_metrics(self):
        cutoff = self._clock() - self.retention_hours * 3600
        for name in list(self.metrics):
            q = self.metrics[name]
            while q and q[0].timestamp < cutoff:
                q.popleft()
            if not q:
                del self.metrics[name]

    def _add(self, name: str, value: float, mtype: MetricType,
             labels: dict | None):
        self.metrics[name].append(Metric(
            name=name, value=value, timestamp=self._clock(),
            labels=labels or {}, metric_type=mtype,
        ))


class PerformanceMonitor:
    """Request / cache / complexity / ontology-selection monitoring with
    per-component stats and system health (monitoring.py:300-552).
    config: enabled, max_metrics, retention_hours."""

    def __init__(self, config: dict | None = None, clock=time.time):
        self.config = config or {}
        self._clock = clock
        self.metrics_collector = MetricsCollector(
            max_metrics=self.config.get("max_metrics", 10000),
            retention_hours=self.config.get("retention_hours", 24),
            clock=clock,
        )
        self.component_stats: dict[str, PerformanceStats] = {}
        self.start_time = clock()
        self.monitoring_enabled = self.config.get("enabled", True)

    def record_request(self, component: str, operation: str, duration: float,
                       success: bool = True, labels: dict | None = None):
        if not self.monitoring_enabled:
            return
        base = {"component": component, "operation": operation}
        if labels:
            base.update(labels)
        mc = self.metrics_collector
        mc.increment("requests_total", labels=base)
        mc.record_timer("request_duration", duration, base)
        mc.increment(
            "requests_successful" if success else "requests_failed",
            labels=base,
        )
        self._update_component_stats(component, duration, success)

    def record_query_complexity(self, complexity_score: float,
                                query_type: str, backend: str):
        if self.monitoring_enabled:
            self.metrics_collector.set_gauge(
                "query_complexity", complexity_score,
                {"query_type": query_type, "backend": backend},
            )

    def record_cache_access(self, hit: bool, cache_type: str = "default"):
        if not self.monitoring_enabled:
            return
        labels = {"cache_type": cache_type}
        mc = self.metrics_collector
        mc.increment("cache_requests_total", labels=labels)
        mc.increment("cache_hits_total" if hit else "cache_misses_total",
                     labels=labels)

    def record_ontology_selection(self, selected_elements: int,
                                  total_elements: int, ontology_id: str):
        if not self.monitoring_enabled:
            return
        labels = {"ontology_id": ontology_id}
        mc = self.metrics_collector
        mc.set_gauge("ontology_elements_selected", selected_elements, labels)
        mc.set_gauge("ontology_elements_total", total_elements, labels)
        mc.set_gauge(
            "ontology_selection_ratio",
            selected_elements / total_elements if total_elements else 0,
            labels,
        )

    def get_component_stats(self, component: str) -> PerformanceStats | None:
        return self.component_stats.get(component)

    def get_system_health(self) -> SystemHealth:
        """Error-rate thresholds: >10% degraded, >30% unhealthy
        (monitoring.py:443-448)."""
        mc = self.metrics_collector
        total = sum(
            v for k, v in mc.counters.items() if k.startswith("requests_total")
        )
        failed = sum(
            v for k, v in mc.counters.items() if k.startswith("requests_failed")
        )
        error_rate = failed / total if total else 0.0
        hits = sum(
            v for k, v in mc.counters.items() if k.startswith("cache_hits_total")
        )
        cache_reqs = sum(
            v for k, v in mc.counters.items()
            if k.startswith("cache_requests_total")
        )
        status = "healthy"
        if error_rate > 0.1:
            status = "degraded"
        if error_rate > 0.3:
            status = "unhealthy"
        return SystemHealth(
            status=status,
            uptime_seconds=self._clock() - self.start_time,
            error_rate=error_rate,
            cache_hit_rate=hits / cache_reqs if cache_reqs else 0.0,
        )

    def get_performance_report(self) -> dict:
        """Health + component stats + top-10 slow operations by p95 +
        per-cache-type hit rates (monitoring.py:457-514)."""
        mc = self.metrics_collector
        report: dict = {
            "system_health": self.get_system_health(),
            "component_stats": dict(self.component_stats),
            "top_slow_operations": [],
            "cache_performance": {},
        }
        timer_stats = {
            key: mc.get_timer_stats(key)
            for key in mc.timers
            if "request_duration" in key and mc.timers[key]
        }
        slow = sorted(
            timer_stats.items(), key=lambda x: x[1].get("p95", 0), reverse=True
        )[:10]
        report["top_slow_operations"] = [
            {"operation": k, "stats": v} for k, v in slow
        ]
        cache_types = {
            t for k in mc.counters
            if (t := _extract_metric_label(k, "cache_type")) is not None
        }
        for ct in sorted(cache_types):
            labels = {"cache_type": ct}
            hits = mc.get_counter("cache_hits_total", labels)
            reqs = mc.get_counter("cache_requests_total", labels)
            report["cache_performance"][ct] = {
                "hit_rate": hits / reqs if reqs else 0.0,
                "total_requests": reqs,
                "total_hits": hits,
            }
        return report

    def _update_component_stats(self, component: str, duration: float,
                                success: bool):
        stats = self.component_stats.setdefault(component, PerformanceStats())
        stats.total_requests += 1
        if success:
            stats.successful_requests += 1
        else:
            stats.failed_requests += 1
        stats.min_response_time = min(stats.min_response_time, duration)
        stats.max_response_time = max(stats.max_response_time, duration)
        # percentiles come from the per-component timer key; note the
        # reference computes them from {component}-only labels while
        # record_request stores {component, operation} keys — matching
        # keys exist only when record_request is called without an
        # operation split, so fall back to scanning per-component keys
        vals: list[float] = []
        for key, samples in self.metrics_collector.timers.items():
            if key.startswith("request_duration") and (
                _extract_metric_label(key, "component") == component
            ):
                vals.extend(samples)
        if vals:
            s = sorted(vals)
            stats.avg_response_time = statistics.mean(vals)
            stats.p95_response_time = s[int(len(s) * 0.95)]
            stats.p99_response_time = s[int(len(s) * 0.99)]
        stats.error_rate = stats.failed_requests / stats.total_requests
        cutoff = self._clock() - 60
        recent = [
            m for m in self.metrics_collector.get_metrics("requests_total")
            if m.labels.get("component") == component and m.timestamp > cutoff
        ]
        stats.throughput_per_second = len(recent) / 60.0


def monitor_performance(component: str, operation: str,
                        monitor: PerformanceMonitor | None = None):
    """Decorator timing + recording a call through the monitor
    (monitoring.py:571-633, sync arm)."""

    def decorator(func):
        @wraps(func)
        def wrapper(*args, **kwargs):
            if not monitor or not monitor.monitoring_enabled:
                return func(*args, **kwargs)
            t0 = monitor._clock()
            success = True
            try:
                return func(*args, **kwargs)
            except Exception:
                success = False
                raise
            finally:
                monitor.record_request(
                    component, operation, monitor._clock() - t0, success
                )

        return wrapper

    return decorator


class QueryPatternAnalyzer:
    """Pattern log keyed (question_type, entity_count) with slow-pattern
    and failure detection + recommendations (monitoring.py:636-759)."""

    #: slow-pattern threshold seconds (:708) and success-rate floor (:716)
    SLOW_SECONDS = 5.0
    MIN_SUCCESS_RATE = 0.8

    def __init__(self, monitor: PerformanceMonitor, clock=time.time):
        self.monitor = monitor
        self._clock = clock
        self.query_patterns: dict[str, list[dict]] = defaultdict(list)

    def record_query_pattern(self, question_type: str, entities: list[str],
                             complexity: float, backend: str,
                             duration: float, success: bool):
        key = f"{question_type}:{len(entities)}"
        self.query_patterns[key].append({
            "timestamp": self._clock(),
            "question_type": question_type,
            "entity_count": len(entities),
            "entities": entities,
            "complexity": complexity,
            "backend": backend,
            "duration": duration,
            "success": success,
        })
        cutoff = self._clock() - 24 * 3600
        self.query_patterns[key] = [
            p for p in self.query_patterns[key] if p["timestamp"] > cutoff
        ]

    def get_optimization_insights(self) -> dict:
        insights: dict = {
            "slow_patterns": [],
            "common_failures": [],
            "backend_performance": {},
            "recommendations": [],
        }
        for key, patterns in self.query_patterns.items():
            if not patterns:
                continue
            avg = statistics.mean(p["duration"] for p in patterns)
            ok = sum(1 for p in patterns if p["success"]) / len(patterns)
            if avg > self.SLOW_SECONDS:
                insights["slow_patterns"].append({
                    "pattern": key, "avg_duration": avg,
                    "count": len(patterns), "success_rate": ok,
                })
            if ok < self.MIN_SUCCESS_RATE:
                insights["common_failures"].append({
                    "pattern": key, "success_rate": ok, "count": len(patterns),
                })
        backend_durations: dict[str, list[float]] = defaultdict(list)
        for patterns in self.query_patterns.values():
            for p in patterns:
                backend_durations[p["backend"]].append(p["duration"])
        for backend, ds in backend_durations.items():
            s = sorted(ds)
            insights["backend_performance"][backend] = {
                "avg_duration": statistics.mean(ds),
                "p95_duration": s[int(len(s) * 0.95)],
                "query_count": len(ds),
            }
        recs = [
            f"Consider optimizing {sp['pattern']} queries - "
            f"average duration {sp['avg_duration']:.2f}s"
            for sp in insights["slow_patterns"]
        ]
        if len(insights["backend_performance"]) > 1:
            fastest = min(
                insights["backend_performance"].items(),
                key=lambda x: x[1]["avg_duration"],
            )[0]
            recs.append(
                f"Consider routing more queries to {fastest} "
                f"for better performance"
            )
        insights["recommendations"] = recs
        return insights
