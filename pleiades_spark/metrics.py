"""Prometheus-text observability surface.

The reference instruments every personality: the web server counts
requests per route (/root/reference/pkg/web/prom_middleware.go:42-51),
the ingester/aggregator export per-event counters and histograms
(pkg/ingester/publisher/kafka/prometheus.go:42-93), all scraped from a
/metrics endpoint.

Spark-first mapping: per-event instrumentation becomes zero-cost
``DataFrame.observe`` metrics that ride the existing plan
(streaming/pipeline.py counters_stream observes rows + malformed per
micro-batch) and are read off ``StreamingQueryProgress``; serving-side
request counts are a driver-local dict. This module renders both as
Prometheus text exposition format — no client library needed, the text
format is a stable public contract.
"""

from __future__ import annotations

import threading
from collections import Counter
from typing import Iterable, Mapping


def _esc(v: str) -> str:
    return str(v).replace("\\", "\\\\").replace('"', '\\"')


def _fmt_labels(labels: Mapping[str, str] | None) -> str:
    if not labels:
        return ""
    inner = ",".join(f'{k}="{_esc(v)}"' for k, v in sorted(labels.items()))
    return "{" + inner + "}"


class PromRegistry:
    """Minimal thread-safe counter/gauge registry with text rendering."""

    def __init__(self) -> None:
        self._lock = threading.Lock()
        self._counters: Counter = Counter()
        self._types: dict[str, str] = {}
        self._help: dict[str, str] = {}
        self._gauges: dict[tuple, float] = {}

    def describe(self, name: str, mtype: str, help_text: str) -> None:
        self._types[name] = mtype
        self._help[name] = help_text

    def inc(self, name: str, labels: Mapping[str, str] | None = None, by: float = 1) -> None:
        with self._lock:
            self._types.setdefault(name, "counter")
            self._counters[(name, _fmt_labels(labels))] += by

    def set_gauge(self, name: str, value: float, labels: Mapping[str, str] | None = None) -> None:
        with self._lock:
            self._types.setdefault(name, "gauge")
            self._gauges[(name, _fmt_labels(labels))] = value

    def render(self, extra_lines: Iterable[str] = ()) -> str:
        with self._lock:
            series = list(self._counters.items()) + list(self._gauges.items())
        by_name: dict[str, list[str]] = {}
        for (name, labelstr), value in sorted(series):
            fval = f"{value:g}" if isinstance(value, float) else str(value)
            by_name.setdefault(name, []).append(f"{name}{labelstr} {fval}")
        out: list[str] = []
        for name in sorted(by_name):
            if name in self._help:
                out.append(f"# HELP {name} {self._help[name]}")
            out.append(f"# TYPE {name} {self._types.get(name, 'untyped')}")
            out.extend(by_name[name])
        out.extend(extra_lines)
        return "\n".join(out) + "\n"


def streaming_observed_totals(query) -> dict[str, float]:
    """Sum each observed metric across a StreamingQuery's recentProgress.

    counters_stream names its observation "ingest" with ``rows`` and
    ``malformed`` columns — the reference's events-consumed / parse-error
    prometheus counters (kafka/aggregator.go:69-76) at micro-batch grain.
    recentProgress holds the last ~100 batches; for a long-lived exporter,
    accumulate per-batch deltas from a StreamingQueryListener instead.
    """
    totals: Counter = Counter()
    for progress in query.recentProgress:
        observed = (
            progress.get("observedMetrics", {})
            if isinstance(progress, dict)
            else getattr(progress, "observedMetrics", {}) or {}
        )
        for row in observed.values():
            d = row if isinstance(row, dict) else row.asDict()
            for k, v in d.items():
                if isinstance(v, (int, float)) and v is not None:
                    totals[k] += v
    return dict(totals)


def streaming_metrics_text(query, prefix: str = "pleiades_ingest") -> str:
    """StreamingQueryProgress observed metrics → Prometheus text."""
    reg = PromRegistry()
    for name, value in sorted(streaming_observed_totals(query).items()):
        metric = f"{prefix}_{name}_total"
        reg.describe(metric, "counter", f"observed streaming metric {name}")
        reg.inc(metric, by=value)
    return reg.render()
