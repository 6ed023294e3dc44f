"""Prometheus text rendering + streaming observed-metric extraction."""

from pleiades_spark.metrics import (
    PromRegistry,
    streaming_metrics_text,
    streaming_observed_totals,
)


def test_registry_render_counter_and_gauge():
    reg = PromRegistry()
    reg.describe("x_total", "counter", "an x")
    reg.inc("x_total", {"route": "/a"}, by=2)
    reg.inc("x_total", {"route": "/a"})
    reg.set_gauge("g", 1.5, {"k": 'quo"te'})
    text = reg.render()
    assert "# HELP x_total an x" in text
    assert "# TYPE x_total counter" in text
    assert 'x_total{route="/a"} 3' in text
    assert 'g{k="quo\\"te"} 1.5' in text


class _FakeQuery:
    # recentProgress rows as PySpark returns them (dicts)
    recentProgress = [
        {"observedMetrics": {"ingest": {"rows": 100, "malformed": 2}}},
        {"observedMetrics": {"ingest": {"rows": 50, "malformed": 0}}},
        {"observedMetrics": {}},
    ]


def test_streaming_observed_totals_sum_across_batches():
    assert streaming_observed_totals(_FakeQuery()) == {"rows": 150, "malformed": 2}


def test_streaming_metrics_text_format():
    text = streaming_metrics_text(_FakeQuery())
    assert "pleiades_ingest_rows_total 150" in text
    assert "pleiades_ingest_malformed_total 2" in text
    assert "# TYPE pleiades_ingest_rows_total counter" in text
