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


def test_dashboard_series_are_exported():
    """Every series referenced by dashboard.json's panel exprs must be
    one the code actually exports — a renamed metric or a stale panel
    breaks here, not in Grafana. The exported set is collected from the
    serving registry (cli.make_handler describes its series up front)
    and the streaming exporter's naming contract."""
    import json
    import pathlib
    import re

    dash = json.loads(
        (pathlib.Path(__file__).resolve().parent.parent / "dashboard.json").read_text()
    )
    referenced = set()
    for panel in dash["panels"]:
        for target in panel.get("targets", []):
            referenced |= set(re.findall(r"pleiades_[a-z_]+", target["expr"]))
    assert referenced, "dashboard references no pleiades series"

    import pleiades_spark.cli as cli_mod

    cli_src = pathlib.Path(cli_mod.__file__).read_text()
    serving = set(re.findall(r'"(pleiades_[a-z_]+)"', cli_src))
    streaming = {"pleiades_ingest_rows_total", "pleiades_ingest_malformed_total"}
    # the streaming names derive from observe("ingest", rows, malformed)
    # + the streaming_metrics_text prefix contract; pin both ends
    text = streaming_metrics_text(_FakeQuery())
    assert all(s in text for s in streaming)
    exported = serving | streaming
    missing = referenced - exported
    assert not missing, f"dashboard references unexported series: {missing}"
