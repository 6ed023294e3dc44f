"""End-to-end test of the three personalities: ingest → aggregate → serve."""

import json
import threading
import urllib.request
from http.server import ThreadingHTTPServer

from pleiades_spark.cli import build_parser, make_handler

WIRE = """\
id: [{{"topic":"t","partition":0,"timestamp":{ts1}}}]
event: message
data: {{"wiki":"hewiki","type":"edit","bot":true,"minor":true,"length":{{"old":10,"new":25}},"timestamp":1596207527}}

: comment line heartbeats are skipped
id: [{{"topic":"t","partition":0,"timestamp":{ts2}}}]
event: message
data: {{"wiki":"enwiki","type":"new","bot":false,"length":{{"old":0,"new":40}},"timestamp":1596293927}}

""".format(ts1=1596207527001, ts2=1596293927001)


def test_ingest_aggregate_serve_roundtrip(spark, tmp_path):
    wire = tmp_path / "events.sse"
    wire.write_text(WIRE)
    queue_dir = tmp_path / "queue"
    counters_dir = tmp_path / "counters"
    parser = build_parser()

    # ingest: SSE wire → file queue
    args = parser.parse_args(
        ["ingest", "--sse-file", str(wire), "--out-dir", str(queue_dir)]
    )
    assert args.fn(args) == 0
    assert len(list(queue_dir.glob("*-event-*.dat"))) == 2

    # aggregate: file queue → counters parquet
    args = parser.parse_args(
        ["aggregate", "--in-dir", str(queue_dir), "--out", str(counters_dir)]
    )
    assert args.fn(args) == 0
    counters = spark.read.parquet(str(counters_dir))
    rows = {(r.day, r.counter): (r.events, r.growth) for r in counters.collect()}
    assert rows[(None, "pleiades_total")] == (2, 55)  # 15 + 40
    assert rows[(18474, "pleiades_length_inc")] == (1, 15)
    assert rows[(18475, "pleiades_wiki_enwiki")] == (1, 40)

    # day-partitioned layout: a single-day read prunes to one partition
    # (the Redis KEYS day_<d>_* scan become partition pruning)
    import io
    from contextlib import redirect_stdout

    from pyspark.sql import functions as F

    buf = io.StringIO()
    with redirect_stdout(buf):
        spark.read.parquet(str(counters_dir)).filter(
            F.col("day") == 18474
        ).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters: [isnotnull(day" in plan and "= 18474" in plan

    # serve: REST API over the counters table
    server = ThreadingHTTPServer(
        ("127.0.0.1", 0), make_handler(spark, str(counters_dir))
    )
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_port}"
        days = json.load(urllib.request.urlopen(f"{base}/api/days"))
        assert days["Days"] == [18475, 18474]
        stats = json.load(urllib.request.urlopen(f"{base}/api/stats"))
        assert stats["Since"] == 18475 * 86400
        names = {c["Name"] for c in stats["Counters"]}
        assert "pleiades_wiki_enwiki" in names and "pleiades_total" in names
        day_stats = json.load(urllib.request.urlopen(f"{base}/api/stats/18474"))
        got = {c["Name"]: c["Value"] for c in day_stats["Counters"]}
        assert got["pleiades_bot"] == 1 and got["pleiades_minor"] == 1
        # error paths
        try:
            urllib.request.urlopen(f"{base}/api/stats/notaday")
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        try:
            urllib.request.urlopen(f"{base}/nope")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # over-long stats path must 404, not fall back to latest-day stats
        try:
            urllib.request.urlopen(f"{base}/api/stats/18474/extra")
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        # / serves the SPA-analog page; its JS drives the same API the
        # reference's Vue store consumes, so assert those couplings hold.
        resp = urllib.request.urlopen(f"{base}/")
        assert resp.headers["Content-Type"].startswith("text/html")
        page = resp.read().decode()
        for marker in ("/api/stats", "/api/days", "pleiades_total",
                       "pleiades_type_", "day-select"):
            assert marker in page, marker
        assert urllib.request.urlopen(f"{base}/ui").status == 200

        # /metrics: Prometheus text with request counters + counter gauges
        resp = urllib.request.urlopen(f"{base}/metrics")
        assert resp.headers["Content-Type"].startswith("text/plain")
        body = resp.read().decode()
        assert "# TYPE pleiades_http_requests_total counter" in body
        assert 'pleiades_http_requests_total{route="/api/days",status="200"} 1' in body
        assert 'pleiades_counter_events{counter="pleiades_total"} 2' in body
        assert 'pleiades_counter_growth{counter="pleiades_total"} 55' in body
    finally:
        server.shutdown()


def test_sql_personality_runs_adhoc_query(spark, capsys):
    """sql personality: fixture tables registered as views, JSONL out."""
    parser = build_parser()
    args = parser.parse_args(
        ["sql",
         "SELECT r_name, count(*) AS n FROM region GROUP BY r_name "
         "ORDER BY r_name",
         "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]
    )
    assert args.fn(args) == 0
    lines = [json.loads(x) for x in capsys.readouterr().out.strip().splitlines()]
    assert len(lines) == 3
    assert lines[0] == {"r_name": "AFRICA", "n": 1}
    # joins across registered views work too
    args = parser.parse_args(
        ["sql",
         "SELECT count(*) AS n FROM nation JOIN region ON n_regionkey = r_regionkey",
         "--sf-dir", "/root/testdata/sf0.001"]
    )
    assert args.fn(args) == 0
    assert json.loads(capsys.readouterr().out.strip())["n"] == 25


def test_corpus_pipeline_end_to_end(spark, tmp_path, capsys):
    """corpus personality: documents → quality/dedup/scrub → split JSONL
    shards, with consistent dataset-card stats."""
    out = tmp_path / "corpus"
    parser = build_parser()
    args = parser.parse_args(
        ["corpus", "--sf-dir", "/root/testdata/sf0.001", "--out", str(out),
         "--shards", "2"]
    )
    assert args.fn(args) == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    # monotone survivor counts, splits partition the final corpus
    assert stats["input"] >= stats["after_quality"] >= stats["after_exact_dedup"]
    assert stats["after_exact_dedup"] >= stats["after_near_dedup"] > 0
    assert (
        stats["train_docs"] + stats["val_docs"] + stats["test_docs"]
        == stats["after_near_dedup"]
    )

    # shards are real JSONL Spark can read back; doc_ids unique & disjoint
    seen = set()
    for split in ("train", "val", "test"):
        back = spark.read.json(str(out / split))
        ids = [r.doc_id for r in back.select("doc_id").collect()]
        assert len(ids) == stats[f"{split}_docs"]
        assert seen.isdisjoint(ids)
        seen.update(ids)
        assert set(back.columns) == {"doc_id", "lang", "source", "text"}


def test_cli_explain(capsys):
    from pleiades_spark.cli import main

    rc = main(["explain", "counters_rollup"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "Physical Plan" in out and "Exchange" in out

    rc = main(["explain", "no_such_query"])
    out = capsys.readouterr().out
    assert rc == 2 and "close:" in out


def test_version_flag():
    """--version prints and exits 0 without touching Spark (cmd/version.go
    parity)."""
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "pleiades_spark", "--version"],
        capture_output=True, text=True, timeout=60, cwd="/root/repo",
    )
    assert r.returncode == 0
    assert r.stdout.strip().startswith("pleiades_spark ")


def test_serve_graceful_shutdown(spark, tmp_path):
    """SIGTERM on the serve personality drains and exits 0 with a clean
    shutdown message (cmd/shutdown.go parity) — subprocess because signal
    handlers only register on a main thread."""
    import signal
    import subprocess
    import sys
    import time

    counters = tmp_path / "counters"
    spark.createDataFrame(
        [(18474, "pleiades_total", 2, 55.0)],
        "day long, counter string, events long, growth double",
    ).write.partitionBy("day").parquet(str(counters))

    proc = subprocess.Popen(
        [sys.executable, "-m", "pleiades_spark", "serve",
         "--counters", str(counters), "--port", "0"],
        stdout=subprocess.PIPE, text=True, cwd="/root/repo",
    )
    try:
        line = ""
        deadline = time.time() + 120
        while time.time() < deadline:
            line = proc.stdout.readline()
            if "serving counters on" in line:
                break
        assert "serving counters on" in line, "server never came up"
        port = int(line.rsplit(":", 1)[1])
        body = json.load(
            urllib.request.urlopen(f"http://127.0.0.1:{port}/api/stats")
        )
        assert body["Counters"][0]["Name"] == "pleiades_total"
        proc.send_signal(signal.SIGTERM)
        out, _ = proc.communicate(timeout=60)
        assert proc.returncode == 0
        assert "shut down cleanly" in out
    finally:
        if proc.poll() is None:
            proc.kill()


def test_corpus_stream_personality_end_to_end(spark, tmp_path, capsys):
    """corpus-stream personality: bootstrap an index over the old half
    of the fixture docs, stream the new half (ingest mode), then
    finalize with an index roll — both verbs print consistent stats and
    the rolled index carries the finalize's merges."""
    from pyspark.sql import functions as F

    from pleiades_spark import catalog
    from pleiades_spark.operators.dedup import write_reps_index

    docs = catalog.load(spark, "/root/testdata/sf0.001", "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    idx = tmp_path / "idx"
    write_reps_index(old, str(idx), 0.6)
    drop = tmp_path / "drop"
    new.write.parquet(str(drop))

    parser = build_parser()
    work = tmp_path / "work"
    args = parser.parse_args(
        ["corpus-stream", "--index", str(idx), "--work", str(work),
         "--in", str(drop)]
    )
    assert args.fn(args) == 0
    ingest = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert ingest["mode"] == "ingest"
    n_kept = sum(ingest["kept"].values())
    assert 0 < n_kept <= ingest["inbox_docs"] <= new.count()

    tomb_out = tmp_path / "tomb.parquet"
    args = parser.parse_args(
        ["corpus-stream", "--finalize", "--index", str(idx),
         "--work", str(work), "--roll", str(tmp_path / "idx_n1"),
         "--tombstones", str(tomb_out)]
    )
    assert args.fn(args) == 0
    fin = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert fin["mode"] == "finalize"
    assert fin["n_tombstones"] >= 0
    # the roll produced a complete, marker-committed index
    assert (tmp_path / "idx_n1" / "_INDEX_OK").exists()
    # tombstoned docs are a subset of the stream's provisional keeps
    if fin["n_tombstones"]:
        kept_ids = {
            r.doc_id
            for r in spark.read.parquet(str(work / "assign"))
            .filter(F.col("rep_id") == F.col("doc_id"))
            .collect()
        }
        tomb_ids = {
            r.doc_id for r in spark.read.parquet(str(tomb_out)).collect()
        }
        assert tomb_ids <= kept_ids

    # compact-shards verb: content preserved, per-split counts unchanged
    n_before = sum(ingest["kept"].values())
    args = parser.parse_args(
        ["corpus-stream", "--compact-shards", "--work", str(work)]
    )
    assert args.fn(args) == 0
    comp = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert comp["mode"] == "compact-shards"
    back = spark.read.schema(
        "doc_id long, lang string, source string, text string, q double"
    ).json(str(work / "shards"))
    assert back.count() == n_before


def test_cli_corpus_stream_empty_ingest_zero_stats(spark, tmp_path, capsys):
    """An ingest where every doc fails the quality gate writes nothing —
    the stats line must report zeros, not crash on a schema-less inbox
    or a partition-dir-less shards dir."""
    import json

    from pyspark.sql import functions as F

    from pleiades_spark.operators.dedup import write_reps_index

    docs = spark.createDataFrame(
        [(i, " ".join(f"a{i}b{j}" for j in range(60)), "en", "s", 400)
         for i in range(4)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    idx = tmp_path / "idx"
    write_reps_index(docs, str(idx), 0.6)
    # all-stopword docs: quality ~0.16 -> every one rejected in-stream
    junk = spark.createDataFrame(
        [(100 + i, "the " * 79 + "the", "en", "s", 320) for i in range(3)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    drop = tmp_path / "drop"
    junk.write.parquet(str(drop))

    parser = build_parser()
    args = parser.parse_args(
        ["corpus-stream", "--index", str(idx),
         "--work", str(tmp_path / "work"), "--in", str(drop)]
    )
    assert args.fn(args) == 0
    got = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert got["inbox_docs"] == 0
    assert got["kept"] == {"train": 0, "val": 0, "test": 0}
