"""The three pleiades personalities as one CLI (cmd/main.go:67-69 parity).

    python -m pleiades_spark ingest    --sse-file WIRE --out-dir DIR
    python -m pleiades_spark aggregate --in-dir DIR --out COUNTERS_DIR
    python -m pleiades_spark serve     --counters COUNTERS_DIR --port 8000

ingest    SSE wire format (live URL, or a captured file for offline use)
          → the reference's one-file-per-event queue (sources/filequeue).
aggregate file queue → recentchange counter derivation → dual-grain
          aggregate → day-partitioned parquet counters table. (The Kafka
          path is streaming/pipeline.kafka_raw_stream + kafka_sink when
          the Kafka package is on the classpath.)
serve     /api/stats, /api/stats/{day}, /api/days over the counters table
          (pkg/web/frontend.go:35-38 route parity) plus /metrics in
          Prometheus text format (prom_middleware.go:42-51 parity),
          stdlib HTTP.
"""

from __future__ import annotations

import argparse
import json
import os
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from pleiades_spark.sources.sse import SSEEvent, parse_sse_lines


def cmd_ingest(args: argparse.Namespace) -> int:
    """SSE → file queue. ``--sse-file`` replays a captured wire dump
    (offline path); ``--url`` subscribes live."""
    events: list[SSEEvent] = []
    if args.sse_file:
        with open(args.sse_file) as f:
            events = list(parse_sse_lines(f))
    elif args.url:
        from pleiades_spark.sources.sse import subscribe

        subscribe(args.url, events.append, resume_id=args.resume_id)
    else:
        raise SystemExit("ingest needs --sse-file or --url")
    os.makedirs(args.out_dir, exist_ok=True)
    for n, ev in enumerate(events):
        with open(os.path.join(args.out_dir, f"0-event-{n}.dat"), "w") as f:
            f.write(f"{ev.id}\n{ev.body}\n")
    print(f"ingested {len(events)} events → {args.out_dir}")
    return 0


def cmd_aggregate(args: argparse.Namespace) -> int:
    """File queue → counters parquet (day-partitioned)."""
    from pleiades_spark.functions.recentchange import aggregate_recentchange
    from pleiades_spark.session import get_spark
    from pleiades_spark.sources.filequeue import read_filequeue

    spark = get_spark("pleiades_aggregate")
    raw = read_filequeue(spark, args.in_dir)
    agg = aggregate_recentchange(raw)
    # day=NULL rows (the all-time grain) land in the default partition and
    # read back as NULL — preserved round-trip.
    agg.write.mode("overwrite").partitionBy("day").parquet(args.out)
    print(f"counters written → {args.out}")
    return 0


def cmd_corpus(args: argparse.Namespace) -> int:
    """Raw documents parquet → quality/dedup/scrub → split JSONL shards.

    The training-data personality: the reference's three personalities
    cover the events pipeline; this one drives the corpus operators
    end-to-end (operators/corpus.build_training_corpus) and prints the
    per-stage dataset-card stats as one JSON line.
    """
    import json

    from pleiades_spark import catalog
    from pleiades_spark.operators.corpus import build_training_corpus
    from pleiades_spark.session import get_spark

    spark = get_spark("pleiades_corpus")
    docs = catalog.load(spark, args.sf_dir, "documents")
    stats = build_training_corpus(docs, args.out, n_shards=args.shards)
    print(json.dumps(stats))
    return 0


def cmd_dedup_nightly(args: argparse.Namespace) -> int:
    """The nightly-dedup personality (round 13): the persisted star
    index's whole lifecycle — bootstrap, O(increment) nightly run +
    roll-forward, and small-file compaction — as one CLI verb, so a
    production nightly is a cron line, not a Python session. Three
    mutually exclusive modes:

        # night 0: bootstrap the index from the full corpus
        dedup-nightly --modality doc --bootstrap --in corpus.parquet \\
                      --index idx_n0

        # night N: assign old ∪ new, roll the index forward
        dedup-nightly --modality doc --in tonight.parquet --index idx_n0 \\
                      --roll idx_n1 [--out assignments.parquet]

        # periodically: compact the artifact's small files
        dedup-nightly --modality doc --compact --index idx_n7 \\
                      --roll idx_n7c [--target-mb 128]

    --modality doc expects (doc_id, text) parquet; embedding expects
    (vec_id, embedding). Prints one JSON stats line (the cmd_corpus
    convention). Roll targets must be NEW directories — in-place rolls
    are refused by the library (torn-artifact guard); swap pointers
    (symlink/rename) after the job exits 0.
    """
    import json

    from pleiades_spark.operators import dedup as D
    from pleiades_spark.session import get_spark

    is_doc = args.modality == "doc"
    threshold = args.threshold if args.threshold is not None else (
        0.6 if is_doc else 0.45
    )
    if args.compact and not args.roll:
        raise SystemExit("--compact needs --roll (the compacted index dir)")
    if not args.compact and not args.infile:
        raise SystemExit("bootstrap/nightly modes need --in")
    spark = get_spark("pleiades_dedup_nightly")
    stats: dict = {"modality": args.modality, "mode": "nightly"}
    if args.compact:
        written = D.compact_reps_index(
            spark, args.index, args.roll,
            target_bytes=args.target_mb * 1024 * 1024,
        )
        stats.update(mode="compact", files=written)
    elif args.bootstrap:
        new = spark.read.parquet(args.infile)
        if is_doc:
            D.write_reps_index(new, args.index, threshold)
            n = spark.read.parquet(f"{args.index}/doc_ids").count()
        else:
            D.write_emb_reps_index(new, args.index, threshold)
            n = spark.read.parquet(f"{args.index}/vec_ids").count()
        stats.update(mode="bootstrap", n_ids=n, index=args.index)
    else:
        new = spark.read.parquet(args.infile)
        fn = (
            D.doc_dedup_reps_from_index
            if is_doc
            else D.embedding_dedup_reps_from_index
        )
        assigns = fn(new, args.index, threshold,
                     out_index_path=args.roll)
        if args.out:
            assigns.write.mode("overwrite").parquet(args.out)
            assigns = spark.read.parquet(args.out)
        from pyspark.sql import functions as F

        row = assigns.agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(F.col("rep_id")).alias("n_clusters"),
        ).collect()[0]
        stats.update(
            n_ids=row["n"], n_clusters=row["n_clusters"],
            rolled_to=args.roll, out=args.out,
        )
    print(json.dumps(stats))
    return 0


def cmd_corpus_stream(args: argparse.Namespace) -> int:
    """The CONTINUOUS corpus personality (round 13): the batch `corpus`
    verb's streaming twin, built on the persisted star index. Two
    modes, mirroring the stream/nightly split of the reps contract:

        # continuously (or per crawl drop): quality-gate, probe-dedup,
        # scrub, split and append arriving docs to the training shards
        corpus-stream --index idx --work wdir --in crawl_drop/

        # nightly: finalize the inbox (optionally rolling the index)
        # and emit keep-first tombstones for deferred new-new merges
        corpus-stream --finalize --index idx --work wdir \\
                      --roll idx_n1 --tombstones tomb.parquet

        # periodically: rewrite the shard dirs' per-micro-batch small
        # files into size-targeted ones (rename-atomic per split)
        corpus-stream --compact-shards --work wdir [--target-mb 128]

    The work dir accumulates inbox/ (staged minhash rows), assign/
    (provisional decisions), shards/ (split-partitioned JSONL) and
    ckpt/ (the streaming checkpoint — re-running with the same work
    dir resumes, never re-processes). Prints one JSON stats line."""
    import json
    import os

    from pyspark.sql import functions as F

    from pleiades_spark.session import get_spark
    from pleiades_spark.streaming.pipeline import (
        run_corpus_stream,
        stream_corpus_finalize,
    )

    spark = get_spark("pleiades_corpus_stream")
    mode = (
        "compact-shards"
        if args.compact_shards
        else ("finalize" if args.finalize else "ingest")
    )
    if mode != "compact-shards" and not args.index:
        raise SystemExit(f"{mode} mode needs --index")
    stats: dict = {"mode": mode, "index": args.index}
    if args.compact_shards:
        from pleiades_spark.maintenance import compact_corpus_shards

        stats.update(
            files=compact_corpus_shards(
                spark,
                f"{args.work}/shards",
                target_bytes=args.target_mb * 1024 * 1024,
            )
        )
    elif args.finalize:
        tomb = stream_corpus_finalize(
            spark,
            f"{args.work}/inbox",
            f"{args.work}/assign",
            args.index,
            args.threshold,
            out_index_path=args.roll,
        )
        if args.tombstones:
            tomb.write.mode("overwrite").parquet(args.tombstones)
            tomb = spark.read.parquet(args.tombstones)
        stats.update(
            n_tombstones=tomb.count(),
            rolled_to=args.roll,
            tombstones=args.tombstones,
        )
    else:
        if not args.infile:
            raise SystemExit("ingest mode needs --in")
        first = spark.read.parquet(args.infile)
        stream = (
            spark.readStream.schema(first.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(args.infile)
        )
        inbox, _assign, shards = run_corpus_stream(
            spark, stream, args.index, args.threshold, work_dir=args.work
        )
        # An ingest where every batch was empty (all files already
        # checkpointed, or every doc rejected by the quality gate) leaves
        # inbox/shards absent or partition-dir-less — print zero stats,
        # not an UNABLE_TO_INFER_SCHEMA / missing-partition error.
        kept = {s: 0 for s in ("train", "val", "test")}
        if os.path.isdir(shards) and any(
            n.startswith("split=") for n in os.listdir(shards)
        ):
            for r in (
                spark.read.schema(
                    "doc_id long, lang string, source string, "
                    "text string, q double"
                )
                .json(shards)
                .groupBy("split")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            ):
                kept[r["split"]] = int(r["n"])
        has_inbox = os.path.isdir(inbox) and any(
            n.startswith("epoch=") for n in os.listdir(inbox)
        )
        stats.update(
            inbox_docs=spark.read.parquet(inbox).count() if has_inbox else 0,
            kept=kept,
            shards=shards,
        )
    print(json.dumps(stats))
    return 0


def cmd_explain(args: argparse.Namespace) -> int:
    """Print the optimized physical plan of a registered gate query —
    the plan-audit loop (`.explain("formatted")`) as a first-class CLI
    verb, so "did my filter push down / did that dim broadcast" is one
    command, not a notebook session."""
    from pleiades_spark.plans import collect_queries
    from pleiades_spark.session import get_spark

    registry = collect_queries()
    if args.query_name not in registry:
        import difflib

        close = difflib.get_close_matches(args.query_name, registry, 5)
        print(f"unknown query {args.query_name!r}; close: {close}")
        return 2
    spark = get_spark("pleiades_explain")
    df = registry[args.query_name].fn(spark, args.sf_dir)
    df.explain(args.mode)
    return 0


def cmd_sql(args: argparse.Namespace) -> int:
    """Ad-hoc SQL over the fixture tables — the interactive entry point
    the reference never had (SURVEY §2.6: no SQL surface). Registers
    every fixture parquet in ``--sf-dir`` as a temp view (through
    catalog.load, so nanos timestamps behave) and prints the result as
    JSON lines — pipeable into jq/DuckDB/pandas."""
    import json

    from pleiades_spark import catalog
    from pleiades_spark.session import get_spark

    spark = get_spark("pleiades_sql")
    for t in catalog.TABLES:
        try:
            catalog.load(spark, args.sf_dir, t).createOrReplaceTempView(t)
        except Exception:  # noqa: BLE001 — missing fixture table is fine
            continue
    sql = args.query
    if sql == "-":
        import sys as _sys

        sql = _sys.stdin.read()
    rows = spark.sql(sql).limit(args.limit).collect()
    for r in rows:
        print(json.dumps(r.asDict(recursive=True), default=str))
    return 0


def cmd_compact(args: argparse.Namespace) -> int:
    """Day-partitioned table maintenance: size-targeted small-file
    compaction with the stage-and-swap day-atomic replacement
    (pleiades_spark/maintenance.py)."""
    import json

    from pleiades_spark.maintenance import compact_days
    from pleiades_spark.session import get_spark

    spark = get_spark("pleiades_compact")
    days = [int(d) for d in args.days.split(",")] if args.days else None
    written = compact_days(
        spark, args.table, days=days, target_bytes=args.target_mb * 1024 * 1024
    )
    print(json.dumps({str(d): n for d, n in sorted(written.items())}))
    return 0


def _counters_payload(rows, day: int | None) -> dict:
    return {
        "Since": (day or 0) * 86400,
        "Counters": [
            {"Name": r["counter"], "Value": r["events"], "Growth": r["growth"]}
            for r in rows
        ],
    }


def make_handler(spark, counters_path: str):
    from pyspark.sql import functions as F

    from pleiades_spark.metrics import PromRegistry

    counters = spark.read.parquet(counters_path).cache()
    counters.count()  # materialize once; serving reads are driver-local

    registry = PromRegistry()
    registry.describe(
        "pleiades_http_requests_total", "counter",
        "HTTP requests served, by route and status (prom_middleware.go parity)",
    )
    registry.describe(
        "pleiades_counter_events", "gauge",
        "all-time event count per pleiades counter",
    )
    registry.describe(
        "pleiades_counter_growth", "gauge",
        "all-time growth (lendiff sum) per pleiades counter",
    )

    class Handler(BaseHTTPRequestHandler):
        def _send(self, body: bytes, ctype: str, code: int) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            registry.inc(
                "pleiades_http_requests_total",
                {"route": getattr(self, "_route", "other"), "status": str(code)},
            )

        def _json(self, obj, code: int = 200) -> None:
            self._send(json.dumps(obj).encode(), "application/json", code)

        def log_message(self, *a):  # quiet test output
            pass

        def _alltime_counter_rows(self):
            # The aggregate-personality table carries the all-time grain as
            # day IS NULL rows (GROUPING SETS); the streaming sink table is
            # per-day only — roll it up. Both are (counter)-cardinality,
            # driver-local over the cached frame.
            null_grain = counters.filter(F.col("day").isNull())
            if null_grain.limit(1).count() > 0:
                return null_grain.select("counter", "events", "growth").collect()
            return (
                counters.groupBy("counter")
                .agg(
                    F.sum("events").alias("events"),
                    F.round(F.sum("growth"), 4).alias("growth"),
                )
                .collect()
            )

        def do_GET(self) -> None:  # noqa: N802 (stdlib API)
            parts = [p for p in self.path.split("/") if p]
            self._route = "/" + "/".join(parts[:2]) if parts else "/"
            if parts in ([], ["index.html"], ["ui"]):
                # The SPA analog (web/index.html, see its header comment):
                # same /api endpoints the reference's Vue store consumes
                # (/root/reference/web/src/script/store.js:151-190), served
                # as one dependency-free static file.
                page = os.path.join(os.path.dirname(__file__), "web", "index.html")
                with open(page, "rb") as fh:
                    self._send(fh.read(), "text/html; charset=utf-8", 200)
                return
            if parts == ["metrics"]:
                for r in self._alltime_counter_rows():
                    labels = {"counter": r["counter"]}
                    registry.set_gauge("pleiades_counter_events", r["events"], labels)
                    registry.set_gauge(
                        "pleiades_counter_growth", float(r["growth"] or 0), labels
                    )
                self._send(
                    registry.render().encode(),
                    "text/plain; version=0.0.4; charset=utf-8",
                    200,
                )
                return
            if parts == ["api", "days"]:
                days = [
                    r["day"]
                    for r in counters.select("day")
                    .distinct()
                    .dropna()
                    .orderBy(F.col("day").desc())
                    .collect()
                ]
                self._json({"Days": days})
                return
            if parts[:2] == ["api", "stats"] and len(parts) in (2, 3):
                if len(parts) == 3:
                    try:
                        day = int(parts[2])
                    except ValueError:
                        self._json({"error": "bad day"}, 400)
                        return
                else:
                    row = counters.agg(F.max("day")).collect()[0]
                    day = row[0]
                rows = counters.filter(F.col("day") == day).collect()
                self._json(_counters_payload(rows, day))
                return
            self._json({"error": "not found"}, 404)

    return Handler


def cmd_serve(args: argparse.Namespace) -> int:
    import signal
    import threading

    from pleiades_spark.session import get_spark

    spark = get_spark("pleiades_serve")
    server = ThreadingHTTPServer(
        (args.host, args.port), make_handler(spark, args.counters)
    )

    # cmd/shutdown.go parity: SIGINT/SIGTERM drain in-flight requests and
    # stop cleanly instead of dying mid-response (shutdown() must run off
    # the serving thread, or it deadlocks waiting on itself).
    def _stop(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    for sig in (signal.SIGINT, signal.SIGTERM):
        signal.signal(sig, _stop)

    print(
        f"serving counters on http://{args.host}:{server.server_port}",
        flush=True,
    )
    server.serve_forever()
    server.server_close()
    spark.stop()
    print("shut down cleanly", flush=True)
    return 0


def build_parser() -> argparse.ArgumentParser:
    from pleiades_spark import __version__

    p = argparse.ArgumentParser(prog="pleiades_spark")
    # cmd/version.go parity: the reference logs its build version at start
    p.add_argument(
        "--version", action="version", version=f"pleiades_spark {__version__}"
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    ing = sub.add_parser("ingest", help="SSE → file queue")
    ing.add_argument("--url")
    ing.add_argument("--sse-file")
    ing.add_argument("--resume-id", default="")
    ing.add_argument("--out-dir", required=True)
    ing.set_defaults(fn=cmd_ingest)

    agg = sub.add_parser("aggregate", help="file queue → counters parquet")
    agg.add_argument("--in-dir", required=True)
    agg.add_argument("--out", required=True)
    agg.set_defaults(fn=cmd_aggregate)

    srv = sub.add_parser("serve", help="REST API over counters")
    srv.add_argument("--counters", required=True)
    srv.add_argument("--host", default="127.0.0.1")
    srv.add_argument("--port", type=int, default=8000)
    srv.set_defaults(fn=cmd_serve)

    cor = sub.add_parser(
        "corpus", help="documents parquet → deduped/scrubbed JSONL training shards"
    )
    cor.add_argument("--sf-dir", required=True)
    cor.add_argument("--out", required=True)
    cor.add_argument("--shards", type=int, default=4)
    cor.set_defaults(fn=cmd_corpus)

    dn = sub.add_parser(
        "dedup-nightly",
        help="persisted star-index lifecycle: bootstrap / nightly roll / compact",
    )
    dn.add_argument("--modality", choices=["doc", "embedding"], default="doc")
    dn.add_argument("--index", required=True, help="existing index dir (or bootstrap target)")
    dn.add_argument("--in", dest="infile", default=None,
                    help="new docs/vectors parquet (nightly + bootstrap modes)")
    dn.add_argument("--roll", default=None,
                    help="NEW dir for the rolled/compacted index")
    dn.add_argument("--out", default=None, help="assignments parquet output")
    dn.add_argument("--threshold", type=float, default=None)
    dn.add_argument("--bootstrap", action="store_true")
    dn.add_argument("--compact", action="store_true")
    dn.add_argument("--target-mb", type=int, default=128)
    dn.set_defaults(fn=cmd_dedup_nightly)

    cs = sub.add_parser(
        "corpus-stream",
        help="continuous corpus ingest vs a star index; --finalize reconciles",
    )
    cs.add_argument("--index", default=None, help="persisted doc star index dir")
    cs.add_argument("--work", required=True,
                    help="work dir (inbox/assign/shards/ckpt live here)")
    cs.add_argument("--in", dest="infile", default=None,
                    help="documents parquet dir to stream (ingest mode)")
    cs.add_argument("--finalize", action="store_true",
                    help="nightly reconcile: finalize inbox, emit tombstones")
    cs.add_argument("--compact-shards", action="store_true",
                    help="rewrite the shard dirs into size-targeted files")
    cs.add_argument("--roll", default=None,
                    help="NEW dir for the rolled index (finalize mode)")
    cs.add_argument("--tombstones", default=None,
                    help="tombstones parquet output (finalize mode)")
    cs.add_argument("--threshold", type=float, default=0.6)
    cs.add_argument("--target-mb", type=int, default=128)
    cs.set_defaults(fn=cmd_corpus_stream)

    cp = sub.add_parser("compact", help="small-file compaction (day-partitioned)")
    cp.add_argument("--table", required=True, help="day-partitioned parquet root")
    cp.add_argument("--days", default=None, help="comma-separated day numbers")
    cp.add_argument("--target-mb", type=int, default=128)
    cp.set_defaults(fn=cmd_compact)

    ex = sub.add_parser("explain", help="physical plan of a gate query")
    ex.add_argument("query_name")
    ex.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ex.add_argument("--mode", default="formatted",
                    choices=["simple", "extended", "formatted", "cost"])
    ex.set_defaults(fn=cmd_explain)

    sq = sub.add_parser("sql", help="ad-hoc SQL over the fixture tables")
    sq.add_argument("query", help="SQL string, or '-' to read stdin")
    sq.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    sq.add_argument("--limit", type=int, default=1000)
    sq.set_defaults(fn=cmd_sql)
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
