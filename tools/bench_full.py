"""Full-registry benchmark: every query in the gate registry, min-of-2,
at an arbitrary SF dir (VERDICT r04 next-round #4 — the scaling bench
must cover all queries, not just the headline set).

    python tools/bench_full.py /root/testdata/sf0.1  bench_full_sf01.json
    python tools/bench_full.py testdata_sf1          bench_full_sf1.json

Writes {"queries": {name: sec}, "rows": {name: n}, "sec_median":
{name: sec}, "total": sec, "sf_dir": ...} to the output path (and one
JSON line to stdout). Streaming-sink queries run exactly as the oracle
gate runs them (the query fn executes the stream and returns the batch
result frame); everything executes end-to-end via the noop sink so no
driver-side transfer skews the numbers.

Per-query OUTPUT ROW COUNTS (round 11, verdict r10 #3): the first rep
of every query carries a CollectMetrics observation (count over the
final frame — the noop sink already touches every row, so this is one
extra long per task), recorded under "rows". Pair-emitting dedup cells
are Θ(Σ multiplicity²) in their own OUTPUT; a ratio table that ignores
output volume misreads output-bound cells as plan regressions — judge
them rows-normalized (the round-10 lesson, now mechanical).

Variance protocol (verdict r10 #6): "queries" stays min-of-reps (the
scale_report contract); "sec_median" carries the per-query median so a
>25 % box-jitter swing (measured: blocking_audit 84/95/116 s across
three sf100 runs) is distinguishable from a real regression.
PLEIADES_BENCH_WARMUP=1 adds one untimed warm-up rep per query before
the timed reps (JVM/codegen/page-cache settle) — use with
PLEIADES_BENCH_REPS>=2 for any cell a verdict number will cite.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pleiades_spark.plans import collect_queries  # noqa: E402
from pleiades_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    names = sys.argv[3:]
    # "-name" excludes (for the deliberately-quadratic ground-truth ops
    # at big SFs); bare names restrict the run to those queries.
    only = {n for n in names if not n.startswith("-")}
    skip = {n[1:] for n in names if n.startswith("-")}

    registry = collect_queries()
    # Fail FAST on names that don't exist in the registry: a silently
    # ignored misspelled "-skipname" lets the O(n²) ground truths run by
    # accident (374 s at sf1 — round-6 lesson, CLAUDE.md).
    unknown = (only | skip) - set(registry)
    if unknown:
        sys.exit(
            f"unknown query name(s): {sorted(unknown)}; "
            f"registry has {len(registry)} queries — check spelling"
        )

    spark = get_spark("pleiades_bench_full")

    # warmup: JVM, codegen, parquet footers
    registry["counters_rollup"].fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    rowcounts: dict[str, int] = {}
    failures: dict[str, str] = {}
    warmup = os.environ.get("PLEIADES_BENCH_WARMUP", "0") == "1"
    for name in sorted(registry):
        if (only and name not in only) or name in skip:
            continue
        q = registry[name]
        reps = max(1, int(os.environ.get("PLEIADES_BENCH_REPS", "2")))
        times: list[float] = []
        try:
            if warmup:
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            for i in range(reps):
                # q.fn stays INSIDE the timed region: streaming-gate
                # queries execute their micro-batch drains in fn itself,
                # and the batch result frame is only the audit tail.
                obs = Observation() if i == 0 else None
                t0 = time.time()
                df = q.fn(spark, sf_dir)
                if obs is not None:
                    df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
                df.write.format("noop").mode("overwrite").save()
                times.append(time.time() - t0)
                if obs is not None:
                    rowcounts[name] = int(obs.get["rows"])
            times.sort()
            timings[name] = round(times[0], 3)
            # true median: average the middle two for even rep counts
            # (ADVICE r11: times[len//2] at REPS=2 is the MAX, not a
            # median, and verdicts cite this number)
            mid = len(times) // 2
            med = (
                times[mid]
                if len(times) % 2
                else (times[mid - 1] + times[mid]) / 2
            )
            medians[name] = round(med, 3)
            print(
                f"BENCH {name}: {timings[name]}s"
                f" (med {medians[name]}s, {rowcounts[name]} rows)",
                file=sys.stderr, flush=True,
            )
        except Exception as exc:  # keep going; report at the end
            failures[name] = str(exc).split("\n")[0][:200]
            print(f"FAIL {name}: {failures[name]}", file=sys.stderr, flush=True)
        finally:
            # Release the finished query's state OUTSIDE the timed
            # region (round 10): operator-internal .cache() frames and
            # shuffle files otherwise accumulate across the whole run —
            # the sf100 probe measured 45 GB of stale blockmgr spill by
            # the third query, enough to disk-DNF later heavy queries as
            # a harness artifact rather than an operator property.
            # clearCache drops persisted frames; the explicit JVM GC
            # lets ContextCleaner reap the now-unreferenced shuffles.
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass

    result = {
        "queries": timings,
        "sec_median": medians,
        "rows": rowcounts,
        "total": round(sum(timings.values()), 3),
        "n": len(timings),
        "failures": failures,
        "sf_dir": sf_dir,
    }
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(result, fh, indent=1, sort_keys=True)
    print(json.dumps({k: result[k] for k in ("total", "n", "failures", "sf_dir")}))


if __name__ == "__main__":
    main()
