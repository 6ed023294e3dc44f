"""Full-registry benchmark: every query in the gate registry, min-of-2,
at an arbitrary SF dir (VERDICT r04 next-round #4 — the scaling bench
must cover all queries, not just the headline set).

    python tools/bench_full.py /root/testdata/sf0.1  bench_full_sf01.json
    python tools/bench_full.py testdata_sf1          bench_full_sf1.json

Writes {"queries": {name: sec}, "total": sec, "sf_dir": ...} to the
output path (and one JSON line to stdout). Streaming-sink queries run
exactly as the oracle gate runs them (the query fn executes the stream
and returns the batch result frame); everything executes end-to-end via
the noop sink so no driver-side transfer skews the numbers.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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
    failures: dict[str, str] = {}
    for name in sorted(registry):
        if (only and name not in only) or name in skip:
            continue
        q = registry[name]
        best = float("inf")
        reps = max(1, int(os.environ.get("PLEIADES_BENCH_REPS", "2")))
        try:
            for _ in range(reps):
                t0 = time.time()
                q.fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
            timings[name] = round(best, 3)
            print(f"BENCH {name}: {timings[name]}s", file=sys.stderr, flush=True)
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
