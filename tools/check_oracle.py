"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` twin on
DuckDB at a given scale factor, then compares row count, column names,
and an order-insensitive value hash (columns sorted by name, values
stringified with float rounding).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb

sys.path.insert(0, "/root/repo")

from pleiades_spark.session import get_spark  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{round(v, 6):.6f}"
    if isinstance(v, bool):
        return str(v).lower()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm(x) for x in v) + "]"
    return str(v)


def value_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(_norm(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


def main() -> int:
    argv = sys.argv[1:]
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        argv = argv[:i] + argv[i + 2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    results = {}

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    spark = get_spark("oracle_check")
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            failures.append(name)
            results[name] = {"status": "err", "err": str(e)[:200]}
            continue
        if name not in oracles:
            print(f"rows-only  {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            results[name] = {"status": "rows_only", "spark_rows": len(s_rows)}
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [c[0] for c in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            failures.append(name)
            results[name] = {"status": "err", "err": str(e)[:200]}
            continue
        problems = []
        if len(s_rows) != len(d_rows):
            problems.append(f"rowcount spark={len(s_rows)} duck={len(d_rows)}")
        if sorted(s_cols) != sorted(d_cols):
            problems.append(f"cols spark={sorted(s_cols)} duck={sorted(d_cols)}")
        elif value_hash(s_cols, s_rows) != value_hash(d_cols, d_rows):
            problems.append("value hash mismatch")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            # show a diff sample
            so = sorted(range(len(s_cols)), key=lambda i: s_cols[i])
            do = sorted(range(len(d_cols)), key=lambda i: d_cols[i])
            s_set = {"|".join(_norm(r[i]) for i in so) for r in s_rows}
            d_set = {"|".join(_norm(r[i]) for i in do) for r in d_rows}
            for line in sorted(s_set - d_set)[:3]:
                print(f"      spark-only: {line}")
            for line in sorted(d_set - s_set)[:3]:
                print(f"      duck-only : {line}")
            failures.append(name)
            results[name] = {"status": "fail", "problems": problems,
                             "spark_rows": len(s_rows), "oracle_rows": len(d_rows)}
        else:
            print(f"OK    {name}: {len(s_rows)} rows ({time.time()-t0:.1f}s)")
            results[name] = {"status": "ok", "rows": len(s_rows),
                             "sec": round(time.time() - t0, 2)}

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    if json_out:
        import json as _json

        with open(json_out, "w") as f:
            _json.dump({"sf_dir": sf_dir, "n_queries": len(results),
                        "n_failures": len(failures), "results": results},
                       f, indent=1, sort_keys=True)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
