"""Dump .explain("formatted") for headline queries into plans/r13/.

Usage: python tools/dump_r13_plans.py <suffix> [query ...]
  suffix: "before" or "after"
  query:  subset; default = every bench.py HEADLINE entry present in the
          registry.

The optimization-round deliverable: plans/r13/<query>_<suffix>.txt so the
judge can check plan claims without running Spark.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

from bench import HEADLINE  # noqa: E402
from pleiades_spark.plans import collect_queries  # noqa: E402
from pleiades_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("dump_r13_plans")
    reg = collect_queries()
    if not names:
        names = [n for n in HEADLINE if n in reg]
    os.makedirs("plans/r13", exist_ok=True)
    for name in names:
        try:
            buf = io.StringIO()
            with redirect_stdout(buf):
                reg[name].fn(spark, SF_DIR).explain("formatted")
            with open(f"plans/r13/{name}_{suffix}.txt", "w") as f:
                f.write(buf.getvalue())
            print(f"ok {name}")
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {e}")


if __name__ == "__main__":
    main()
