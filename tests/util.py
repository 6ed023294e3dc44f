"""Shared oracle-comparison helpers (same normalization as the driver)."""

from __future__ import annotations

import math


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


def rows_key(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_norm(r[i]) for i in order) for r in rows)


def assert_oracle_match(sdf, duck, oracle_sql: str) -> None:
    s_cols = sdf.columns
    s_rows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(oracle_sql)
    d_cols = [c[0] for c in cur.description]
    d_rows = cur.fetchall()
    assert sorted(s_cols) == sorted(d_cols), f"cols {sorted(s_cols)} != {sorted(d_cols)}"
    assert len(s_rows) == len(d_rows), f"rowcount {len(s_rows)} != {len(d_rows)}"
    sk, dk = rows_key(s_cols, s_rows), rows_key(d_cols, d_rows)
    if sk != dk:
        diff_s = [x for x in sk if x not in set(dk)][:3]
        diff_d = [x for x in dk if x not in set(sk)][:3]
        raise AssertionError(f"value mismatch; spark-only={diff_s} duck-only={diff_d}")
