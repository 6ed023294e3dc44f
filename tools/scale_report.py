"""Render BENCH_SF1.md's scaling table from two bench_full.py outputs.

    python tools/scale_report.py bench_full_sf01.json bench_full_sf1.json

Prints the markdown table (query, sf0.1 s, sf1 s, ratio) sorted by ratio
descending, plus the totals line — paste into BENCH_SF1.md. Flags every
ratio > 20x (the acceptance bar: >20x needs a written plan-level
justification in BENCH_SF1.md).
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    with open(sys.argv[1]) as fh:
        small = json.load(fh)
    with open(sys.argv[2]) as fh:
        big = json.load(fh)

    qs, qb = small["queries"], big["queries"]
    rs, rb = small.get("rows", {}), big.get("rows", {})
    common = sorted(set(qs) & set(qb))
    rows = [(name, qs[name], qb[name], qb[name] / max(qs[name], 1e-9)) for name in common]
    rows.sort(key=lambda r: -r[3])

    # Output-volume ratio (round 11): pair-emitting cells are
    # Θ(Σ mult²) in their OWN output — a time ratio near the rows ratio
    # is output-bound, not a plan regression (the round-10 lesson made
    # mechanical). "—" when either run predates row recording.
    print("| query | sf0.1 (s) | sf1 (s) | ratio | rows× |")
    print("|---|---|---|---|---|")
    for name, a, b, r in rows:
        flag = " ⚠" if r > 20 else ""
        if name in rs and name in rb:
            rr = f"{rb[name] / max(rs[name], 1):.1f}×"
        else:
            rr = "—"
        print(f"| {name} | {a:.3f} | {b:.3f} | {r:.1f}×{flag} | {rr} |")

    ts, tb = sum(qs[n] for n in common), sum(qb[n] for n in common)
    print()
    print(f"total over {len(common)} common queries: "
          f"{ts:.3f} s -> {tb:.3f} s ({tb / ts:.2f}x on 10x data)")
    missing = sorted(set(qs) ^ set(qb))
    if missing:
        print(f"not in both runs: {missing}")
    for side, d in (("sf0.1", small), ("sf1", big)):
        if d.get("failures"):
            print(f"{side} failures: {d['failures']}")


if __name__ == "__main__":
    main()
