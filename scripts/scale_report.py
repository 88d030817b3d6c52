"""Render the SCALE.md ratio table from two bench.py JSON outputs.

Usage:
  python scripts/scale_report.py <bench_small.json> <bench_big.json> \
      [data_ratio]

For every query present in both runs, prints time_big / time_small next to
the data-size ratio (default 10). Near-linear operators land at or below
the data ratio (often below: fixed per-query overhead — session, planning,
small dims — amortizes as data grows); anything well above it is flagged
for plan audit. Times are min-of-N interleaved passes (see bench.py), so
single-burst noise is already filtered, but sub-second baselines still
carry +/- tens-of-ms jitter — flag thresholds below account for that.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    # per-query pass counts (bench.py `query_passes`): the intra-pass budget
    # break can leave tail queries with a single COLD timing while head
    # queries report warmed min-of-N — a cold/warm mismatch inflates (or
    # deflates) the ratio by the one-shot JIT cost, so surface it per row.
    ps = small.get("query_passes", {})
    pb = big.get("query_passes", {})
    common = sorted(set(qs) & set(qb), key=lambda n: -qb[n])
    print(f"| query | t(sf{small['sf']}) s | t(sf{big['sf']}) s | ratio | passes | vs {data_ratio:.0f}x |")
    print("|---|---|---|---|---|---|")
    flagged = []
    for n in common:
        a, b = qs[n], qb[n]
        r = b / a if a > 0 else float("inf")
        # jitter guard: a sub-0.5s baseline can double on noise alone
        mark = "**SUPER-LINEAR**" if (r > data_ratio * 1.5 and b > 5.0) else "ok"
        cold = (ps.get(n, 0) == 1) != (pb.get(n, 0) == 1)
        passes = f"{ps.get(n, '?')}/{pb.get(n, '?')}"
        if cold:
            mark += " (cold/warm mismatch)"
        if mark != "ok":
            flagged.append(n)
        print(f"| {n} | {a:.2f} | {b:.2f} | {r:.1f}x | {passes} | {mark} |")
    ts, tb = sum(qs[n] for n in common), sum(qb[n] for n in common)
    print(f"\ntotals over {len(common)} common queries: "
          f"{ts:.1f}s -> {tb:.1f}s = {tb/ts:.2f}x (data {data_ratio:.0f}x)")
    if flagged:
        print(f"flagged: {flagged}")


if __name__ == "__main__":
    main()
