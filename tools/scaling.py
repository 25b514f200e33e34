#!/usr/bin/env python3
"""Per-query scaling-ratio table from two Bench JSON lines.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> [data_ratio]

Prints a markdown table (query, t_small, t_big, ratio) sorted by ratio
descending, plus summary stats. `data_ratio` (default 10) is the nominal
data scale-up; queries with ratio well above it deserve a look, queries
below it are dominated by fixed per-query overhead (planning, codegen).
"""
import json
import sys


def main():
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    data_ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    shs, shb = small.get("shuffle_mb", {}), big.get("shuffle_mb", {})
    rows = []
    # union of both query sets: a query missing on either side (baseline
    # generated before a registration landed, or a failed run reporting
    # -1) is listed with a blank ratio, never dropped or crashed on
    for name in sorted(set(qs) | set(qb)):
        ts, tb = qs.get(name), qb.get(name)
        # ts == 0 is a missing/degenerate measurement, not an infinite
        # speed-down: treat it like an absent side (blank ratio row)
        if ts is None or tb is None or ts <= 0 or tb < 0:
            rows.append((float("inf"), name, ts, tb, None))
            continue
        rows.append((tb / ts, name, ts, tb,
                     (shs.get(name), shb.get(name))))
    rows.sort(key=lambda r: (r[0], r[1]), reverse=True)
    print("| query | t_sf0.1 (s) | t_sf1 (s) | ratio | shuffle sf0.1→sf1 (MB) |")
    print("| --- | --- | --- | --- | --- |")
    def fmt(v):
        return f"{v:.2f}" if isinstance(v, (int, float)) and v >= 0 else "—"
    for ratio, name, ts, tb, sh in rows:
        shtxt = f"{sh[0]} → {sh[1]}" if sh and sh[0] is not None else ""
        rtxt = f"{ratio:.2f}x" if sh is not None else "—"
        print(f"| {name} | {fmt(ts)} | {fmt(tb)} | {rtxt} | {shtxt} |")
    ratios = [r for r, *_ in rows if r != float("inf")]
    n_super = sum(1 for r in ratios if r > data_ratio)
    print()
    print(f"total: {small['value']:.1f} s -> {big['value']:.1f} s "
          f"({big['value'] / small['value']:.2f}x for {data_ratio:.0f}x data); "
          f"median ratio {sorted(ratios)[len(ratios) // 2]:.2f}x; "
          f"{n_super} queries above the data ratio")


if __name__ == "__main__":
    main()
