#!/usr/bin/env python3
"""Per-query scaling-ratio table from two Bench JSON lines.

Usage: python3 tools/scaling.py <bench_small.json> <bench_big.json> \
           [data_ratio] [--gate [--gate-out artifact.json]]

Prints a markdown table (query, t_small, t_big, ratio) sorted by ratio
descending, plus summary stats. `data_ratio` (default 10) is the nominal
data scale-up; queries with ratio well above it deserve a look, queries
below it are dominated by fixed per-query overhead (planning, codegen).

--gate formalizes the SHUFFLE-ratio contract as a pass/fail check and
(optionally) writes a machine-readable artifact: every query whose
shuffle grew by more than `data_ratio * (1 + GATE_TOL)` fails the gate
(exit 1). The gate checks shuffle RECORDS when both bench files carry
`shuffle_rec` (records are a deterministic, compression-independent,
exactly-row-linear function of the plan and the data) and falls back
to bytes for older files. Bytes ride the compressor: vocabulary-heavy
corpora compress WORSE as they grow (more distinct tokens = higher
entropy per block), so byte ratios inflate ~1.2-1.4x past the row
ratio under the disjoint-vocabulary scale-up generator — measured on
token-carrying queries even after their shuffle keys became fixed-width
hashes. Records do not move: two runs of the same binary agree exactly
(the round-11/12 lesson — back-to-back full-suite sf1 WALL times show
disjoint outlier sets across identical binaries; shuffle metrics
don't). Queries below the small-side floor are exempt (ratio over a
near-zero base is bookkeeping noise).
"""
import json
import sys

GATE_TOL = 0.25          # shuffle may exceed the data ratio by 25%
SHUFFLE_FLOOR_MB = 1.0   # byte mode: small-side floor
SHUFFLE_FLOOR_REC = 20000  # record mode: small-side floor

# Doc-rollup queries whose RECORD ratio carries a partition-count
# constant on top of the row growth: their second aggregate
# (groupBy(doc_id) after a (doc_id, X)-keyed shuffle) writes one
# partial row per (doc, map-partition-touched), and AQE coalesces the
# SMALL side to one partition (perfect combining: partials == docs)
# while the big side runs many — so the measured decade ratio shifts
# up even though total records stay linear in the corpus, bounded by
# the first shuffle's row count (per-doc combining can never exceed
# per-doc key rows). StageProbe evidence, round 18 at sf0.1->sf1:
# q_dsir's FIRST shuffle is exactly 10.00x (116231 -> 1162310 records);
# the rollup's partials go 5000 (P=1, == docs) -> 443337 (P=10,
# ~8.9/doc, hard bound 23/doc = mean distinct buckets); total reads
# 12.89x. These named keys gate at the wide tolerance, and the gate
# LOGS the split so the exemption is never silent.
# dedup_df_profile / q_dataset_card joined in r21: the r20 scan-
# parallelism floor multiplied the documents map-partition count at the
# small decade (sf0.1 plans ~9 partitions, sf1 hits the 32-core cap), so
# their per-(key, map-partition) distinct partials carry the same
# partition-count step q_dsir's rollup does. Bounded exactly the same
# way — once the partition count stops growing the ratio returns to the
# data ratio: committed r21 artifacts measure the sf1->sf10 decade at
# 1.08x (dedup_df_profile — sublinear: partials are capped by distinct
# shingles x partitions) and 10.22x (q_dataset_card)
# (tools/bench_sat_sf1_r21.json vs tools/bench_sf10_full_r21.json).
COMBINE_BOUNDED = {"q_dsir", "text_gopher", "dedup_df_profile",
                   "q_dataset_card"}
GATE_TOL_COMBINE = 0.5


def main():
    # argparse so a positional bench file can never be misparsed as the
    # gate artifact (the old hand-rolled scan grabbed the next argv token
    # whenever it ended in .json)
    import argparse
    ap = argparse.ArgumentParser(description=__doc__,
                                 formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("bench_small")
    ap.add_argument("bench_big")
    ap.add_argument("data_ratio", nargs="?", type=float, default=10.0)
    ap.add_argument("--gate", action="store_true",
                    help="enforce the shuffle-ratio contract (exit 1 on fail)")
    ap.add_argument("--gate-out", metavar="ARTIFACT.json", default=None,
                    help="write the machine-readable gate artifact here")
    ns = ap.parse_args()
    gate = ns.gate or ns.gate_out is not None
    gate_out = ns.gate_out
    small = json.load(open(ns.bench_small))
    big = json.load(open(ns.bench_big))
    data_ratio = ns.data_ratio
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

    if gate:
        rec_mode = "shuffle_rec" in small and "shuffle_rec" in big
        gs = small["shuffle_rec"] if rec_mode else shs
        gb = big["shuffle_rec"] if rec_mode else shb
        floor_v = SHUFFLE_FLOOR_REC if rec_mode else SHUFFLE_FLOOR_MB
        unit = "records" if rec_mode else "MB"
        checked, exempt, failures, widened = {}, [], [], []
        for name in sorted(set(gs) | set(gb)):
            s_v, b_v = gs.get(name), gb.get(name)
            if s_v is None or b_v is None:
                continue
            if s_v < floor_v:
                exempt.append(name)
                continue
            tol = GATE_TOL_COMBINE if name in COMBINE_BOUNDED else GATE_TOL
            r = b_v / s_v
            checked[name] = round(r, 3)
            if name in COMBINE_BOUNDED and r > data_ratio * (1 + GATE_TOL):
                widened.append((name, r))
            if r > data_ratio * (1 + tol):
                failures.append((name, s_v, b_v, r, tol))
        verdict = "PASS" if not failures else "FAIL"
        print()
        print(f"shuffle-ratio gate [{verdict}] on {unit}: {len(checked)} "
              f"checked at data_ratio={data_ratio:.0f}x "
              f"(tol +{GATE_TOL:.0%}), {len(exempt)} exempt under "
              f"{floor_v} {unit}")
        for name, r in widened:
            print(f"  note {name}: {r:.2f}x passed under the combine-"
                  f"bounded tolerance +{GATE_TOL_COMBINE:.0%} (doc-rollup "
                  "partial-agg constant — see COMBINE_BOUNDED)")
        for name, s_v, b_v, r, tol in failures:
            print(f"  FAIL {name}: {s_v} {unit} -> {b_v} {unit} = {r:.2f}x "
                  f"(> {data_ratio * (1 + tol):.1f}x)")
        if gate_out:
            json.dump({
                "gate": verdict,
                "basis": unit,
                "data_ratio": data_ratio,
                "tolerance": GATE_TOL,
                "small_side_floor": floor_v,
                "small_sf": small.get("sf"), "big_sf": big.get("sf"),
                "total_sec": {"small": small.get("value"),
                              "big": big.get("value")},
                "checked": checked,
                "exempt": sorted(exempt),
                "combine_bounded_widened": [n for n, _ in widened],
                "failures": [n for n, *_ in failures],
            }, open(gate_out, "w"), indent=1, sort_keys=True)
            print(f"gate artifact -> {gate_out}")
        sys.exit(0 if not failures else 1)


if __name__ == "__main__":
    main()
