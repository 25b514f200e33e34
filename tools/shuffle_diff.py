#!/usr/bin/env python3
"""Round-over-round per-query shuffle-BYTES diff — the width gate.

The records-scaling gate is width-blind by design (records are the
row-linearity signal) and PlanDoctor's body-width rule only catches
STORED wide columns traced into an exchange — an accidental wide
DERIVED struct (an un-pruned projection, a fat intermediate carried
through a join) is invisible to both. Bytes catch it: a query whose
shuffle_mb jumps round-over-round at the same SF with unchanged
records has widened its rows.

Usage:
  python3 tools/shuffle_diff.py <old_bench.json> <new_bench.json> [--gate]
  python3 tools/shuffle_diff.py --selftest   # planted-positive gate check

Both inputs are Bench JSON lines (tools/bench_last.json format) from
the SAME sf dir. Reports every query whose bytes grew more than
GROWTH_X with at least ABS_MB absolute growth (small queries jitter
with compression framing; sub-ABS_MB noise is not a width signal).
Queries present on only one side are listed as added/removed, never
gated. With --gate, exits non-zero when any query trips the bound.

Caveat: shuffle bytes ride the compressor, so ±20-30% moves with data
entropy and codec framing. GROWTH_X=1.5 is above that band; a genuine
width regression (a 64-float embedding where an 8-byte fingerprint
should ride) shows up as 3-8x.
"""
import json
import sys

GROWTH_X = 1.5
ABS_MB = 5.0


def load(path):
    d = json.load(open(path))
    return d.get("shuffle_mb", {}), d.get("sf")


def diff(old, new):
    """(trips, compared) for two {query: shuffle_mb} maps."""
    trips = []
    for q in sorted(set(old) & set(new)):
        o, n = old[q], new[q]
        if n > o * GROWTH_X and n - o >= ABS_MB:
            trips.append((q, o, n))
    return trips, len(set(old) & set(new))


def selftest():
    """The gate must trip on a planted width regression and stay quiet on
    compression-band jitter — run before trusting any clean verdict (a
    gate that can't fail is not a gate)."""
    base = {"q_ok": 10.0, "q_small": 0.5, "q_wide": 4.0}
    # planted positive: q_wide jumps 8x (the embedding-instead-of-
    # fingerprint signature) — MUST trip
    planted = {"q_ok": 11.0, "q_small": 0.6, "q_wide": 32.0}
    trips, _ = diff(base, planted)
    assert [t[0] for t in trips] == ["q_wide"], f"planted positive missed: {trips}"
    # jitter negative: +30% inside the compression band, and a small
    # query growing 4x but under ABS_MB — MUST stay quiet
    jitter = {"q_ok": 13.0, "q_small": 2.0, "q_wide": 4.2}
    trips, _ = diff(base, jitter)
    assert trips == [], f"false positive on jitter: {trips}"
    print("selftest OK: planted 8x width regression trips, "
          "compression-band jitter does not")


def main():
    if "--selftest" in sys.argv:
        selftest()
        return
    args = [a for a in sys.argv[1:] if a != "--gate"]
    gate = "--gate" in sys.argv
    if len(args) != 2:
        sys.exit(__doc__)
    old, sf_old = load(args[0])
    new, sf_new = load(args[1])
    if sf_old != sf_new:
        print(f"WARNING: comparing different SFs ({sf_old} vs {sf_new}) — "
              "byte deltas are meaningless across SFs", file=sys.stderr)
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    trips, compared = diff(old, new)
    for q, o, n in sorted(trips, key=lambda t: t[2] - t[1], reverse=True):
        print(f"WIDTH-REGRESSION {q}: {o:.2f} MB -> {n:.2f} MB "
              f"({n / max(o, 0.01):.2f}x)")
    if not trips:
        print(f"width gate clean: {compared} queries "
              f"within {GROWTH_X}x / +{ABS_MB} MB")
    if gate and trips:
        sys.exit(1)


if __name__ == "__main__":
    main()
