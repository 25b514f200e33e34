#!/usr/bin/env python3
"""Key-set triple-equality gate: SURVEY.md §2 rows == the engine's
query catalog == (superset of) the latest CORRECTNESS artifact.

Usage: python3 tools/key_gate.py SURVEY.md <bench.json> [CORRECTNESS.json]
       python3 tools/key_gate.py --selftest

Legs (each a hard fail, exit 1):
  1. SURVEY §2 keys == engine keys (bench JSON `queries` minus the '#'
     phase rows) — a key implemented but not inventoried (or inventoried
     but not implemented) breaks the judge's line-by-line coverage read.
  2. latest CORRECTNESS keys ⊆ engine keys AND ⊆ SURVEY keys — a key that
     passed a prior round's gate must never silently vanish.
Keys new this round (engine − CORRECTNESS) are reported, not failed:
they are exactly what the NEXT driver gate will check.

Until round 17 these were manual diffs a future round could skip — this
pins them into tools/round_gate.sh's one-command round close.
"""
import json
import re
import sys


def survey_keys(path):
    txt = open(path).read()
    # §2 spans from its header to the next '## §' header
    m = re.search(r"## §2.*?(?=\n## §)", txt, re.S)
    if not m:
        sys.exit("key_gate: no §2 section found in " + path)
    keys = set()
    for line in m.group(0).splitlines():
        # inventory rows: | id | `key` | description | check |
        cells = [c.strip() for c in line.split("|")]
        if len(cells) >= 4 and re.fullmatch(r"`[a-z0-9_]+`", cells[2] or ""):
            keys.add(cells[2].strip("`"))
    return keys


def engine_keys(path):
    return {k for k in json.load(open(path))["queries"] if "#" not in k}


def run(survey_path, bench_path, correctness_path):
    sv = survey_keys(survey_path)
    en = engine_keys(bench_path)
    ok = True
    if sv != en:
        ok = False
        for k in sorted(sv - en):
            print(f"key_gate FAIL: `{k}` in SURVEY §2 but not in the engine")
        for k in sorted(en - sv):
            print(f"key_gate FAIL: `{k}` in the engine but not in SURVEY §2")
    if correctness_path:
        co = set(json.load(open(correctness_path)))
        for k in sorted(co - en):
            ok = False
            print(f"key_gate FAIL: `{k}` passed {correctness_path} "
                  "but vanished from the engine")
        for k in sorted(co - sv):
            ok = False
            print(f"key_gate FAIL: `{k}` passed {correctness_path} "
                  "but vanished from SURVEY §2")
        new = sorted(en - co)
        if new:
            print(f"key_gate: {len(new)} new key(s) await the next "
                  f"driver gate: {', '.join(new)}")
    print(f"key_gate: survey={len(sv)} engine={len(en)}"
          + (f" correctness={len(co)}" if correctness_path else "")
          + (" — OK" if ok else " — FAIL"))
    return ok


def selftest():
    import os
    import tempfile
    d = tempfile.mkdtemp(prefix="key-gate-self")
    sv = os.path.join(d, "SURVEY.md")
    bench = os.path.join(d, "bench.json")
    corr = os.path.join(d, "corr.json")
    open(sv, "w").write(
        "## §2 Operator inventory\n"
        "| 1 | `q_a` | thing | oracle |\n"
        "| 2 | `q_b` | thing | oracle |\n"
        "\n## §3 other\n")
    json.dump({"queries": {"q_a": 1.0, "q_b": 2.0, "q_b#build": 0.5}},
              open(bench, "w"))
    json.dump({"q_a": {}, "q_b": {}}, open(corr, "w"))
    assert run(sv, bench, corr), "clean triple must pass"
    # planted positive 1: engine grows a key SURVEY lacks
    json.dump({"queries": {"q_a": 1.0, "q_b": 2.0, "q_c": 3.0}},
              open(bench, "w"))
    assert not run(sv, bench, corr), "engine-only key must trip leg 1"
    # planted positive 2: a gated key vanishes from the engine
    json.dump({"queries": {"q_a": 1.0}}, open(bench, "w"))
    assert not run(sv, bench, corr), "vanished gated key must trip leg 2"
    # new keys (engine minus correctness) are reported, never failed
    json.dump({"queries": {"q_a": 1.0, "q_b": 2.0}}, open(bench, "w"))
    json.dump({"q_a": {}}, open(corr, "w"))
    assert run(sv, bench, corr), "a NEW key must not fail the gate"
    print("key_gate selftest OK")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    if len(sys.argv) not in (3, 4):
        sys.exit(__doc__)
    corr = sys.argv[3] if len(sys.argv) == 4 else None
    if not run(sys.argv[1], sys.argv[2], corr):
        sys.exit(1)


if __name__ == "__main__":
    main()
