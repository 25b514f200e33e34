#!/usr/bin/env python3
"""Key-set triple-equality gate: SURVEY.md §2 rows == the engine's
query catalog == (superset of) the latest CORRECTNESS artifact.

Usage: python3 tools/key_gate.py SURVEY.md <bench.json> [CORRECTNESS.json]
           [--scale artifact.json ...]
       python3 tools/key_gate.py --selftest

Legs (each a hard fail, exit 1):
  1. SURVEY §2 keys == engine keys (bench JSON `queries` minus the '#'
     phase rows) — a key implemented but not inventoried (or inventoried
     but not implemented) breaks the judge's line-by-line coverage read.
  2. latest CORRECTNESS keys ⊆ engine keys AND ⊆ SURVEY keys — a key that
     passed a prior round's gate must never silently vanish.
  3. (--scale, repeatable) every engine key appears in each named SCALE
     artifact — a saturated bench JSON (checked against its `queries`
     map) or a scaling-gate artifact (checked against `checked` keys ∪
     `exempt` entries). This closes the r18 hole where a key added after
     the round's scale artifacts ran (dedup_jaccard_incremental) carried
     correctness evidence but zero decade evidence, and nothing failed.
Keys new this round (engine − CORRECTNESS) are reported, not failed:
they are exactly what the NEXT driver gate will check.

Until round 17 these were manual diffs a future round could skip — this
pins them into tools/round_gate.sh's one-command round close.
"""
import json
import re
import sys


def load_artifact(path):
    """json.load with a one-line FAILED verdict instead of a traceback.

    Round-19 close committed an EMPTY bench artifact (0 bytes); anyone
    running the gate from that HEAD got a JSONDecodeError traceback,
    not a gate verdict. An empty/unparseable artifact is a FAILED leg:
    say which file and why, exit 1."""
    try:
        with open(path) as f:
            return json.load(f)
    except (json.JSONDecodeError, UnicodeDecodeError, OSError) as e:
        # OSError covers FileNotFoundError/permission: a MISSING artifact
        # deserves the same one-line verdict as an unparseable one
        sys.exit(f"key_gate FAIL: artifact {path} is missing, empty or "
                 f"unparseable ({e.__class__.__name__}: {e}) — a "
                 "committed artifact must parse; restore it from git "
                 "history (git show <commit>^:path)")


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
    return {k for k in load_artifact(path)["queries"] if "#" not in k}


def scale_artifact_keys(path):
    """Key set covered by a scale artifact: a bench JSON's `queries`
    (phase rows excluded), or a scaling-gate artifact's checked ∪ exempt
    (exempt entries are dicts {key, reason} or plain strings)."""
    d = load_artifact(path)
    if "queries" in d:
        return {k for k in d["queries"] if "#" not in k}
    keys = set(d.get("checked", {}))
    for e in d.get("exempt", []):
        keys.add(e["key"] if isinstance(e, dict) else str(e))
    return keys


def run(survey_path, bench_path, correctness_path, scale_paths=()):
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
        co = set(load_artifact(correctness_path))
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
    for sp in scale_paths:
        missing = sorted(en - scale_artifact_keys(sp))
        if missing:
            ok = False
            for k in missing:
                print(f"key_gate FAIL: `{k}` is in the engine but has no "
                      f"scale evidence in {sp}")
    print(f"key_gate: survey={len(sv)} engine={len(en)}"
          + (f" correctness={len(co)}" if correctness_path else "")
          + (f" scale_artifacts={len(scale_paths)}" if scale_paths else "")
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
    # scale-evidence leg: clean coverage passes in BOTH artifact shapes
    json.dump({"q_a": {}, "q_b": {}}, open(corr, "w"))
    sat = os.path.join(d, "sat.json")
    scal = os.path.join(d, "scaling.json")
    json.dump({"queries": {"q_a": 9.0, "q_b": 8.0, "q_b#build": 1.0}},
              open(sat, "w"))
    json.dump({"checked": {"q_a": {"ratio": 10.0}},
               "exempt": [{"key": "q_b", "reason": "below floor"}]},
              open(scal, "w"))
    assert run(sv, bench, corr, [sat, scal]), \
        "full scale coverage must pass"
    # planted positive: a catalog key absent from a scale artifact
    # (the r18 dedup_jaccard_incremental hole) MUST trip the gate
    json.dump({"queries": {"q_a": 9.0}}, open(sat, "w"))
    assert not run(sv, bench, corr, [sat, scal]), \
        "a decade-blind key must trip the scale leg"
    json.dump({"queries": {"q_a": 9.0, "q_b": 8.0}}, open(sat, "w"))
    json.dump({"checked": {"q_a": {"ratio": 10.0}}, "exempt": []},
              open(scal, "w"))
    assert not run(sv, bench, corr, [sat, scal]), \
        "a key neither checked nor exempt must trip the scale leg"
    # planted positive: an EMPTY committed artifact (the r19-close
    # bench_sf01 defect) must produce a clean one-line FAIL verdict
    # (SystemExit with a message), never a JSONDecodeError traceback
    open(bench, "w").close()  # 0 bytes
    try:
        run(sv, bench, corr)
        raise AssertionError("a 0-byte artifact must fail the gate")
    except SystemExit as e:
        assert "empty or unparseable" in str(e.code), e.code
    json.dump({"queries": {"q_a": 1.0, "q_b": 2.0}}, open(bench, "w"))
    open(scal, "w").write("{not json")  # unparseable scale artifact
    try:
        run(sv, bench, corr, [scal])
        raise AssertionError("an unparseable artifact must fail the gate")
    except SystemExit as e:
        assert "empty or unparseable" in str(e.code), e.code
    print("key_gate selftest OK")


def main():
    if len(sys.argv) == 2 and sys.argv[1] == "--selftest":
        selftest()
        return
    args = sys.argv[1:]
    scale = []
    if "--scale" in args:
        i = args.index("--scale")
        scale = args[i + 1:]
        args = args[:i]
        if not scale:
            sys.exit("key_gate: --scale needs at least one artifact")
    if len(args) not in (2, 3):
        sys.exit(__doc__)
    corr = args[2] if len(args) == 3 else None
    if not run(args[0], args[1], corr, scale):
        sys.exit(1)


if __name__ == "__main__":
    main()
