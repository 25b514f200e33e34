#!/bin/bash
# Round closing gate: run the full sf0.1 bench, then fail loudly on any
# round-over-round per-query shuffle-WIDTH regression (shuffle_diff.py's
# bytes gate — the signal records-scaling and PlanDoctor are blind to).
#
# Usage: tools/round_gate.sh <round_number> [prev_bench.json]
#   1. self-tests the width gate (planted positive MUST trip);
#   2. runs graft.Bench at sf0.1 (full catalog, fresh JVM, CPUS=32)
#      -> tools/bench_sf01_r<N>.json;
#   3. diffs it against the previous round's committed artifact with
#      --gate -> tools/width_diff_r<N>.txt (commit both).
# Exit non-zero on any step failing, so a width regression stops the
# round instead of waiting for a judge to read the artifact.
set -euo pipefail
cd "$(dirname "$0")/.."

N="${1:?usage: tools/round_gate.sh <round_number> [prev_bench.json]}"
PREV="${2:-$(ls tools/bench_sf01_r*.json 2>/dev/null | sort -V | tail -1)}"
[ -n "$PREV" ] || { echo "no previous bench artifact found"; exit 1; }

python3 tools/shuffle_diff.py --selftest

ADD_OPENS=$(sed -n 's/.*"\(--add-opens=[^"]*\)".*/\1/p' tools/bench_isolated.py | tr '\n' ' ')
OUT="tools/bench_sf01_r${N}.json"
# shellcheck disable=SC2086
SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-32}" \
  java -Xmx24g $ADD_OPENS -cp "/opt/spark/jars/*:target/scala-2.13/classes" \
  graft.Bench 2>/dev/null | head -1 > "$OUT"
python3 -c "import json,sys; d=json.load(open('$OUT')); \
  sys.exit(1 if d['failed'] else 0)" \
  || { echo "bench reported failed queries — see $OUT"; exit 1; }

python3 tools/shuffle_diff.py "$PREV" "$OUT" --gate \
  | tee "tools/width_diff_r${N}.txt"
echo "round gate OK: $OUT vs $PREV"
