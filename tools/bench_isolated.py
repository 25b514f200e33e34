#!/usr/bin/env python3
"""Isolated-JVM wall bench: ONE JVM per query, so cross-round wall
comparisons mean something.

Why: the shared-JVM suite run measures each query in whatever JIT/GC/
block-manager state the previous 170 queries left behind — round-12
measured back-to-back full-suite sf1 runs disagreeing 8.2x on individual
queries with DISJOINT outlier sets (PROGRESS.md round-12 batch 5), so
shared-JVM wall deltas between rounds are noise. Records are exact
either way; this tool is for the WALL side: each query gets a fresh JVM,
the standard Bench warm-up (JIT + codegen + its own index caches), and
its own timed run.

Usage:
  python3 tools/bench_isolated.py <sf_dir> <out.json> [query ...]

With no queries listed, takes the N_HEAVIEST slowest from
tools/bench_last.json (the most recent full-suite run).

Launches bare `java` against /opt/spark/jars + target/scala-2.13/classes
(no sbt lock, ~6s JVM startup per query instead of ~20s sbt overhead).
"""
import json
import os
import subprocess
import sys

N_HEAVIEST = 20
CLASSPATH = "/opt/spark/jars/*:target/scala-2.13/classes"
JVM_FLAGS = [
    "-Xmx24g",
    # Spark 4 on Java 17 needs the usual add-opens set (copied from
    # sbt's fork options / spark-class defaults)
    "--add-opens=java.base/java.lang=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.invoke=ALL-UNNAMED",
    "--add-opens=java.base/java.lang.reflect=ALL-UNNAMED",
    "--add-opens=java.base/java.io=ALL-UNNAMED",
    "--add-opens=java.base/java.net=ALL-UNNAMED",
    "--add-opens=java.base/java.nio=ALL-UNNAMED",
    "--add-opens=java.base/java.util=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent=ALL-UNNAMED",
    "--add-opens=java.base/java.util.concurrent.atomic=ALL-UNNAMED",
    "--add-opens=java.base/jdk.internal.ref=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.ch=ALL-UNNAMED",
    "--add-opens=java.base/sun.nio.cs=ALL-UNNAMED",
    "--add-opens=java.base/sun.security.action=ALL-UNNAMED",
    "--add-opens=java.base/sun.util.calendar=ALL-UNNAMED",
]


def heaviest(n):
    last = json.load(open("tools/bench_last.json"))
    qs = [(t, q) for q, t in last["queries"].items() if t > 0]
    return [q for _, q in sorted(qs, reverse=True)[:n]]


def run_one(sf_dir, query, env):
    cmd = ["java", *JVM_FLAGS, "-cp", CLASSPATH, "graft.Bench", query]
    p = subprocess.run(cmd, capture_output=True, text=True, env=env,
                       timeout=3600)
    for line in p.stdout.splitlines():
        if line.startswith('{"metric"'):
            d = json.loads(line)
            t = d["queries"].get(query)
            rec = d.get("shuffle_rec", {}).get(query)
            spill = (d.get("spill_mem_mb", {}).get(query),
                     d.get("spill_disk_mb", {}).get(query))
            return t, rec, spill, d.get("failed", "[]")
    sys.stderr.write(f"[isolated] {query}: no bench line\n"
                     f"--- stdout tail ---\n{p.stdout[-2000:]}\n"
                     f"--- stderr tail ---\n{p.stderr[-2000:]}\n")
    return None, None, (None, None), None


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    sf_dir, out_path = sys.argv[1], sys.argv[2]
    queries = sys.argv[3:] or heaviest(N_HEAVIEST)
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env.setdefault("SPARK_GRAFT_CPUS", "8")
    times, recs, failed = {}, {}, []
    spills_m, spills_d = {}, {}
    for q in queries:
        t, rec, (spm, spd), f = run_one(sf_dir, q, env)
        if t is None or t < 0:
            failed.append(q)
            times[q] = -1.0
        else:
            times[q] = round(t, 3)
            if rec is not None:
                recs[q] = rec
            if spm is not None:
                spills_m[q] = spm
            if spd is not None:
                spills_d[q] = spd
        print(f"  {q}: {times[q]} s", flush=True)
    total = sum(t for t in times.values() if t > 0)
    doc = {"metric": "total", "value": round(total, 3), "unit": "sec",
           "isolated": True, "queries": times, "shuffle_rec": recs,
           "spill_mem_mb": spills_m, "spill_disk_mb": spills_d,
           "failed": failed, "sf": sf_dir}
    json.dump(doc, open(out_path, "w"), indent=1, sort_keys=True)
    print(f"total {round(total, 2)} s over {len(queries)} queries "
          f"-> {out_path}")
    if failed:
        sys.exit(f"FAILED: {failed}")


if __name__ == "__main__":
    main()
