#!/usr/bin/env python3
"""Assemble an ANN-recall operating-curve artifact from a graft.Verify
dump — the big-SF companion to the sf0.01 correctness gate, answering
"what recall does each approximate leg actually deliver at production
corpus sizes" (the sf0.01 audits are exact-checked oracles but weak as
operating curves: 20 queries over 500 vectors says little about sf1).

Usage:
  1. SPARK_GRAFT_CPUS=16 java ... graft.Verify /root/testdata/sf1 <dump> \
       q_recall q_recall_sweep q_pq_recall q_rp_recall q_rp_sweep \
       q_ivf_filtered_recall q_pq_filtered_recall mm_recall \
       q_knn q_sign_search q_sign_refine
  2. python3 tools/recall_audit.py <dump> <out.json> [sf_label]

Sign recall has no dedicated catalog key (the sign leg is audited via
its refine identity), so it is computed HERE as top-k overlap between
q_sign_search / q_sign_refine and the exact q_knn ranking — same
denominator convention as q_recall (k per query; the exact side always
returns k).
"""
import json
import sys

import duckdb


def rows(dump, key):
    return duckdb.sql(
        f"SELECT * FROM '{dump}/{key}/*.parquet'").df().to_dict("records")


def mean_recall(dump, key, col="recall"):
    r = rows(dump, key)
    return round(sum(x[col] for x in r) / len(r), 6) if r else None


def overlap_vs_exact(dump, approx_key):
    """Per-query |approx top-k ∩ exact top-k| / k, averaged."""
    df = duckdb.sql(f"""
      WITH e AS (SELECT query_id, vec_id FROM '{dump}/q_knn/*.parquet'),
           a AS (SELECT query_id, vec_id
                 FROM '{dump}/{approx_key}/*.parquet'),
           k AS (SELECT query_id, COUNT(*) AS k FROM e GROUP BY 1),
           h AS (SELECT e.query_id, COUNT(*) AS hits
                 FROM e JOIN a USING (query_id, vec_id) GROUP BY 1)
      SELECT AVG(coalesce(h.hits, 0) / CAST(k.k AS DOUBLE)) AS r
      FROM k LEFT JOIN h USING (query_id)""").df()
    return round(float(df["r"][0]), 6)


def main():
    if len(sys.argv) < 3:
        sys.exit(__doc__)
    dump, out = sys.argv[1], sys.argv[2]
    sf = sys.argv[3] if len(sys.argv) > 3 else dump
    pq = rows(dump, "q_pq_recall")
    art = {
        "sf": sf,
        "ivf": {
            "recall_at_5_default_nprobe": mean_recall(dump, "q_recall"),
            "sweep": [
                {"nprobe": int(r["nprobe"]),
                 "recall": round(r["recall"], 6),
                 "scan_share": round(r["scan_share"], 6)}
                for r in rows(dump, "q_recall_sweep")],
            "filtered_recall_at_5":
                mean_recall(dump, "q_ivf_filtered_recall"),
        },
        "pq": {
            "recall_seed":
                round(sum(r["recall_pq_seed"] for r in pq) / len(pq), 6),
            "recall_trained":
                round(sum(r["recall_pq_trained"] for r in pq) / len(pq), 6),
            "recall_ivfpq":
                round(sum(r["recall_ivfpq"] for r in pq) / len(pq), 6),
            "filtered_recall_at_5":
                mean_recall(dump, "q_pq_filtered_recall"),
        },
        "sign": {
            "recall_raw": overlap_vs_exact(dump, "q_sign_search"),
            "recall_refined": overlap_vs_exact(dump, "q_sign_refine"),
        },
        "jl": {
            "recall_at_5": mean_recall(dump, "q_rp_recall"),
            "sweep": [
                {"out_dim": int(r["out_dim"]),
                 "recall": round(r["recall"], 6),
                 "scan_frac": round(r["scan_frac"], 6)}
                for r in rows(dump, "q_rp_sweep")],
        },
        "multimodal_ivf": {
            "recall_at_5": mean_recall(dump, "mm_recall"),
        },
    }
    json.dump(art, open(out, "w"), indent=1)
    print(json.dumps(art, indent=1))


if __name__ == "__main__":
    main()
