"""Recall/cost curve for the scaled LSH ANN path (VERDICT r4 #8).

Sweeps ``n_tables`` at FIXED ann_params bucket occupancy (the plane
count stays sized to the corpus; only the table count — the documented
"buy recall back" knob — varies) over the same 20k x 16 synthetic
corpus the ``ann_scaled_recall`` entry measures, and reports
avg recall@k vs wall time per point so the trade-off claim carries
measured numbers.

Usage: python tools/recall_curve.py [--tables 2,4,8] [--n 20000]
       [--dim 16] [--k 5] [--queries 20] [--repeats 2] [--json OUT]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables", default="2,4,8")
    ap.add_argument("--n", type=int, default=20_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_TMPFS_SCRATCH", "1")

    import __spark_entry__ as E
    from cassandra_data_migrator_spark.session import get_spark
    from cassandra_data_migrator_spark.operators import similarity as SIM

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("recall_curve", master=f"local[{cpus}]")

    emb = E._synthetic_embeddings(spark, args.n, args.dim).cache()
    emb.count()  # materialize once; the sweep times the ANN, not the gen
    queries = emb.filter(emb.vec_id < args.queries)

    # exact baseline once — shared across every sweep point
    exact = SIM.cosine_topk(emb, queries, k=args.k).cache()
    exact.count()
    n_planes, _ = SIM.ann_params(args.n)

    points = []
    for n_tables in [int(t) for t in args.tables.split(",")]:
        recalls, walls = [], []
        for _ in range(args.repeats):
            t0 = time.time()
            approx = SIM.lsh_ann_topk_scaled(
                emb, queries, corpus_size=args.n, dim=args.dim,
                k=args.k, n_tables=n_tables)
            rec = SIM.recall_at_k(approx, exact).collect()
            walls.append(time.time() - t0)
            recalls.append(sum(r["recall"] for r in rec) / max(len(rec), 1))
        point = {
            "n_tables": n_tables,
            "n_planes": n_planes,
            "avg_recall_at_k": round(statistics.median(recalls), 4),
            "wall_s_median": round(statistics.median(walls), 2),
            "wall_s_all": [round(w, 2) for w in walls],
        }
        points.append(point)
        print(json.dumps(point))

    out = {"n": args.n, "dim": args.dim, "k": args.k,
           "n_queries": args.queries, "cpus": cpus,
           "occupancy_target_rows": 64, "points": points}
    print(json.dumps(out))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
