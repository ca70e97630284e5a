#!/usr/bin/env python
"""Benchmark: headline queries at $SPARK_GRAFT_SF_DIR on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "headline_total", "value": <sec>, "unit": "sec",
   "queries": {<name>: <sec>, ...}, "runs": {<name>: [sec, ...]},
   "sf": <sf>, "cdc_events_per_sec": <rate>, "cpus": <n>}

Each query runs ``$SPARK_GRAFT_BENCH_REPS`` times (default 3),
INTERLEAVED — the whole headline set completes round r before round
r+1 starts — and the recorded per-query number is the MEDIAN across
rounds, with every raw run disclosed in ``runs``. On this shared
sandbox identical runs vary up to 3× with host weather
(BENCH/BASELINE.md); a single-pass artifact rides that weather, a
per-query median over interleaved rounds mostly cancels it (the same
window hits all queries of a round, not one query's only sample).

The headline set exercises every hot path: the engine CDC replay
(batch + streaming merge with tombstones/lineage), validation diff +
autocorrect, schema evolution, checksums, the pandas-UDF transform
stage, and the training-data operators (LSH dedup, simhash, ANN).

A separate two-parallelism scaling run (north rule: N→4N executors,
efficiency ≥ 0.8) lives in tools/scaling_bench.py and reports into
BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

HEADLINE = [
    "cdc_replay_final_state",    # flagship: engine batch CDC replay
    "mor_cdc_replay",            # merge-on-read: 3 delta epochs + read
    "debezium_replay",           # envelope decode → same LWW replay
    "streaming_cdc_replay",      # structured-streaming replay, 3 epochs
    "validation_diff",           # full-outer diff classifier
    "autocorrect_replay",        # break-then-fix MERGE
    "schema_evolution_replay",   # rename+add across merges
    "bucket_checksums",          # per-partition checksum agg
    "lww_latest_state",          # window LWW dedup
    "extract_text_udf",          # Arrow pandas-UDF transform
    "minhash_lsh_dedup",         # minhash→LSH→verify chain
    "online_dedup",              # first-wins ingest-time dedup (window)
    "dup_clusters",              # pairs→clusters connected components
    "simhash_dup_pairs",         # simhash + segment-bucket pairs
    "token_quality",             # text quality scoring
    "corpus_curation",           # composite keep/drop curation terminal
    "cosine_topk",               # brute-force ANN baseline
    "cosine_near_dup",           # embedding-LSH near-dup pair chain
    "ann_lsh_topk",              # LSH ANN scale path
    "ivf_ann_topk",              # IVF (centroid-probe) ANN scale path
    "ann_scaled_recall",         # ann_params-scaled LSH (9 planes, 20k
                                 # vectors) + measured recall@5 vs exact
    "changelog_replication",     # cascaded CDC: 2-epoch replica hop
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0

    # bench-only: tmpfs scratch decouples shuffle I/O from the sandbox's
    # single shared virtio disk (see session.py); NOT a library default
    os.environ.setdefault("SPARK_GRAFT_TMPFS_SCRATCH", "1")

    import __spark_entry__ as E
    from cassandra_data_migrator_spark.session import get_spark

    spark = get_spark("bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    qs = E.queries()

    n_events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")).count()

    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "3"))
    runs: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(reps):
        for name in HEADLINE:
            t0 = time.time()
            df = qs[name](spark, sf_dir)
            df.count()  # force full execution, no driver-side collect
            runs[name].append(round(time.time() - t0, 3))

    timings = {name: round(statistics.median(ts), 3)
               for name, ts in runs.items()}
    replay_sec = timings.get("cdc_replay_final_state")

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "repeats": reps,
        "sf": sf,
        "cpus": cpus,
        "n_change_events": n_events,
        "cdc_events_per_sec": (
            round(n_events / replay_sec, 1) if replay_sec else None),
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
