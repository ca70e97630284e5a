#!/usr/bin/env python
"""Correctness at SCALE, beyond the driver's sf0.01 gate: generate N
deterministic change events, replay them through the real streaming
engine path (chunked log -> readStream -> foreachBatch merge, many
epochs), and compare the FINAL TABLE STATE against a DuckDB LWW replay
of the same on-disk event log:

- row count,
- an order-insensitive XOR checksum over the full live-row content
  (url, epoch-us(warc_ts), normalized lang, md5(html)) computed
  independently in both engines (md5-int48 folding — the repo's
  canonical cross-engine hash, functions/hashing.py),
- plus the per-row invariant the oracle CANNOT express: `text` must be
  byte-identical to re-extracting from the stored html (the Arrow-UDF
  derivation), checked Spark-side over every row.

This is the north-rule "replay to the reference final state" check at
a size where per-epoch plumbing (fences, lineage, probed rollups) has
to work across many micro-batches — default 4M events, 40x the
driver's correctness scale. Usage:

  python tools/check_scale.py [--events 4000000] [--urls 800000]
                              [--chunks 32] [--mft 4] [--cores 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=4_000_000)
    ap.add_argument("--urls", type=int, default=800_000)
    ap.add_argument("--chunks", type=int, default=32)
    ap.add_argument("--mft", type=int, default=4,
                    help="maxFilesPerTrigger (chunks/mft = epochs)")
    ap.add_argument("--cores", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--buckets", type=int, default=32)
    ap.add_argument("--seed", type=int, default=13)
    ap.add_argument("--workdir", default=None)
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_TMPFS_SCRATCH", "1")  # bench-style run
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from cassandra_data_migrator_spark.config import EngineConfig
    from cassandra_data_migrator_spark.functions.hashing import (
        md5_int48_expr, md5_int48_sql)
    from cassandra_data_migrator_spark.functions.udfs import extract_text
    from cassandra_data_migrator_spark.lake import LakeTable
    from cassandra_data_migrator_spark.session import get_spark
    from cassandra_data_migrator_spark.sources import (
        gen_change_events, write_event_log)
    from cassandra_data_migrator_spark.streaming import CdcPipeline

    spark = get_spark("check_scale", master=f"local[{args.cores}]",
                      shuffle_partitions=args.cores,
                      # local-mode: one JVM hosts all 32 writer tasks —
                      # the default ~1g heap OOMs writing 32 parquet
                      # chunks of fat binary rows (same setting as
                      # tools/scaling_bench.py)
                      extra_conf={"spark.driver.memory": "48g"})
    d = args.workdir or tempfile.mkdtemp(prefix="cdm_scale_")
    os.makedirs(d, exist_ok=True)
    log = os.path.join(d, "log")

    t0 = time.time()
    write_event_log(
        gen_change_events(spark, n_urls=args.urls, n_events=args.events,
                          seed=args.seed, partitions=args.cores),
        log, n_chunks=args.chunks)
    t_gen = time.time() - t0

    schema = T.StructType.fromDDL(
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string")
    table = LakeTable.create(spark, os.path.join(d, "table"), schema,
                             EngineConfig(n_buckets=args.buckets))
    pipe = CdcPipeline(spark, table, stream_id="scale")
    t0 = time.time()
    pipe.run_stream(log, os.path.join(d, "ckpt"),
                    max_files_per_trigger=args.mft,
                    available_now=True).awaitTermination()
    t_apply = time.time() - t0

    # ---- engine side: one agg job over the final state --------------
    table = LakeTable(spark, table.path)
    canon = F.concat_ws(
        "|", F.col("url"), F.unix_micros("warc_ts").cast("string"),
        F.coalesce(F.col("lang"), F.lit("∅")), F.md5("html"))
    t0 = time.time()
    row = table.read().agg(
        F.count("*").alias("n"),
        F.bit_xor(md5_int48_expr(canon)).alias("cs"),
        F.sum((~F.col("text").eqNullSafe(extract_text(F.col("html"))))
              .cast("long")).alias("text_mismatch"),
    ).collect()[0]
    t_check_spark = time.time() - t0

    # ---- oracle side: DuckDB LWW replay of the same log files -------
    # Free the JVM first (a grown 48g heap + DuckDB's working set is
    # what the OOM killer sees), and hash the html BEFORE the window:
    # carrying raw 10 KB blobs through a 16M-row window sort is ~150 GB
    # of decoded payload; the 32-char digest is all the checksum needs.
    spark.stop()
    import duckdb
    con = duckdb.connect()
    con.execute("SET memory_limit='24GB'")
    canon_sql = ("url || '|' || CAST(epoch_us(warc_ts) AS VARCHAR) || '|' "
                 "|| (CASE WHEN lang IS NULL OR lang = '' THEN '∅' "
                 "ELSE lang END) || '|' || hh")
    t0 = time.time()
    orc = con.sql(f"""
        WITH e AS (
          SELECT url, warc_ts, seq, op, lang,
                 md5(CAST(html AS VARCHAR)) AS hh
          FROM read_parquet('{log}/part-*.parquet')),
        ranked AS (
          SELECT *, row_number() OVER (
            PARTITION BY url ORDER BY warc_ts DESC, seq DESC) AS rn
          FROM e)
        SELECT count(*) AS n, bit_xor({md5_int48_sql(canon_sql)}) AS cs
        FROM ranked WHERE rn = 1 AND op <> 'delete'
    """).fetchall()[0]
    t_check_duck = time.time() - t0

    out = {
        "events": args.events, "urls": args.urls,
        "epochs": (args.chunks + args.mft - 1) // args.mft,
        "final_rows_spark": int(row["n"]), "final_rows_oracle": int(orc[0]),
        "rows_match": int(row["n"]) == int(orc[0]),
        "checksum_spark": int(row["cs"]), "checksum_oracle": int(orc[1]),
        "checksum_match": int(row["cs"]) == int(orc[1]),
        "text_mismatches": int(row["text_mismatch"] or 0),
        "gen_s": round(t_gen, 1), "apply_s": round(t_apply, 1),
        "events_per_sec": round(args.events / t_apply, 1),
        "check_spark_s": round(t_check_spark, 1),
        "check_oracle_s": round(t_check_duck, 1),
        "cores": args.cores,
    }
    print(json.dumps(out))
    ok = (out["rows_match"] and out["checksum_match"]
          and out["text_mismatches"] == 0)
    if args.workdir is None:
        shutil.rmtree(d, ignore_errors=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
