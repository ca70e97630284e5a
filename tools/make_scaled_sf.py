"""Deterministic 10×-replicated dataset — the sf1-equivalent rung of
the correctness ladder (sf0.01 driver gate → sf0.1 sweep → THIS →
4M/16M check_scale).

Replicates the driver-generated sf0.1 tables with disjoint key spaces
per copy (ids offset by copy × (max_id+1)) so every uniqueness /
monotone-seq invariant the queries rely on holds at 10× the rows:

- ``events``: event_id (seq) and user_id (key) both offset — 10× the
  key space, same per-key event distribution;
- ``documents``: doc_id offset; copies > 0 get a ``" copyN"`` suffix so
  the dedup operators see NEAR-duplicates (shingle overlap ≈ 1), not
  just exact clones;
- ``embeddings``: vec_id offset; copies > 0 get a small constant
  component shift (scaling alone would leave cosine unchanged) so ANN
  rankings have no cross-copy ties.

The oracle comparison is data-source-agnostic (Spark and DuckDB read
the SAME parquet), so replication is as strong a correctness check as
generator-fresh data — what it adds is 10× volume through every real
code path (merge shuffles, window dedup, LSH joins, driver collects).

Usage: python tools/make_scaled_sf.py [src_sf_dir] [out_dir] [factor]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def scale_tables(spark, src: str, out: str, factor: int = 10) -> dict:
    rep = F.explode(F.array(*[F.lit(i) for i in range(factor)])).alias("rep")
    stats = {}

    ev = spark.read.parquet(os.path.join(src, "events.parquet"))
    max_eid, max_uid = ev.agg(F.max("event_id"), F.max("user_id")).first()
    out_ev = (
        ev.select("*", rep)
        .withColumn("event_id",
                    F.col("event_id") + F.col("rep") * (max_eid + 1))
        .withColumn("user_id",
                    F.col("user_id") + F.col("rep") * (max_uid + 1))
        .drop("rep"))
    out_ev.coalesce(8).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet"))
    stats["events"] = out_ev.count()

    docs = spark.read.parquet(os.path.join(src, "documents.parquet"))
    max_did = docs.agg(F.max("doc_id")).first()[0]
    out_docs = (
        docs.select("*", rep)
        .withColumn("doc_id", F.col("doc_id") + F.col("rep") * (max_did + 1))
        .withColumn(
            "text",
            F.when(F.col("rep") == 0, F.col("text"))
             .otherwise(F.concat(F.col("text"), F.lit(" copy"),
                                 F.col("rep").cast("string"))))
        .drop("rep"))
    out_docs.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet"))
    stats["documents"] = out_docs.count()

    emb = spark.read.parquet(os.path.join(src, "embeddings.parquet"))
    max_vid = emb.agg(F.max("vec_id")).first()[0]
    out_emb = (
        emb.select("*", rep)
        .withColumn("vec_id", F.col("vec_id") + F.col("rep") * (max_vid + 1))
        .withColumn(
            "embedding",
            F.transform("embedding",
                        lambda x: (x + F.col("rep").cast("float")
                                   * F.lit(0.0017).cast("float"))
                        .cast("float")))
        .drop("rep"))
    out_emb.coalesce(4).write.mode("overwrite").parquet(
        os.path.join(out, "embeddings.parquet"))
    stats["embeddings"] = out_emb.count()
    return stats


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/cdm_sf1equiv"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from cassandra_data_migrator_spark.session import get_spark
    spark = get_spark("make_scaled_sf")
    print(scale_tables(spark, src, out, factor))
    spark.stop()


if __name__ == "__main__":
    main()
