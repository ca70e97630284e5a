"""Validation/autocorrect — reproduces SIT/smoke/02_autocorrect_kvp:
apply events, break the target (delete one row, corrupt one value),
validate → exact MISSING/MISMATCH counts, autocorrect repairs both,
extra target rows are never deleted."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.operators.diff import (
    autocorrect,
    diff_counters,
    diff_tables,
    per_bucket_diff,
)

UTC = dt.timezone.utc
WEB_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def ts(s):
    return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=s)


@pytest.fixture()
def seeded(spark, tmpdir_path):
    """origin truth (10 pages) + a lake table holding the same rows."""
    rows = [(f"https://x/{i}", ts(i), f"<p>v{i}</p>".encode(), f"v{i}", "en")
            for i in range(10)]
    origin = spark.createDataFrame(rows, WEB_SCHEMA)
    table = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), WEB_SCHEMA,
                             EngineConfig(n_buckets=8))
    table.overwrite(origin)
    return origin, table


def break_target(spark, table):
    """Delete one row, corrupt one text, add one extra row."""
    cur = table.read()
    broken = (
        cur.filter(F.col("url") != "https://x/3")
           .withColumn("text", F.when(F.col("url") == "https://x/5",
                                      F.lit("CORRUPTED")).otherwise(F.col("text")))
    )
    extra = spark.createDataFrame(
        [("https://extra/1", ts(999), b"<p>e</p>", "e", "de")], WEB_SCHEMA)
    table.overwrite(broken.unionByName(extra))


def test_validate_clean(spark, seeded):
    origin, table = seeded
    d = diff_tables(origin, table.read(), key_cols=["url"], n_buckets=8)
    c = diff_counters(d)
    assert c == {"read": 10, "valid": 10, "mismatch": 0, "missing": 0,
                 "extra_target": 0, "error": 0}
    pb = per_bucket_diff(d)
    assert {r["status"] for r in pb.collect()} == {"PASS"}


def test_validate_broken_counts(spark, seeded):
    origin, table = seeded
    break_target(spark, table)
    d = diff_tables(origin, table.read(), key_cols=["url"], n_buckets=8)
    c = diff_counters(d)
    assert c["missing"] == 1 and c["mismatch"] == 1
    assert c["valid"] == 8 and c["extra_target"] == 1
    # the mismatch names the corrupted column
    row = d.filter(F.col("diff_status") == "mismatch").collect()[0]
    assert row["mismatch_cols"] == ["text"]
    assert "DIFF" in {r["status"] for r in per_bucket_diff(d).collect()}


def test_autocorrect_repairs_and_never_deletes(spark, seeded):
    origin, table = seeded
    break_target(spark, table)
    d = diff_tables(origin, table.read(), key_cols=["url"], n_buckets=8)
    _, corrected = autocorrect(table, origin, d, key_cols=["url"])
    assert corrected == {"corrected_missing": 1, "corrected_mismatch": 1}
    # re-validate: clean, and the extra row is still there (never deleted)
    d2 = diff_tables(origin, table.read(), key_cols=["url"], n_buckets=8)
    c2 = diff_counters(d2)
    assert c2["missing"] == 0 and c2["mismatch"] == 0 and c2["valid"] == 10
    assert c2["extra_target"] == 1


def test_autocorrect_force_overwrites_newer_corruption(spark, seeded):
    """A corrupted target row with a NEWER warc_ts must still be repaired
    (reference re-upserts unconditionally, DiffJobSession.java:255-258)."""
    origin, table = seeded
    cur = table.read()
    broken = cur.withColumn(
        "warc_ts",
        F.when(F.col("url") == "https://x/7",
               F.lit(ts(10_000))).otherwise(F.col("warc_ts")),
    ).withColumn(
        "text",
        F.when(F.col("url") == "https://x/7",
               F.lit("NEWER_CORRUPT")).otherwise(F.col("text")),
    )
    table.overwrite(broken)
    d = diff_tables(origin, table.read(), key_cols=["url"], n_buckets=8)
    assert diff_counters(d)["mismatch"] == 1
    autocorrect(table, origin, d, key_cols=["url"])
    d2 = diff_tables(origin, table.read(), key_cols=["url"], n_buckets=8)
    assert diff_counters(d2)["mismatch"] == 0
    assert diff_counters(d2)["valid"] == 10
