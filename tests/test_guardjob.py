"""Standalone guardrail job (reference GuardrailCheck.scala:22-52 +
GuardrailCheckJobSession.java:45-80): scan → READ/VALID/LARGE totals,
per-bucket slice counters, failing-row frame, and a run_info row."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake.table import LakeTable
from cassandra_data_migrator_spark.streaming.guardjob import (
    GuardrailReport,
    run_guardrail_check,
)


@pytest.fixture()
def docs(spark):
    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
    ])
    rows = [
        (0, "x" * 100, "small"),
        (1, "y" * 3000, "small"),        # text > 2 KB -> LARGE
        (2, "z" * 100, "w" * 2500),      # source > 2 KB -> LARGE
        (3, None, "small"),
        (4, "ok", None),
    ]
    return spark.createDataFrame(rows, schema)


def test_global_totals_and_large_rows(spark, docs):
    rep = run_guardrail_check(docs, ["text", "source"], col_size_kb=2.0)
    assert isinstance(rep, GuardrailReport)
    assert rep.totals == {"read": 5, "valid": 3, "large": 2,
                          "partitions_passed": 1}
    assert rep.per_bucket is None
    large_ids = sorted(r["doc_id"] for r in rep.large_rows.collect())
    assert large_ids == [1, 2]


def test_per_bucket_slices_sum_to_totals(spark, docs):
    rep = run_guardrail_check(docs, ["text", "source"], col_size_kb=2.0,
                              key_col="doc_id", n_buckets=4)
    rows = rep.per_bucket.collect()
    assert rep.totals["partitions_passed"] == len(rows)
    assert sum(r["read"] for r in rows) == 5
    assert sum(r["large"] for r in rows) == 2
    assert rep.totals["read"] == 5 and rep.totals["large"] == 2


def test_run_info_row_recorded(spark, docs, tmpdir_path):
    from cassandra_data_migrator_spark.streaming.runinfo import run_info

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType(), True),
    ])
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "g"), schema,
                         EngineConfig(n_buckets=4, key_col="doc_id",
                                      ts_col="doc_id"))
    rep = run_guardrail_check(docs, ["text", "source"], col_size_kb=2.0,
                              table=t, run_id="audit1")
    row = run_info(spark, t).filter(F.col("kind") == "guardrail").collect()
    assert len(row) == 1
    r = row[0]
    assert r["run_id"] == "audit1" and r["status"] == "ENDED"
    assert r["read"] == 5 and r["valid"] == 3 and r["quarantined"] == 2
    assert r["events_applied"] == 0
    # idempotent re-record (deterministic object key)
    run_guardrail_check(docs, ["text", "source"], col_size_kb=2.0,
                        table=t, run_id="audit1")
    assert run_info(spark, t).filter(
        F.col("kind") == "guardrail").count() == 1
    assert rep.totals["large"] == 2
