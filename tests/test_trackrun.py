"""Tracked batch runs: kill-mid-run → resume must converge to the
single-shot result (reference TrackRun previousRunId replay), plus the
metadata-FS seam."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.lake.fs import LocalFS, get_fs, register_fs
from cassandra_data_migrator_spark.streaming.trackrun import BatchRunTracker

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampNTZType(), True),
    T.StructField("v", T.LongType(), True),
])


def _events(spark, n=400, keys=80):
    base = datetime(2024, 1, 1)
    rows = [(f"u{i % keys}", base + timedelta(minutes=i), i,
             "delete" if i % 37 == 0 else "update", i)
            for i in range(n)]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp_ntz, v long, op string, seq long")


def _state(table):
    return {r["url"]: (r["warc_ts"], r["v"])
            for r in table.read().collect()}


def test_kill_mid_run_then_resume_converges(spark, tmpdir_path):
    ev = _events(spark)
    cfg = EngineConfig(n_buckets=16, key_col="url", ts_col="warc_ts")

    # oracle: single-shot merge of the whole batch
    ref = LakeTable.create(spark, f"{tmpdir_path}/ref", SCHEMA, cfg)
    ref.merge_batch(ev)

    # tracked run killed after 3 of 8 groups
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, cfg)
    tracker = BatchRunTracker(spark, t, n_groups=8)
    tracker.run(ev, "run1", groups=[0, 1, 2])          # "crash" here
    assert tracker.pending_groups("run1") == [3, 4, 5, 6, 7]

    t2 = LakeTable(spark, t.path)                      # fresh process
    tracker2 = BatchRunTracker(spark, t2, n_groups=8)
    results = tracker2.resume(ev, "run1")
    assert all(not r.skipped for r in results)
    assert tracker2.pending_groups("run1") == []
    assert _state(t2) == _state(ref)

    # resuming again re-merges nothing
    assert tracker2.resume(ev, "run1") == []
    # and a forced re-merge of a committed group is fenced off
    assert tracker2.run(ev, "run1", groups=[3])[0].skipped


def test_resume_with_rerun_multiplier(spark, tmpdir_path):
    ev = _events(spark)
    cfg = EngineConfig(n_buckets=16, key_col="url", ts_col="warc_ts")
    ref = LakeTable.create(spark, f"{tmpdir_path}/ref", SCHEMA, cfg)
    ref.merge_batch(ev)

    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, cfg)
    tracker = BatchRunTracker(spark, t, n_groups=4)
    tracker.run(ev, "runm", groups=[0])
    # retry the pending groups in finer sub-merges (reference P4)
    tracker.resume(ev, "runm", rerun_multiplier=3)
    assert tracker.pending_groups("runm") == []
    assert _state(t) == _state(ref)
    # a later plain resume sees the multiplier-covered groups as PASS
    assert tracker.resume(ev, "runm") == []


def test_crash_after_commit_before_pass_row_converges(spark, tmpdir_path):
    """Crash window: a group's manifest commit landed but its PASS row
    did not. Resume re-attempts the group, the epoch fence skips the
    merge — and the PASS row must STILL be recorded (the fence proves
    the commit happened), so resume converges instead of re-attempting
    a fenced no-op forever (ADVICE r2)."""
    ev = _events(spark)
    cfg = EngineConfig(n_buckets=16, key_col="url", ts_col="warc_ts")
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, cfg)
    tracker = BatchRunTracker(spark, t, n_groups=4)
    tracker.run(ev, "runc", groups=[0, 1])
    # simulate the crash: group 1's PASS row vanishes, its commit stays
    os.remove(os.path.join(tracker.details_path,
                           "part-runc-g1-0-1.parquet"))
    assert tracker.pending_groups("runc") == [1, 2, 3]

    results = tracker.resume(ev, "runc")
    # group 1 was fenced (no double merge) but is now recorded PASS
    assert [r.skipped for r in results] == [True, False, False]
    assert tracker.pending_groups("runc") == []
    assert tracker.resume(ev, "runc") == []

    # the recovered PASS row carries the TRUE totals (recovered from
    # the committed manifest's lineage), not zeros
    g1 = (tracker.run_details()
          .filter((F.col("run_id") == "runc") & (F.col("grp") == 1))
          .collect())
    assert len(g1) == 1 and g1[0]["events"] > 0 and g1[0]["buckets"] > 0

    # state equals a single-shot replay
    ref = LakeTable.create(spark, f"{tmpdir_path}/ref", SCHEMA, cfg)
    ref.merge_batch(ev)
    assert _state(t) == _state(ref)


def test_full_rerun_does_not_clobber_pass_totals(spark, tmpdir_path):
    """An at-least-once scheduler re-running an ALREADY-COMPLETE run:
    every group merge is fence-skipped, and each group's recorded PASS
    totals must survive untouched (a rewrite from the skip's empty
    counters would zero them, making finalize report events_applied=0
    for a fully applied run)."""
    from cassandra_data_migrator_spark.streaming import (
        finalize_tracked_run,
    )

    ev = _events(spark)
    cfg = EngineConfig(n_buckets=16, key_col="url", ts_col="warc_ts")
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, cfg)
    tracker = BatchRunTracker(spark, t, n_groups=4)
    tracker.run(ev, "runr")
    before = {(r["grp"]): (r["events"], r["buckets"], r["version"])
              for r in tracker.run_details().collect()}
    assert sum(e for e, _, _ in before.values()) == ev.count()

    results = tracker.run(ev, "runr")           # the retry
    assert all(r.skipped for r in results)
    after = {(r["grp"]): (r["events"], r["buckets"], r["version"])
             for r in tracker.run_details().collect()}
    assert after == before
    assert finalize_tracked_run(tracker, "runr")["events_applied"] \
        == ev.count()


def test_tracked_run_info_ended_only_when_complete(spark, tmpdir_path):
    """cdm_run_info analog for tracked batch runs: STARTED while groups
    are pending, ENDED with full totals once the run converges."""
    from cassandra_data_migrator_spark.streaming import (
        finalize_tracked_run,
        run_info,
    )

    ev = _events(spark)
    cfg = EngineConfig(n_buckets=16, key_col="url", ts_col="warc_ts")
    t = LakeTable.create(spark, f"{tmpdir_path}/t", SCHEMA, cfg)
    tracker = BatchRunTracker(spark, t, n_groups=4)
    tracker.run(ev, "runi", groups=[0, 1])
    partial = finalize_tracked_run(tracker, "runi")
    assert run_info(spark, t).collect()[0]["status"] == "STARTED"

    tracker.resume(ev, "runi")
    totals = finalize_tracked_run(tracker, "runi")
    row = run_info(spark, t).collect()[0]         # overwritten, 1 row
    assert run_info(spark, t).count() == 1
    assert row["status"] == "ENDED"
    assert totals["events_applied"] == ev.count()
    assert totals["events_applied"] > partial["events_applied"]
    assert row["final_version"] == t.version


def test_fs_seam_local_roundtrip(tmpdir_path):
    fs = get_fs(tmpdir_path)
    assert isinstance(fs, LocalFS)
    d = os.path.join(tmpdir_path, "meta")
    fs.makedirs(d)
    p = os.path.join(d, "v1.json")
    fs.create_exclusive(p, '{"version": 1}')
    with pytest.raises(FileExistsError):
        fs.create_exclusive(p, "dup")          # commit-conflict semantics
    fs.replace(os.path.join(d, "LATEST"), "1")
    fs.replace(os.path.join(d, "LATEST"), "2")  # pointer swing overwrites
    assert fs.read_text(os.path.join(d, "LATEST")) == "2"
    assert fs.listdir(d) == ["LATEST", "v1.json"]


def test_fs_registry_unknown_scheme(tmpdir_path):
    with pytest.raises(NotImplementedError):
        get_fs("s3://bucket/table")
    register_fs("mem-test", LocalFS)
    assert isinstance(get_fs("mem-test://x"), LocalFS)
