"""Debezium-envelope CDC source adapter: op mapping, image selection,
seq/ts fallbacks, tombstone dropping, batch/stream parity, CLI wiring.

The reference reads typed rows from a live Cassandra origin and never
parses a wire format; a from-scratch CDC engine must own the envelope
decode (sources/debezium.py) — these tests pin the public Debezium
contract it implements.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.sources import (
    events_to_envelopes,
    gen_change_events,
    read_debezium_log,
    read_event_log,
    write_event_log,
)
from cassandra_data_migrator_spark.sources.debezium import (
    debezium_projection,
)
from cassandra_data_migrator_spark.sources.event_log import EVENT_SCHEMA

WEB_SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("text", T.StringType(), True),
    T.StructField("lang", T.StringType(), True),
])


def _lines_df(spark, lines):
    return spark.createDataFrame([(ln,) for ln in lines], "value string")


def _env(op, image, lsn=None, pos=None, ts_ms=None, wrapped=True):
    payload = {
        "before": image if op == "d" else None,
        "after": None if op == "d" else image,
        "source": {"lsn": lsn, "pos": pos, "ts_ms": ts_ms},
        "op": op,
        "ts_ms": ts_ms,
    }
    return json.dumps({"payload": payload} if wrapped else payload)


IMG = {"url": "https://a/1", "warc_ts": "2024-01-01T00:00:00Z",
       "lang": "en"}


def test_op_mapping_and_image_selection(spark):
    lines = [
        _env("c", IMG, lsn=1),
        _env("r", {**IMG, "url": "https://a/2"}, lsn=2),
        _env("u", {**IMG, "url": "https://a/3"}, lsn=3),
        _env("d", {**IMG, "url": "https://a/4"}, lsn=4),
    ]
    ev = debezium_projection(_lines_df(spark, lines), EVENT_SCHEMA,
                             ts_col="warc_ts")
    got = {r["url"]: (r["op"], r["seq"]) for r in ev.collect()}
    assert got == {
        "https://a/1": ("insert", 1),
        "https://a/2": ("insert", 2),   # snapshot read = insert
        "https://a/3": ("update", 3),
        "https://a/4": ("delete", 4),   # image from BEFORE
    }


def test_seq_fallback_lsn_pos_tsms(spark):
    lines = [
        _env("c", IMG, lsn=11, pos=99, ts_ms=1),      # lsn wins
        _env("c", {**IMG, "url": "u2"}, pos=22, ts_ms=2),  # pos next
        _env("c", {**IMG, "url": "u3"}, ts_ms=33),    # ts_ms last
    ]
    ev = debezium_projection(_lines_df(spark, lines), EVENT_SCHEMA)
    got = {r["url"]: r["seq"] for r in ev.collect()}
    assert got == {"https://a/1": 11, "u2": 22, "u3": 33}


def test_ts_fallback_to_transaction_clock(spark):
    img = {"url": "u", "lang": "en"}  # no warc_ts in the image
    lines = [_env("c", img, lsn=1, ts_ms=1_700_000_000_000)]
    ev = debezium_projection(_lines_df(spark, lines), EVENT_SCHEMA,
                             ts_col="warc_ts")
    row = ev.collect()[0]
    assert row["warc_ts"] == dt.datetime(2023, 11, 14, 22, 13, 20)
    # without ts_col declared there is no fallback: ts stays null
    ev2 = debezium_projection(_lines_df(spark, lines), EVENT_SCHEMA)
    assert ev2.collect()[0]["warc_ts"] is None


def test_drops_tombstones_and_imageless_ops(spark):
    lines = [
        "null",                                   # compaction tombstone
        json.dumps({"payload": None}),            # null payload
        "{not json",                              # undecodable
        _env("t", None, lsn=5),                   # truncate: no image
        json.dumps({"payload": {"op": "c", "after": None,
                                "before": None, "ts_ms": 9}}),  # imageless
        _env("c", IMG, lsn=7),                    # the one survivor
    ]
    ev = debezium_projection(_lines_df(spark, lines), EVENT_SCHEMA)
    assert [r["seq"] for r in ev.collect()] == [7]


def test_unwrapped_envelopes(spark):
    lines = [_env("u", IMG, lsn=3, wrapped=False)]
    ev = debezium_projection(_lines_df(spark, lines), EVENT_SCHEMA,
                             wrapped=False)
    assert [(r["op"], r["seq"]) for r in ev.collect()] == [("update", 3)]


def test_roundtrip_replay_equals_direct_replay(spark, tmpdir_path):
    """events → envelopes (text log) → adapter → merge must reach the
    SAME final state as merging the original events — including html
    (binary/base64 round-trip), deletes, and late events."""
    events = gen_change_events(spark, n_urls=80, n_events=400, seed=23)

    direct = LakeTable.create(
        spark, os.path.join(tmpdir_path, "direct"), WEB_SCHEMA,
        EngineConfig(n_buckets=8))
    direct.merge_batch(events)

    log = os.path.join(tmpdir_path, "dbz")
    files = write_event_log(events, log, n_chunks=4, fmt="debezium")
    assert files and all(f.endswith(".txt") for f in files)
    ev = read_debezium_log(spark, log, EVENT_SCHEMA, ts_col="warc_ts")
    via = LakeTable.create(
        spark, os.path.join(tmpdir_path, "via"), WEB_SCHEMA,
        EngineConfig(n_buckets=8))
    via.merge_batch(ev)

    def snap(t):
        return {r["url"]: (r["warc_ts"], r["html"], r["lang"])
                for r in t.read().collect()}

    assert snap(via) == snap(direct)
    # and the generic reader dispatches the format
    ev2 = read_event_log(spark, log, EVENT_SCHEMA, fmt="debezium",
                         ts_col="warc_ts")
    assert ev2.count() == ev.count()


def test_streaming_debezium_tail_equals_batch(spark, tmpdir_path):
    from cassandra_data_migrator_spark.streaming import CdcPipeline

    events = gen_change_events(spark, n_urls=60, n_events=300, seed=29)
    log = os.path.join(tmpdir_path, "dbz")
    write_event_log(events, log, n_chunks=3, fmt="debezium")

    batch = LakeTable.create(
        spark, os.path.join(tmpdir_path, "b"), WEB_SCHEMA,
        EngineConfig(n_buckets=8))
    CdcPipeline(spark, batch, stream_id="b").run_batch(
        read_debezium_log(spark, log, EVENT_SCHEMA, ts_col="warc_ts"))

    stream = LakeTable.create(
        spark, os.path.join(tmpdir_path, "s"), WEB_SCHEMA,
        EngineConfig(n_buckets=8))
    p = CdcPipeline(spark, stream, stream_id="s")
    q = p.run_stream(log, os.path.join(tmpdir_path, "ckpt"),
                     max_files_per_trigger=1, log_format="debezium")
    q.awaitTermination(300)

    def snap(t):
        return {r["url"]: (r["warc_ts"], r["text"], r["lang"])
                for r in t.read().collect()}

    assert snap(stream) == snap(batch) and snap(batch)


def test_migrate_cli_debezium_log(spark, tmpdir_path, capsys):
    from cassandra_data_migrator_spark.jobs import main

    def run(argv):
        assert main(argv, spark=spark) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    events = gen_change_events(spark, n_urls=50, n_events=250, seed=31)
    log = os.path.join(tmpdir_path, "dbz")
    write_event_log(events, log, n_chunks=2, fmt="debezium")
    table = os.path.join(tmpdir_path, "t")
    ddl = ("seq long, op string, url string, warc_ts timestamp, "
           "html binary, lang string")
    out = run(["migrate", "--log", log, "--table", table,
               "--log-format", "debezium", "--event-schema", ddl])
    assert out["events_applied"] == 250
    v = run(["validate", "--log", log, "--table", table,
             "--log-format", "debezium", "--event-schema", ddl])
    assert v["mismatch"] == 0 and v["missing"] == 0

    # without --event-schema the default web event schema applies
    # (same contract as --log-format json); only an explicit
    # --event-schema infer is refused for envelope logs
    out2 = run(["migrate", "--log", log, "--table",
                os.path.join(tmpdir_path, "t2"),
                "--log-format", "debezium"])
    assert out2["events_applied"] == 250
    assert main(["migrate", "--log", log, "--table",
                 os.path.join(tmpdir_path, "t3"),
                 "--log-format", "debezium",
                 "--event-schema", "infer"], spark=spark) == 2


def test_envelope_export_shape(spark):
    """events_to_envelopes emits the connector shape: deletes carry the
    row as BEFORE with null after, op letters match, lsn = seq."""
    events = spark.createDataFrame(
        [(5, "delete", "u", dt.datetime(2024, 1, 1), "en"),
         (6, "insert", "v", dt.datetime(2024, 1, 2), "de")],
        "seq long, op string, url string, warc_ts timestamp, lang string")
    lines = [json.loads(r["value"])
             for r in events_to_envelopes(events).collect()]
    by_op = {l["payload"]["op"]: l["payload"] for l in lines}
    assert by_op["d"]["before"]["url"] == "u"
    assert "after" not in by_op["d"] or by_op["d"]["after"] is None
    assert by_op["c"]["after"]["url"] == "v"
    assert by_op["d"]["source"]["lsn"] == 5


def test_changes_as_events_debezium_export_roundtrip(
        spark, tmpdir_path, capsys):
    """`changes --as-events --log-format debezium` exports a table's
    changelog as envelope lines that a plain `migrate --log-format
    debezium` ingests into an equal replica — the foreign-consumer
    hand-off path."""
    from cassandra_data_migrator_spark.jobs import main
    from cassandra_data_migrator_spark.lake import LakeTable

    def run(argv):
        assert main(argv, spark=spark) == 0
        return json.loads(capsys.readouterr().out.strip().splitlines()[-1])

    events = gen_change_events(spark, n_urls=40, n_events=200, seed=37)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(events, log, n_chunks=2)
    src = os.path.join(tmpdir_path, "src")
    run(["migrate", "--log", log, "--table", src])

    exp = os.path.join(tmpdir_path, "dbz_export")
    out = run(["changes", "--table", src, "--from-version", "1",
               "--as-events", "--output", exp,
               "--log-format", "debezium"])
    assert out["format"] == "debezium" and out["segments"] >= 1

    dst = os.path.join(tmpdir_path, "dst")
    ddl = ("seq long, op string, url string, warc_ts timestamp, "
           "html binary, text string, lang string")
    run(["migrate", "--log", exp, "--table", dst,
         "--log-format", "debezium", "--event-schema", ddl])

    def snap(p):
        t = LakeTable(spark, p)
        return {r["url"]: (r["warc_ts"], r["html"], r["lang"])
                for r in t.read().collect()}

    assert snap(dst) == snap(src) and snap(src)
