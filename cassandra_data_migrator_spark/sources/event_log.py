"""Change-event log on disk: batch + streaming readers, chunked writer.

The on-disk event log plays the role of the reference's *origin
cluster*: the reference scans it in token-range slices
(``cql/statement/OriginSelectByPartitionRangeStatement.java:35-64``);
we either read it whole (batch replay) or tail it with the Structured
Streaming file source (CDC tail), with ``maxFilesPerTrigger`` as the
trigger-size knob replacing the reference's per-worker rate limiter
(``properties/KnownProperties.java:181-184``).

The writer chunks the log into seq-ordered files with increasing
mtimes so the file source discovers them in event order — a stand-in
for a Kafka/binlog tail that keeps replays deterministic.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("seq", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("html", T.BinaryType(), True),
    T.StructField("lang", T.StringType(), True),
])


def write_event_log(events: DataFrame, path: str, n_chunks: int = 8,
                    seq_col: str = "seq", append: bool = False,
                    fmt: str = "parquet") -> list[str]:
    """Write the event log as ``n_chunks`` seq-range files in seq order.

    ``append=True`` adds the chunks as NEW segments after whatever the
    log already holds (a binlog tail growing between checkpointed
    stream runs): existing files keep their mtimes, the new ones get
    strictly later ones, so the file source discovers them in arrival
    order and a checkpoint-resumed stream processes only the new
    segments.

    ``fmt``: ``parquet`` (default), ``json`` (flat JSON-lines; Spark
    maps ``binary`` columns to base64, round-tripping the html payload
    intact), or ``debezium`` (full Debezium envelopes, one per line —
    before/after images, op c/u/d, seq as source.lsn; the export shape
    a foreign CDC consumer ingests, ``sources/debezium.py``).
    """
    before = set(os.listdir(path)) if append and os.path.isdir(path) else set()
    mode = "append" if append else "overwrite"
    chunked = events.repartitionByRange(n_chunks, F.col(seq_col))
    if fmt == "debezium":
        from cassandra_data_migrator_spark.sources.debezium import (
            events_to_envelopes,
        )
        events_to_envelopes(chunked, seq_col=seq_col) \
            .write.mode(mode).text(path)
        ext = ".txt"
    else:
        writer = chunked.write.mode(mode)
        writer.parquet(path) if fmt == "parquet" else writer.json(path)
        ext = f".{fmt}"
    files = sorted(
        fn for fn in os.listdir(path)
        if fn.startswith("part-") and fn.endswith(ext)
        and fn not in before
    )
    # monotone mtimes (file-source discovery order == seq order),
    # strictly after any pre-existing segment
    floor = max((os.path.getmtime(os.path.join(path, fn))
                 for fn in before), default=0.0)
    base = max(time.time() - len(files), floor + 1.0)
    for i, fn in enumerate(files):
        os.utime(os.path.join(path, fn), (base + i, base + i))
    return [os.path.join(path, fn) for fn in files]


def read_event_log(spark: SparkSession, path: str,
                   schema: T.StructType | None = EVENT_SCHEMA,
                   fmt: str = "parquet",
                   ts_col: str | None = None,
                   seq_col: str = "seq",
                   op_col: str = "op") -> DataFrame:
    """Batch read of the whole log. ``schema=None`` infers from the
    parquet footers — the path feature-driven migrations take, where the
    origin shape is the scenario's own (e.g. a map column to explode),
    not the web-event schema. JSON logs require a schema (inference
    would read every file twice and guess binary columns wrong).

    ``fmt="debezium"``: the log is Debezium-envelope JSON lines
    (``sources/debezium.py``); ``schema`` is the ENGINE event schema
    the envelopes lower onto, and ``ts_col`` names the event-time
    column that gets the transaction-clock fallback."""
    if fmt == "debezium":
        from cassandra_data_migrator_spark.sources.debezium import (
            read_debezium_log,
        )
        if schema is None:
            raise ValueError(
                "Debezium logs need the target event schema — "
                "pass --event-schema DDL")
        return read_debezium_log(spark, path, schema, ts_col=ts_col,
                                 seq_col=seq_col, op_col=op_col)
    if fmt == "json":
        if schema is None:
            raise ValueError(
                "JSON event logs need an explicit schema (inference "
                "would scan every file and mistype base64 binary "
                "columns as strings) — pass --event-schema DDL")
        return spark.read.schema(schema).json(path)
    if schema is None:
        return spark.read.parquet(path)
    return spark.read.schema(schema).parquet(path)


def read_event_stream(spark: SparkSession, path: str,
                      max_files_per_trigger: int = 2,
                      schema: T.StructType | None = None,
                      fmt: str = "parquet",
                      ts_col: str | None = None,
                      seq_col: str = "seq",
                      op_col: str = "op") -> DataFrame:
    if fmt == "debezium":
        from cassandra_data_migrator_spark.sources.debezium import (
            read_debezium_stream,
        )
        return read_debezium_stream(
            spark, path, schema or EVENT_SCHEMA,
            max_files_per_trigger=max_files_per_trigger, ts_col=ts_col,
            seq_col=seq_col, op_col=op_col)
    reader = (
        spark.readStream.schema(schema or EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
    )
    return reader.json(path) if fmt == "json" else reader.parquet(path)
