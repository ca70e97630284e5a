"""Debezium-envelope CDC source: JSON change events → engine event frame.

Real binlog/WAL tails usually arrive as Debezium-style JSON envelopes
(one per Kafka record / log line)::

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "source": {"lsn": 123, "pos": null, "ts_ms": ...},
                 "op": "c"|"u"|"d"|"r", "ts_ms": 1700000000000}}

This module lowers that envelope onto the engine's event contract
(``op`` ∈ {insert, update, delete}, a total-order ``seq``, the row
image's own columns) as ONE ``from_json`` + one codegen projection —
no UDF, no per-row Python, streaming- and batch-identical.

Semantics (public Debezium contract):

- ``op``: ``c`` (create) and ``r`` (snapshot read) → ``insert``;
  ``u`` → ``update``; ``d`` → ``delete``. LWW treats insert/update
  identically, so the c/r distinction is preserved only as the op
  string.
- row image: ``after`` for c/u/r; ``before`` for d (Debezium deletes
  carry the pre-image — the full row under REPLICA IDENTITY FULL,
  else at least the key, which is all a tombstone needs).
- ``seq``: the first defined of ``source.lsn`` (Postgres WAL),
  ``source.pos`` (MySQL binlog), ``payload.ts_ms`` — a monotone
  tie-break for same-timestamp events, exactly the engine's seq role.
- event time: the image's own ``ts_col`` when the row carries one
  (CDC of a table with an event-time column), else the envelope's
  transaction clock ``timestamp_millis(ts_ms)``.
- Kafka log-compaction tombstones (null value / null payload) and
  envelopes with no usable image are dropped.
- binary columns round-trip as base64 (Spark's JSON ↔ BinaryType
  mapping), so html payloads survive intact.

Reference analog: the migrator's origin is a live Cassandra table, so
it has no wire format to parse (``OriginSelectByPartitionRange
Statement.java`` reads typed rows); a from-scratch CDC engine must own
the envelope decode, and this is its Spark-native shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# envelope source-block fields the projection consults; extra fields in
# real envelopes are ignored by from_json (schema-pruned decode)
_SOURCE_FIELDS = [
    T.StructField("lsn", T.LongType(), True),
    T.StructField("pos", T.LongType(), True),
    T.StructField("ts_ms", T.LongType(), True),
]

# micro-precision timestamp formats: Spark's JSON default keeps only
# milliseconds, which would silently truncate event times (the LWW
# order!) across an envelope round-trip. The optional-fraction parse
# pattern also accepts milli- or second-precision producer output.
_JSON_TS_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
}
_JSON_PARSE_OPTS = {
    "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS][XXX]",
    "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss[.SSSSSS]",
}

def row_schema_from_event_schema(
    event_schema: T.StructType, seq_col: str = "seq", op_col: str = "op",
) -> T.StructType:
    """The before/after image schema implied by an engine event schema:
    the event's own columns minus the envelope-supplied (seq, op)."""
    drop = {seq_col, op_col}
    return T.StructType([f for f in event_schema.fields
                         if f.name not in drop])


def envelope_schema(row_schema: T.StructType,
                    wrapped: bool = True) -> T.StructType:
    """The from_json schema for one envelope. ``wrapped=True`` is the
    Kafka Connect default (``{"schema":..., "payload": {...}}``);
    ``wrapped=False`` matches converters with schemas disabled, where
    before/after/op sit at the JSON root."""
    payload = T.StructType([
        T.StructField("before", row_schema, True),
        T.StructField("after", row_schema, True),
        T.StructField("source", T.StructType(_SOURCE_FIELDS), True),
        T.StructField("op", T.StringType(), True),
        T.StructField("ts_ms", T.LongType(), True),
    ])
    if not wrapped:
        return payload
    return T.StructType([T.StructField("payload", payload, True)])


def debezium_projection(
    lines: DataFrame,
    event_schema: T.StructType,
    ts_col: str | None = None,
    seq_col: str = "seq",
    op_col: str = "op",
    wrapped: bool = True,
    value_col: str = "value",
) -> DataFrame:
    """Lower a frame of envelope JSON strings (``value_col``) onto the
    engine event schema. Pure Catalyst: from_json → CASE op map →
    winner-image select; works identically on batch and streaming
    frames (no stateful op, so the stream stays append-mode)."""
    row_schema = row_schema_from_event_schema(event_schema, seq_col, op_col)
    env = envelope_schema(row_schema, wrapped=wrapped)
    p = F.from_json(F.col(value_col), env, _JSON_PARSE_OPTS)
    if wrapped:
        p = p["payload"]
    op_raw = p["op"]
    op = F.when(op_raw == "d", F.lit("delete")) \
         .when((op_raw == "c") | (op_raw == "r"), F.lit("insert")) \
         .when(op_raw == "u", F.lit("update"))
    image = F.when(op_raw == "d", p["before"]).otherwise(p["after"])
    seq = F.coalesce(p["source"]["lsn"], p["source"]["pos"], p["ts_ms"]) \
           .cast("long")
    cols = []
    for f in event_schema.fields:
        if f.name == seq_col:
            cols.append(seq.alias(seq_col))
        elif f.name == op_col:
            cols.append(op.alias(op_col))
        elif ts_col is not None and f.name == ts_col:
            # image event-time first; transaction clock as fallback
            cols.append(
                F.coalesce(image[f.name].cast(f.dataType),
                           F.timestamp_millis(p["ts_ms"])
                            .cast(f.dataType)).alias(f.name))
        else:
            cols.append(image[f.name].cast(f.dataType).alias(f.name))
    out = lines.select(*cols, image.isNull().alias("_img_null"))
    # drop compaction tombstones / undecodable lines (null payload →
    # null mapped op), image-less envelopes, and imageless op kinds
    # (truncate "t" / message "m" map to null too — no row to apply)
    out = out.filter(F.col(op_col).isNotNull() & ~F.col("_img_null"))
    return out.drop("_img_null")


def read_debezium_log(
    spark: SparkSession, path: str, event_schema: T.StructType,
    ts_col: str | None = None, seq_col: str = "seq", op_col: str = "op",
    wrapped: bool = True,
) -> DataFrame:
    """Batch read of a JSON-lines envelope log (one envelope per line,
    Kafka-connect file-sink shape)."""
    return debezium_projection(
        spark.read.text(path), event_schema, ts_col=ts_col,
        seq_col=seq_col, op_col=op_col, wrapped=wrapped)


def read_debezium_stream(
    spark: SparkSession, path: str, event_schema: T.StructType,
    max_files_per_trigger: int = 2,
    ts_col: str | None = None, seq_col: str = "seq", op_col: str = "op",
    wrapped: bool = True,
) -> DataFrame:
    """Streaming tail of a growing envelope log — same projection over
    the file source; the engine pipeline consumes it unchanged."""
    lines = (spark.readStream
             .option("maxFilesPerTrigger", max_files_per_trigger)
             .text(path))
    return debezium_projection(
        lines, event_schema, ts_col=ts_col,
        seq_col=seq_col, op_col=op_col, wrapped=wrapped)


def events_to_envelopes(
    events: DataFrame,
    seq_col: str = "seq", op_col: str = "op",
    ts_ms: F.Column | None = None,
    wrapped: bool = True,
) -> DataFrame:
    """The inverse (test/export helper): engine events → one envelope
    JSON string per row (column ``value``). Inserts/updates carry the
    row as ``after`` (op c/u), deletes carry it as ``before`` (op d)
    with null ``after`` — the shape a Debezium source connector emits.

    ``ts_ms`` (a Column): the envelope's transaction clock. Default
    NULL — this export has no real transaction clock, and inventing
    one (e.g. from seq) would make the reader's event-time fallback
    stamp null-ts rows with a fake ~1970 time instead of preserving
    the null, so a debezium round-trip would merge rows the other
    formats quarantine. seq still rides source.lsn."""
    data_cols = [c for c in events.columns if c not in (seq_col, op_col)]
    image = F.struct(*[F.col(c) for c in data_cols])
    is_del = F.col(op_col) == "delete"
    op = F.when(is_del, F.lit("d")) \
         .when(F.col(op_col) == "insert", F.lit("c")) \
         .otherwise(F.lit("u"))
    tms = ts_ms if ts_ms is not None else F.lit(None).cast("long")
    payload = F.struct(
        F.when(is_del, image).alias("before"),
        F.when(~is_del, image).alias("after"),
        F.struct(F.col(seq_col).cast("long").alias("lsn"),
                 F.lit(None).cast("long").alias("pos"),
                 tms.cast("long").alias("ts_ms")).alias("source"),
        op.alias("op"),
        tms.cast("long").alias("ts_ms"),
    )
    body = F.struct(payload.alias("payload")) if wrapped else payload
    return events.select(F.to_json(body, _JSON_TS_OPTS).alias("value"))
