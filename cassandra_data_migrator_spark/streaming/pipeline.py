"""The CDC pipeline: change-event stream → filters → transforms → MERGE.

Reference lifecycle being reproduced (SURVEY.md §3.1): the Migrate job's
per-token-range loop — scan, filter, transform, batched upsert, per-range
run-state + counters (``job/CopyJobSession.java:68-139``) — becomes a
Structured Streaming query:

    readStream(event log) → foreachBatch:
        split (valid / skipped / quarantined)        [F3-F5]
        salted repartition (hot-domain skew)          [north_rule]
        vectorized transforms (html→text, lang)       [pandas UDFs]
        LakeTable.merge_batch (LWW + tombstones)      [S4/S5/J3]
        lineage + counters append                     [S7/A2]

Exactly-once: Spark's checkpoint gives at-least-once foreachBatch
delivery; the lake table's epoch fence (``LakeTable.merge_batch``
stream_id/epoch_id) turns redelivery into a no-op, and each merge is one
atomic manifest commit — together: exactly-once table state. Replaying
from ANY checkpoint (or from scratch) converges to the same final state
because the merge is idempotent under LWW (reference rerun-idempotence
claim, ``README.md:117-126``).

Scale: the only per-epoch driver work is the bucket list and manifest
write; all row work is distributed. Trigger size (maxFilesPerTrigger)
replaces the reference's per-worker rate limiter
(``properties/KnownProperties.java:181-184``).
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.functions.hashing import (
    salted_partition_exprs,
)
from cassandra_data_migrator_spark.functions.udfs import extract_text, normalize_lang
from cassandra_data_migrator_spark.lake.table import (
    LakeTable,
    MergeResult,
    retry_on_conflict,
)
from cassandra_data_migrator_spark.operators.filters import (
    split_events,
    split_predicates,
)
from cassandra_data_migrator_spark.sources.event_log import read_event_stream

LINEAGE_SCHEMA = (
    "epoch_id long, bucket int, live_rows long, rows_with_tombstones long, "
    "checksum long, min_seq long, max_seq long, events long, "
    "version int, stream_id string"
)
COUNTERS_SCHEMA = (
    "epoch_id long, read long, valid long, skipped long, quarantined long, "
    "events_applied long, buckets int, stream_id string"
)


def _arrow_schemas():
    import pyarrow as pa
    lineage = pa.schema([
        ("epoch_id", pa.int64()), ("bucket", pa.int32()),
        ("live_rows", pa.int64()), ("rows_with_tombstones", pa.int64()),
        ("checksum", pa.int64()), ("min_seq", pa.int64()),
        ("max_seq", pa.int64()), ("events", pa.int64()),
        ("version", pa.int32()), ("stream_id", pa.string()),
    ])
    counters = pa.schema([
        ("epoch_id", pa.int64()), ("read", pa.int64()),
        ("valid", pa.int64()), ("skipped", pa.int64()),
        ("quarantined", pa.int64()), ("events_applied", pa.int64()),
        ("buckets", pa.int32()), ("stream_id", pa.string()),
    ])
    return lineage, counters


_LINEAGE_ARROW, _COUNTERS_ARROW = _arrow_schemas()


def _append_parquet(fs, path: str, rows: list[dict], schema,
                    file_key: str | None = None) -> None:
    """Driver-side parquet append of a tiny row list (no Spark job),
    routed through the table's FS seam (``fs.write_bytes`` = one object
    PUT — works identically on local disk and object stores).

    When ``file_key`` is given (e.g. ``"<stream_id>-<epoch_id>"``) the
    file name is deterministic and an existing file is overwritten —
    making the append idempotent under checkpoint redelivery of the
    same epoch.
    """
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq
    name = file_key if file_key is not None else uuid.uuid4().hex
    table = pa.Table.from_pylist(rows, schema=schema)
    sink = pa.BufferOutputStream()
    pq.write_table(table, sink)
    fs.write_bytes(os.path.join(path, f"part-{name}.parquet"),
                   sink.getvalue().to_pybytes())


class CdcPipeline:
    """Applies a change-event stream/log to a LakeTable."""

    def __init__(
        self,
        spark: SparkSession,
        table: LakeTable,
        config: EngineConfig | None = None,
        stream_id: str = "cdc",
        unset_nulls: bool = False,
        transform: Callable[[DataFrame], DataFrame] | None = None,
        salt_transform_stage: bool = True,
        lazy_extract: bool = True,
        event_schema=None,
        redact_cols: tuple[str, ...] = (),
    ):
        self.spark = spark
        self.table = table
        self.config = config or EngineConfig(n_buckets=table.n_buckets)
        self.stream_id = stream_id
        self.unset_nulls = unset_nulls
        # observability: epochs that lost a manifest race (to table
        # maintenance or a rival writer) and converged via reload+retry
        self.conflict_retries = 0
        self.transform = transform
        self.salt_transform_stage = salt_transform_stage
        # PII redaction (functions/pii.py) rides the winner-side scalar
        # stage next to text extraction: pure + idempotent codegen, so
        # redacting the merged winner once is byte-identical to
        # redacting every change event — and for the DERIVED text
        # column (filled from html post-merge) winner-side is the only
        # point where there is text to redact at all
        self.redact_cols = tuple(redact_cols)
        # lazy_extract: run the Arrow html→text extraction on the merged
        # LWW WINNERS (once per surviving key) instead of on every
        # change event pre-merge. At K events/key/epoch this divides the
        # dominant UDF cost by K and keeps the derived text column out
        # of the merge shuffle. extract_text is pure+deterministic, so
        # winner-side extraction is byte-identical to pre-merge
        # extraction (the north-rule per-url invariant). Side effects:
        # - incompatible with unset_nulls (a src row's null text must
        #   mean "explicitly unset", not "not yet derived") → disabled;
        # - the pre-merge salted repartition becomes moot: the UDF now
        #   runs on one row per key (winner set — skew-free by
        #   construction), so there is no hot-domain CPU stage left to
        #   level and the salt shuffle would be pure cost.
        self.lazy_extract = lazy_extract and not unset_nulls
        self.event_schema = event_schema  # None → sources.event_log.EVENT_SCHEMA
        # run-details side tables (reference cdm_run_details analog,
        # cql/statement/TargetUpsertRunDetailsStatement.java:63-84)
        self.lineage_path = os.path.join(table.path, "_run", "lineage")
        self.counters_path = os.path.join(table.path, "_run", "counters")
        self.skipped_path = os.path.join(table.path, "_run", "skipped")
        self.quarantine_path = os.path.join(table.path, "_run", "quarantine")

    # ------------------------------------------------------------ core

    def _prepare(self, events: DataFrame,
                 epoch_id: int = 0) -> tuple[DataFrame, int, int]:
        """Filters + vectorized transforms; returns (batch, n_skip, n_quar)."""
        valid, skipped, quarantined = split_events(events, self.config)

        n_skip = self._side_sink(skipped, self.skipped_path, epoch_id)
        n_quar = self._side_sink(quarantined, self.quarantine_path, epoch_id)

        batch = valid
        if self.salt_transform_stage and not self.lazy_extract:
            # break hot-domain skew BEFORE the expensive Python UDF stage:
            # rows are independent here, so a salted repartition levels
            # Arrow batch work across tasks even if one domain dominates.
            # The partition count is explicit — AQE would coalesce this
            # shuffle by byte size and starve the CPU-bound Arrow stage
            # (UDF cost is invisible to AQE's size-based coalescing).
            n_tasks = max(self.spark.sparkContext.defaultParallelism * 2, 16)
            batch = batch.repartition(
                n_tasks,
                *salted_partition_exprs(self.config.key_col,
                                        self.config.n_buckets,
                                        self.config.salt_buckets)
            )
        if not self.lazy_extract:
            if "html" in batch.columns and "text" not in batch.columns:
                batch = batch.withColumn("text", extract_text(F.col("html")))
            if "lang" in batch.columns:
                batch = batch.withColumn("lang",
                                         normalize_lang(F.col("lang")))
            batch = self._redact(batch)
        if self.transform is not None:
            batch = self.transform(batch)
        return batch, n_skip, n_quar

    def _redact(self, df: DataFrame) -> DataFrame:
        """PII scrub of the configured columns (no-op when unset or
        the column is absent). Idempotent — safe to hit a row via both
        the eager pre-merge path and a later finalize re-run."""
        if self.redact_cols:
            from cassandra_data_migrator_spark.functions.pii import (
                redact_pii_expr,
            )
            for c in self.redact_cols:
                if c in df.columns:
                    df = df.withColumn(c, redact_pii_expr(c))
        return df

    def _finalize(self, merged: DataFrame) -> DataFrame:
        """Winner-side transforms (see ``lazy_extract``): fill text for
        rows that arrived without it, normalize the lang tag. Both are
        pure + idempotent, so re-running them on a stored winner yields
        the identical value. Keeping EVERY pandas UDF out of the
        pre-merge path matters beyond the row-count cut: an
        ArrowEvalPython node in the scan stage breaks whole-stage
        codegen and materializes all pass-through columns (the fat html
        payload included) around the Python boundary for every source
        row; winner-side, the one fused Arrow node touches each
        surviving row once."""
        cols = set(merged.columns)
        if "html" in cols and "text" in cols:
            merged = merged.withColumn(
                "text", F.coalesce(F.col("text"),
                                   extract_text(F.col("html"))))
        if "lang" in cols:
            merged = merged.withColumn("lang",
                                       normalize_lang(F.col("lang")))
        return self._redact(merged)

    def _side_sink(self, df: DataFrame, path: str, epoch_id: int) -> int:
        """Persist rejected rows for this epoch; returns their count.

        DATA-plane I/O by design: rejected rows can be arbitrarily many,
        so they are written and counted by Spark itself (any
        Hadoop-visible URI — local, s3a, gs), not the driver-side
        metadata seam. Only bounded driver-side bookkeeping (lineage,
        counters, run_details, manifests) routes through ``table.fs``.

        Exactly ONE pass over the reject predicate's (column-pruned)
        scan: write unconditionally, then count from the parquet footers
        of the just-written directory — a metadata-only read. (A
        take(1) pre-probe costs a full extra scan precisely when
        nothing is rejected, the common case; a statically-empty reject
        side — e.g. no filters configured — constant-folds to an empty
        write, no scan at all.) Overwrite keeps checkpoint redelivery
        of the epoch idempotent.
        """
        target = os.path.join(path, f"epoch={epoch_id}")
        df.write.mode("overwrite").parquet(target)
        return self.spark.read.parquet(target).count()

    def _prepare_probed(
        self, events: DataFrame, epoch_id: int
    ) -> tuple[DataFrame, tuple[list[int], dict[int, dict]], int, int,
               DataFrame | None]:
        """Single-job variant of :meth:`_prepare`: ONE aggregation over
        the status-tagged batch yields the reject counts, the merge's
        per-bucket probe offsets, AND the LWW winner version per key
        (the merge's pre-reduction input) together — one thin scan of
        the source where the probe agg and the winner-key agg used to
        scan it separately, and 3 driver jobs per epoch instead of ~6
        (the fixed per-epoch job-gap tail is the last Amdahl term once
        row work is distributed). The per-key rollup is cached (tiny:
        one ~40 B row per distinct (status, key)); the bucket-level
        offsets re-aggregate it without touching the source, and the
        merge's broadcast join-back reads the same cache. Reject ROWS
        are only materialized when their counts are non-zero (the rare
        path). Requires row-preserving config (no custom ``transform``).

        Returns ``(batch, probed, n_skip, n_quar, perkey)`` — the
        caller owns unpersisting ``perkey`` after the merge."""
        out, keep, valid_keys = split_predicates(events, self.config)
        tag = out.withColumn(
            "_status",
            F.when(~valid_keys, F.lit("quarantined"))
             .when(~keep, F.lit("skipped")).otherwise(F.lit("valid")))
        seq = (F.col(self.config.seq_col).cast("long")
               if self.config.seq_col in tag.columns
               else F.lit(None).cast("long"))
        # winner version struct — MUST mirror merge_batch's internal
        # pre-reduction exactly: (ts, coalesce(seq :: long, -2^63)) max
        neg = F.lit(-(2 ** 63))
        perkey = (
            tag.groupBy(
                "_status",
                F.col(self.config.key_col).alias("_k"),
                self.table.bucket_of(self.config.key_col).alias("_b"))
            .agg(F.max(F.struct(
                     F.col(self.config.ts_col).alias("_t"),
                     F.coalesce(seq, neg).alias("_s"))).alias("_w"),
                 F.min(seq).alias("mn"), F.max(seq).alias("mx"),
                 F.count("*").alias("n"))
            .persist())
        stats = (
            perkey.groupBy("_status", "_b")
            .agg(F.min("mn").alias("mn"), F.max("mx").alias("mx"),
                 F.sum("n").alias("n"))
            .collect())
        offsets = {r["_b"]: {"min_seq": r["mn"], "max_seq": r["mx"],
                             "events": int(r["n"])}
                   for r in stats if r["_status"] == "valid"}
        n_skip = sum(int(r["n"]) for r in stats if r["_status"] == "skipped")
        n_quar = sum(int(r["n"])
                     for r in stats if r["_status"] == "quarantined")
        if n_skip:
            self._side_sink(tag.filter(F.col("_status") == "skipped")
                            .drop("_status"), self.skipped_path, epoch_id)
        if n_quar:
            self._side_sink(tag.filter(F.col("_status") == "quarantined")
                            .drop("_status"), self.quarantine_path, epoch_id)
        batch = tag.filter(F.col("_status") == "valid").drop("_status")
        if self.salt_transform_stage and not self.lazy_extract:
            # mirror _prepare: level hot-domain skew before the eager
            # Arrow extraction (same rationale/partition count as there)
            n_tasks = max(self.spark.sparkContext.defaultParallelism * 2, 16)
            batch = batch.repartition(
                n_tasks,
                *salted_partition_exprs(self.config.key_col,
                                        self.config.n_buckets,
                                        self.config.salt_buckets)
            )
        if not self.lazy_extract:
            if "html" in batch.columns and "text" not in batch.columns:
                batch = batch.withColumn("text", extract_text(F.col("html")))
            if "lang" in batch.columns:
                batch = batch.withColumn("lang",
                                         normalize_lang(F.col("lang")))
        return batch, (sorted(offsets), offsets), n_skip, n_quar, perkey

    def apply_batch(self, events: DataFrame, epoch_id: int) -> MergeResult:
        """One micro-batch: the foreachBatch body (also callable directly
        for batch replays)."""
        probed = None
        perkey = None
        prereduced = None
        if self.transform is None:
            # combined path: probe + reject counts + winner versions in
            # one job
            batch, probed, n_skip, n_quar, perkey = self._prepare_probed(
                events, epoch_id)
            n_valid = sum(o["events"] or 0 for o in probed[1].values())
            # hand the merge its pre-reduction input only when its own
            # gate would engage (merge re-checks; this avoids caching a
            # frame the merge would ignore)
            if (self.config.lww_prereduce_max_events and not self.unset_nulls
                    and 0 < n_valid
                    <= self.config.lww_prereduce_max_events):
                prereduced = (perkey
                              .filter(F.col("_status") == "valid")
                              .select("_k", "_w"))
        else:
            # a custom transform may drop/add rows, so the pre-computed
            # offsets would lie — fall back to the per-sink path
            batch, n_skip, n_quar = self._prepare(events, epoch_id)
        # no persist of the batch itself: the probe pass prunes to thin
        # columns, so the Arrow UDF transform columns are computed
        # exactly once — in the merge's write traversal. Caching the
        # full transformed batch would materialize the whole payload
        # (html+text) per epoch for no saved work.
        try:
            # a rival commit under this epoch's feet — the normal cause
            # is table MAINTENANCE (compact / expire) racing the live
            # tail, which never changes row state — reloads the manifest
            # and re-merges via the shared retry_on_conflict loop: LWW
            # idempotence makes the re-apply safe, the fence still skips
            # a twin of this very (stream, epoch), and the dead
            # attempt's data files are orphans for expire_versions.
            def _reload() -> None:
                self.conflict_retries += 1
                self.table._load_latest()

            result = retry_on_conflict(
                lambda: self.table.merge_batch(
                    batch,
                    seq_col=self.config.seq_col,
                    stream_id=self.stream_id,
                    epoch_id=epoch_id,
                    unset_nulls=self.unset_nulls,
                    finalize=self._finalize if self.lazy_extract
                    else None,
                    probed=probed,
                    prereduce_max_events=self.config
                    .lww_prereduce_max_events,
                    prereduced=prereduced,
                ),
                _reload, attempts=4)
        finally:
            if perkey is not None:
                perkey.unpersist()
        if not result.skipped:
            self._record(result, epoch_id, n_skip, n_quar)
            self._maybe_compact_deltas()
        return result

    def _maybe_compact_deltas(self) -> None:
        """Inline MoR maintenance (``EngineConfig.mor_compact_min_
        deltas``): fold buckets whose unfolded-delta depth reached the
        threshold, right after the epoch that pushed them there. The
        check is manifest-only; the fold rewrites exactly the hot
        buckets (row state unchanged — compaction is a no-op on LWW
        state by contract), under the same conflict-retry loop as the
        merge so a racing maintainer loses cleanly."""
        thresh = self.config.mor_compact_min_deltas
        if not thresh:
            return
        hot = [b for b, n in self.table.delta_file_counts().items()
               if n >= thresh]
        if not hot:
            return

        def _reload() -> None:
            self.conflict_retries += 1
            self.table._load_latest()

        retry_on_conflict(
            lambda: self.table.compact(buckets=hot), _reload, attempts=4)

    def _record(self, result: MergeResult, epoch_id: int,
                n_skip: int, n_quar: int) -> None:
        """Append lineage + counter rows for this epoch.

        Written driver-side via pyarrow (a handful of rows): launching a
        Spark job per tiny side-table write costs several seconds per
        epoch at high core counts for no distributed work.
        """
        rows = [
            {"epoch_id": epoch_id, "bucket": r["_bucket"],
             "live_rows": r["live_rows"],
             "rows_with_tombstones": r["rows_with_tombstones"],
             "checksum": r["checksum"],
             "min_seq": r.get("min_seq"), "max_seq": r.get("max_seq"),
             "events": r.get("events"), "version": result.version,
             "stream_id": self.stream_id}
            for r in result.lineage
        ]
        key = f"{self.stream_id}-{epoch_id}"
        if rows:
            _append_parquet(self.table.fs, self.lineage_path, rows,
                            _LINEAGE_ARROW, file_key=key)
        c = result.counters or {}
        _append_parquet(self.table.fs, self.counters_path, [{
            "epoch_id": epoch_id,
            "read": c.get("events", 0) + n_skip + n_quar,
            "valid": c.get("events", 0), "skipped": n_skip,
            "quarantined": n_quar,
            "events_applied": c.get("events", 0),
            "buckets": c.get("buckets", 0), "stream_id": self.stream_id,
        }], _COUNTERS_ARROW, file_key=key)

    # ------------------------------------------------------- entrypoints

    def run_batch(self, events: DataFrame, epoch_id: int = 0) -> MergeResult:
        """One-shot batch replay (reference Migrate over a static origin)."""
        return self.apply_batch(events, epoch_id)

    def run_stream(
        self,
        log_path: str,
        checkpoint_dir: str,
        max_files_per_trigger: int | None = None,
        available_now: bool = True,
        processing_time: str | None = None,
        log_format: str = "parquet",
    ) -> StreamingQuery:
        """Tail the event log; exactly-once via checkpoint + epoch fence.

        ``available_now=True`` drains everything currently in the log and
        stops (deterministic for tests/bench); ``False`` keeps tailing —
        as fast as batches arrive by default, or on a fixed cadence with
        ``processing_time`` (e.g. ``"30 seconds"``; the paced analog of
        the reference's rate limiter for a long-lived tail, amortizing
        per-epoch commit overhead when the log grows slowly).
        """
        mft = max_files_per_trigger or self.config.max_files_per_trigger
        stream = read_event_stream(self.spark, log_path, mft,
                                   schema=self.event_schema,
                                   fmt=log_format,
                                   ts_col=self.config.ts_col,
                                   seq_col=self.config.seq_col)
        writer = (
            stream.writeStream
            .foreachBatch(lambda df, eid: self.apply_batch(df, eid))
            .option("checkpointLocation", checkpoint_dir)
            .queryName(self.stream_id)
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        elif processing_time:
            writer = writer.trigger(processingTime=processing_time)
        return writer.start()

    # --------------------------------------------------------- queries

    def lineage(self) -> DataFrame:
        return self._side_table(self.lineage_path, LINEAGE_SCHEMA)

    def counters(self) -> DataFrame:
        return self._side_table(self.counters_path, COUNTERS_SCHEMA)

    def _side_table(self, path: str, schema) -> DataFrame:
        """Side-table read that treats a never-written table as EMPTY
        (schema-typed) instead of PATH_NOT_FOUND: a run over an empty /
        already-drained log records zero epochs, and its rollup must
        still produce a zero-total ENDED row."""
        if not self.table.fs.isdir(path):
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(path)
