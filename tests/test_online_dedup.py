"""Online (first-wins) dedup: declarative form, incremental form,
batching invariance, replay idempotence, and the end-to-end stream.

The load-bearing property: the incremental band-index implementation
computes EXACTLY the keep-set of the one-shot declarative rule ("a doc
is a duplicate iff any strictly-earlier doc shares a band bucket") for
ANY micro-batch cut of the stream — that is what makes the streaming
job deterministic, replay-safe, and DuckDB-oracle-checkable (the
``online_dedup`` entry query value-checks the shared semantics).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.operators import dedup as D
from cassandra_data_migrator_spark.sources.event_log import write_event_log
from cassandra_data_migrator_spark.streaming import (
    run_online_dedup_stream,
)

BASE = [
    "the quick brown fox jumps over the lazy dog again and again today",
    "completely different text about spark dataframes and shuffles here",
    "unrelated third subject entirely with its own words and tokens",
    "a fourth theme of rivers mountains valleys and weather patterns",
]


def _corpus(spark, n=40):
    """Deterministic corpus with planted near-dup chains: doc i is a
    light mutation of BASE[i % 4], so each theme forms a chain of
    near-dups whose FIRST member (smallest doc_id) must survive."""
    rows = []
    for i in range(n):
        base = BASE[i % len(BASE)]
        # every 3rd doc mutates one word — near-dup, not exact
        text = base + (f" variant{i // 8}" if i % 3 == 0 else "")
        rows.append((i + 1, text))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _kept_ids(df):
    return sorted(r["doc_id"] for r in df.select("doc_id").collect())


def test_online_declarative_first_wins(spark):
    docs = _corpus(spark)
    kept = _kept_ids(D.online_dedup_keep(docs, "doc_id", "text"))
    # the four theme openers (doc_ids 1..4) always survive
    assert set(kept) >= {1, 2, 3, 4}
    # every dropped doc has an earlier band-bucket mate: re-derive from
    # the melted bands directly
    bands = D._online_bands(docs, "doc_id", "text", "doc_id")
    opener = bands.groupBy("band_key").agg(F.min("doc_id").alias("first"))
    dup = {r["doc_id"] for r in bands.join(opener, "band_key")
           .filter(F.col("doc_id") > F.col("first"))
           .select("doc_id").distinct().collect()}
    assert sorted(set(range(1, 41)) - dup) == kept


@pytest.mark.parametrize("batch_bounds", [
    [(0, 40)],                                # one batch
    [(0, 13), (13, 26), (26, 40)],            # three uneven batches
    [(i, i + 5) for i in range(0, 40, 5)],    # eight batches
])
def test_incremental_matches_declarative_any_batching(
        spark, tmpdir_path, batch_bounds):
    docs = _corpus(spark)
    want = _kept_ids(D.online_dedup_keep(docs, "doc_id", "text"))
    idx = D.create_band_index(spark, os.path.join(tmpdir_path, "idx"),
                              n_buckets=8)
    got = []
    for eid, (lo, hi) in enumerate(batch_bounds):
        b = docs.filter((F.col("doc_id") > lo) & (F.col("doc_id") <= hi))
        kept = D.incremental_dedup_batch(
            idx, b, "doc_id", "text", "doc_id",
            stream_id="s", epoch_id=eid)
        got.extend(_kept_ids(kept))
    assert sorted(got) == want


def test_incremental_replay_is_idempotent(spark, tmpdir_path):
    docs = _corpus(spark)
    idx = D.create_band_index(spark, os.path.join(tmpdir_path, "idx"),
                              n_buckets=8)
    b1 = docs.filter(F.col("doc_id") <= 20)
    b2 = docs.filter(F.col("doc_id") > 20)
    k1 = _kept_ids(D.incremental_dedup_batch(
        idx, b1, "doc_id", "text", "doc_id", stream_id="s", epoch_id=0))
    # replay epoch 0 against the fenced index: the merge no-ops and the
    # probe recomputes the IDENTICAL keep-set (strict-seq rule — the
    # batch's own buckets in the index do not mark it dup against itself)
    idx2 = LakeTable(spark, idx.path)
    k1_replay = _kept_ids(D.incremental_dedup_batch(
        idx2, b1, "doc_id", "text", "doc_id", stream_id="s", epoch_id=0))
    assert k1_replay == k1
    k2 = _kept_ids(D.incremental_dedup_batch(
        idx2, b2, "doc_id", "text", "doc_id", stream_id="s", epoch_id=1))
    want = _kept_ids(D.online_dedup_keep(docs, "doc_id", "text"))
    assert sorted(k1 + k2) == want


def test_incremental_empty_batch(spark, tmpdir_path):
    docs = _corpus(spark, n=8)
    idx = D.create_band_index(spark, os.path.join(tmpdir_path, "idx"),
                              n_buckets=4)
    empty = docs.filter(F.lit(False))
    kept = D.incremental_dedup_batch(
        idx, empty, "doc_id", "text", "doc_id", stream_id="s", epoch_id=0)
    assert kept.count() == 0


def test_band_index_records_first_opener(spark, tmpdir_path):
    docs = _corpus(spark, n=12)
    idx = D.create_band_index(spark, os.path.join(tmpdir_path, "idx"),
                              n_buckets=4)
    # apply in REVERSE halves: later docs first — first-opener-wins LWW
    # (ts = -seq) must still converge on the global minimum seq
    D.incremental_dedup_batch(
        idx, docs.filter(F.col("doc_id") > 6), "doc_id", "text", "doc_id",
        stream_id="s", epoch_id=0)
    idx = LakeTable(spark, idx.path)
    D.incremental_dedup_batch(
        idx, docs.filter(F.col("doc_id") <= 6), "doc_id", "text", "doc_id",
        stream_id="s", epoch_id=1)
    idx = LakeTable(spark, idx.path)
    stored = {r["band_key"]: (r["first_seq"], r["first_id"])
              for r in idx.read().collect()}
    bands = D._online_bands(docs, "doc_id", "text", "doc_id")
    want = {r["band_key"]: r["m"] for r in bands.groupBy("band_key")
            .agg(F.min("_seq").alias("m")).collect()}
    assert {k: v[0] for k, v in stored.items()} == want
    # provenance: first_id is the opener doc itself
    assert all(int(v[1]) == v[0] for v in stored.values())


def test_incremental_probe_prunes_index_buckets(spark, tmpdir_path,
                                                monkeypatch):
    """The per-batch index probe must read ONLY the buckets the batch's
    band keys hash to — never a full index scan (the index's
    hash-bucket layout IS the probe's pruning structure; at 10^10 docs
    the index is large but each epoch touches a bounded slice)."""
    docs = _corpus(spark, n=24)
    idx = D.create_band_index(spark, os.path.join(tmpdir_path, "idx"),
                              n_buckets=16)
    D.incremental_dedup_batch(
        idx, docs.filter(F.col("doc_id") <= 12), "doc_id", "text",
        "doc_id", stream_id="s", epoch_id=0)
    idx = LakeTable(spark, idx.path)

    batch = docs.filter(F.col("doc_id") > 12)
    want_buckets = {
        r["b"] for r in
        D._online_bands(batch, "doc_id", "text", "doc_id")
        .select(idx.bucket_of(F.col("band_key")).alias("b"))
        .distinct().collect()}

    calls: list = []
    orig_read = LakeTable.read

    def spy(self, buckets=None, **kw):
        calls.append(None if buckets is None else set(buckets))
        return orig_read(self, buckets=buckets, **kw)

    monkeypatch.setattr(LakeTable, "read", spy)
    kept = D.incremental_dedup_batch(
        idx, batch, "doc_id", "text", "doc_id",
        stream_id="s", epoch_id=1)
    kept.count()
    monkeypatch.setattr(LakeTable, "read", orig_read)

    assert calls, "no index reads recorded"
    assert all(b is not None for b in calls), \
        f"unpruned full-index scan during the probe: {calls}"
    assert all(b <= want_buckets for b in calls), \
        f"probe read outside the batch's band buckets: {calls}"


def test_online_dedup_stream_end_to_end(spark, tmpdir_path):
    docs = _corpus(spark)
    want = _kept_ids(D.online_dedup_keep(docs, "doc_id", "text"))

    log_dir = os.path.join(tmpdir_path, "log")
    os.makedirs(log_dir)
    # chunked append-only document log in SEQ ORDER (the stream's
    # arrival-monotone contract): 5 range files → >1 micro-batch at
    # maxFilesPerTrigger=2
    write_event_log(docs, log_dir, n_chunks=5, seq_col="doc_id")

    idx = D.create_band_index(spark, os.path.join(tmpdir_path, "idx"),
                              n_buckets=8)
    out_path = os.path.join(tmpdir_path, "corpus")
    LakeTable.create(
        spark, out_path,
        T.StructType([
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("ingest_seq", T.LongType(), True),
            T.StructField("text", T.StringType(), True),
        ]),
        EngineConfig(n_buckets=8, key_col="doc_id", ts_col="ingest_seq"))

    stream = (spark.readStream
              .schema("doc_id long, text string")
              .option("maxFilesPerTrigger", 2)
              .parquet(log_dir))
    q = run_online_dedup_stream(
        spark, stream, idx.path, out_path,
        checkpoint_dir=os.path.join(tmpdir_path, "ckpt"),
        id_col="doc_id", text_col="text", seq_col="doc_id",
        stream_id="dedup-e2e")
    q.awaitTermination(300)

    got = _kept_ids(LakeTable(spark, out_path).read())
    assert got == want


def test_online_dedup_rejects_non_integral_order(spark, tmpdir_path):
    """A string id used as the arrival order would cast('long') to NULL
    (or crash under ANSI) and silently detect zero duplicates in the
    incremental form while the one-shot still tie-breaks by id — the
    two forms would diverge. Both must fail loudly instead."""
    df = spark.createDataFrame(
        [("doc-1", "alpha beta gamma delta"),
         ("doc-2", "alpha beta gamma delta")],
        "doc_id string, text string")
    with pytest.raises(ValueError, match="order-col"):
        D.online_dedup_keep(df, "doc_id", "text")
    idx = D.create_band_index(spark, os.path.join(tmpdir_path, "bi_s"))
    with pytest.raises(ValueError, match="integral"):
        D.incremental_dedup_batch(idx, df, "doc_id", "text", "doc_id")
    # an explicit integral order column over the same frame works
    ok = D.online_dedup_keep(df.withColumn("arr", F.monotonically_increasing_id()),
                             "doc_id", "text", seq_col="arr")
    assert ok.count() == 1
