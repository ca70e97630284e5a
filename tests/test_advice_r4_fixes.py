"""Regression tests for the round-4 ADVICE findings: token-slice
disjointness across the signed-64→48-bit contraction, the reference's
negative-incrementBy validation (WritetimeTTL.java:113-117),
SystemExit payload mapping in main(), target-typed null constants
(ConstantColumns.java:126-148), and --counter delete-event rejection."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark import jobs
from cassandra_data_migrator_spark.jobs import main
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.operators.features import (
    build_featureset,
)
from cassandra_data_migrator_spark.operators.filters import (
    normalize_token_bounds,
    token_slice_predicate,
)
from cassandra_data_migrator_spark.sources import write_event_log


def test_complementary_token_slices_are_disjoint(spark):
    """A reference slice pair [min,a] / [a+1,max] must map to ADJACENT
    non-overlapping 48-bit ranges for every a — the floor-only mapping
    sent the shared boundary point to both slices in 65535/65536 cases
    (verified for a=123456789), double-processing its keys; benign for
    idempotent LWW but a double-add for token-sliced --counter loads."""
    smin, smax = -(1 << 63), (1 << 63) - 1
    for a in (123456789, -1, 0, smin, smax - 1, 42 << 16, (42 << 16) - 1):
        _, hi1 = normalize_token_bounds(smin, a)
        lo2, _ = normalize_token_bounds(a + 1, smax)
        assert lo2 == hi1 + 1, f"slices overlap/gap at boundary a={a}"
    # full ring and complementary halves still behave (no regression
    # in the measure-preserving mapping itself)
    assert normalize_token_bounds(smin, smax) == (0, (1 << 48) - 1)
    assert normalize_token_bounds(smin, -1) == (0, (1 << 47) - 1)
    assert normalize_token_bounds(0, smax) == (1 << 47, (1 << 48) - 1)

    # data-level: an awkward three-way split partitions the keyspace
    # with no key lost or processed twice
    df = spark.range(3000).select(
        F.concat(F.lit("k"), F.col("id")).alias("k"))
    cuts = [smin, -(1 << 62) + 12345, 987654321, smax]
    counts = []
    for i in range(3):
        lo = cuts[i] if i == 0 else cuts[i] + 1
        counts.append(df.filter(
            token_slice_predicate("k", lo, cuts[i + 1])).count())
    assert sum(counts) == 3000
    assert all(c > 0 for c in counts)


def test_negative_writetime_increment_rejected():
    """The reference fails validation for incrementBy < 0
    (WritetimeTTL.java:113-117): shifting writetimes backwards silently
    reorders LWW, so the featureset build refuses it."""
    with pytest.raises(ValueError, match="incrementBy"):
        build_featureset({
            "spark.cdm.transform.custom.writetime.incrementBy": "-5"})
    # zero and positive still accepted
    fs = build_featureset({
        "spark.cdm.transform.custom.writetime.incrementBy": "7"})
    assert fs.writetime_increment == 7


def test_main_systemexit_payload_mapping(spark, tmpdir_path, capsys,
                                         monkeypatch):
    """SystemExit payloads may be None (success), an int, or a message
    string — main() must map them the way the interpreter would
    (None→0, int→itself incl. 0, str→printed to stderr + rc 1); the old
    `int(e.code or 1)` turned SystemExit(0) into rc 1 and raised
    TypeError on a string payload."""
    argv = ["runs", "--table", os.path.join(tmpdir_path, "t")]

    def _raiser(payload):
        def fn(args, spark):
            raise SystemExit(payload)
        return fn

    monkeypatch.setattr(jobs, "cmd_runs", _raiser("boom: bad config"))
    assert main(argv, spark=spark) == 1
    assert "boom: bad config" in capsys.readouterr().err

    monkeypatch.setattr(jobs, "cmd_runs", _raiser(None))
    assert main(argv, spark=spark) == 0
    monkeypatch.setattr(jobs, "cmd_runs", _raiser(0))
    assert main(argv, spark=spark) == 0
    monkeypatch.setattr(jobs, "cmd_runs", _raiser(7))
    assert main(argv, spark=spark) == 7


def test_null_constant_binds_target_type(spark, tmpdir_path, capsys):
    """A `null` constant column carries no type of its own; against an
    explicit non-string target DDL it must bind as the TARGET column's
    type (ConstantColumns.java binds null as the target CQL type) —
    previously it was typed string unconditionally and the merge's
    unionByName failed against an int column."""
    import datetime as dt

    rows = [(f"u{i}", dt.datetime(2024, 1, 1, 0, 0, i), f"v{i}",
             "update", i) for i in range(6)]
    df = spark.createDataFrame(
        rows, "user string, ts timestamp, v string, op string, seq long")
    log = os.path.join(tmpdir_path, "nclog")
    write_event_log(df, log, n_chunks=1)
    pf = os.path.join(tmpdir_path, "m.properties")
    with open(pf, "w") as f:
        f.write("spark.cdm.feature.constantColumns.names=flag\n"
                "spark.cdm.feature.constantColumns.values=null\n")
    table = os.path.join(tmpdir_path, "nct")
    rc = main(["migrate", "--log", log, "--table", table,
               "--key-col", "user", "--ts-col", "ts",
               "--schema", "user string, ts timestamp, v string, flag int",
               "--event-schema",
               "user string, ts timestamp, v string, op string, seq long",
               "--properties-file", pf], spark=spark)
    out = capsys.readouterr()
    assert rc == 0, out.err
    t = LakeTable(spark, table)
    assert isinstance(t.schema()["flag"].dataType, T.IntegerType)
    got = t.read().select("user", "flag").collect()
    assert len(got) == 6 and all(r["flag"] is None for r in got)


def test_counter_deletes_ignored_with_warning(spark, tmpdir_path, capsys):
    """--counter has no sound interpretation of a delete event (null
    counters would no-op but their ts bumps max; non-null values would
    be ADDED) — delete events are dropped loudly, not silently summed."""
    import datetime as dt

    rows = [(f"u{i % 3}", dt.datetime(2024, 1, 1, 0, 0, i), 10 + i,
             "update", i) for i in range(9)]
    # poison: deletes carrying non-null counter values that MUST NOT add
    rows += [("u0", dt.datetime(2024, 1, 2), 1000, "delete", 100),
             ("u1", dt.datetime(2024, 1, 2), None, "delete", 101)]
    df = spark.createDataFrame(
        rows, "user string, ts timestamp, cents long, op string, seq long")
    log = os.path.join(tmpdir_path, "cdlog")
    write_event_log(df, log, n_chunks=1)
    table = os.path.join(tmpdir_path, "cdt")
    rc = main(["migrate", "--counter", "--log", log, "--table", table,
               "--key-col", "user", "--ts-col", "ts",
               "--event-schema",
               "user string, ts timestamp, cents long, op string, seq long"],
              spark=spark)
    cap = capsys.readouterr()
    assert rc == 0
    out = json.loads(cap.out.strip().splitlines()[-1])
    assert out["deletes_ignored"] == 2
    assert "delete" in cap.err and "counter" in cap.err
    want = {}
    for i in range(9):
        want[f"u{i % 3}"] = want.get(f"u{i % 3}", 0) + 10 + i
    got = {r["user"]: r["cents"]
           for r in LakeTable(spark, table).read().collect()}
    assert got == want
