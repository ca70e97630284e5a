"""Feature properties wired through the job CLI — full parity with the
reference regression scenario
``SIT/regression/02_ColumnRenameWithConstantsAndExplode``: a reference
``cdm.properties`` (whitespace separators, quoted identifiers, connect
keys and all) drives rename + explodeMap + constantColumns through
``migrate`` → ``validate`` → break → autocorrect ``fix`` → clean, ending
at the exact table state in the scenario's ``expected.out``."""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.jobs import main, parse_properties
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.operators.features import (
    SURROGATE_KEY_COL,
    build_featureset,
    parse_cql_literal,
    parse_constants,
    parse_rename_map,
)
from cassandra_data_migrator_spark.sources import write_event_log

TS = dt.datetime(2024, 3, 1, tzinfo=dt.timezone.utc)
_US = "\x1f"

# the scenario's origin rows (setup.cql)
FRUIT = {
    "key1": {"apples": 3, "oranges": 5, "bananas": 2, "grapes": 11},
    "key2": {"apples": 4, "oranges": 6, "bananas": 3, "pears": 7},
    "key3": {"apples": 5, "oranges": 7, "bananas": 4, "kiwi": 42},
}

# expected.out: 12 target rows
EXPECTED = sorted(
    ("CUSTOMER", 2023, k, fruit, qty)
    for k, fruits in FRUIT.items() for fruit, qty in fruits.items()
)

# the scenario's migrate.properties AS-IS (whitespace separators,
# quoted identifiers, cluster keys that must warn-pass)
MIGRATE_PROPS = """\
# reference-style properties file
spark.cdm.connect.origin.host                     cdm-sit-cass
spark.cdm.connect.target.host                     cdm-sit-cass

spark.cdm.schema.origin.keyspaceTable             origin."ColumnRenameWithConstantsAndExplode"
spark.cdm.schema.target.keyspaceTable             target.column_rename_with_constants_and_explode
spark.cdm.perfops.numParts                        4

spark.cdm.schema.origin.column.names.to.target    "key-name":key_name

spark.cdm.feature.explodeMap.origin.name          "fruit-map"
spark.cdm.feature.explodeMap.target.name.key      fruit
spark.cdm.feature.explodeMap.target.name.value    fruit_qty

spark.cdm.feature.constantColumns.names           customer,year
spark.cdm.feature.constantColumns.values          'CUSTOMER',2023
"""

FIX_PROPS = MIGRATE_PROPS + """\
spark.cdm.autocorrect.missing                     true
spark.cdm.autocorrect.mismatch                    true
"""


# --------------------------------------------------------------- parsing

def test_parse_properties_whitespace_separator(tmpdir_path):
    pf = os.path.join(tmpdir_path, "m.properties")
    with open(pf, "w") as f:
        f.write(MIGRATE_PROPS)
    props = parse_properties([], pf)
    assert props["spark.cdm.connect.origin.host"] == "cdm-sit-cass"
    assert props["spark.cdm.perfops.numParts"] == "4"
    assert props["spark.cdm.schema.origin.column.names.to.target"] \
        == '"key-name":key_name'
    assert props["spark.cdm.feature.constantColumns.values"] \
        == "'CUSTOMER',2023"
    # '=' separator still works, including '=' inside the value
    with open(pf, "w") as f:
        f.write("spark.cdm.filter.cassandra.whereCondition=lang = 'en'\n")
    assert parse_properties([], pf) == {
        "spark.cdm.filter.cassandra.whereCondition": "lang = 'en'"}


def test_parse_cql_literals():
    assert parse_cql_literal("'CUSTOMER'") == ("CUSTOMER", "string")
    assert parse_cql_literal("'it''s'") == ("it's", "string")
    assert parse_cql_literal("2023") == (2023, "int")
    assert parse_cql_literal(str(2**40)) == (2**40, "bigint")
    assert parse_cql_literal("2.5") == (2.5, "double")
    assert parse_cql_literal("true") == (True, "boolean")
    with pytest.raises(ValueError):
        parse_cql_literal("unquoted")


def test_parse_rename_and_constants():
    assert parse_rename_map('"key-name":key_name, a:b') == {
        "key-name": "key_name", "a": "b"}
    assert parse_constants("customer,year", "'CUSTOMER',2023") == {
        "customer": ("CUSTOMER", "string"), "year": (2023, "int")}
    with pytest.raises(ValueError, match="split into"):
        parse_constants("a,b", "'x'")


def test_build_featureset_extract_json():
    fs = build_featureset({
        "spark.cdm.feature.extractJson.originColumn": "props",
        "spark.cdm.feature.extractJson.propertyMapping": "age:personAge",
        "spark.cdm.feature.extractJson.overwrite": "true",
    })
    assert fs.extract_json == ("props", "age", "personAge", True, False)
    assert fs.target_key_col("url") == "url"
    # explode widens the key to the surrogate
    fs2 = build_featureset({
        "spark.cdm.feature.explodeMap.origin.name": '"fruit-map"',
        "spark.cdm.feature.explodeMap.target.name.key": "fruit",
        "spark.cdm.feature.explodeMap.target.name.value": "fruit_qty",
    })
    assert fs2.target_key_col("key") == SURROGATE_KEY_COL


# ------------------------------------------------------ regression/02 SIT

def _origin_log(spark, tmpdir_path):
    rows = [(k, FRUIT[k], TS, "insert", i + 1)
            for i, k in enumerate(sorted(FRUIT))]
    df = spark.createDataFrame(
        rows, "`key-name` string, `fruit-map` map<string,int>, "
              "warc_ts timestamp, op string, seq long")
    path = os.path.join(tmpdir_path, "origin_log")
    write_event_log(df, path, n_chunks=2)
    return path


def _run(spark, capsys, argv):
    assert main(argv, spark=spark) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def _props_file(tmpdir_path, name, content):
    pf = os.path.join(tmpdir_path, name)
    with open(pf, "w") as f:
        f.write(content)
    return pf


def _target_state(spark, table):
    t = LakeTable(spark, table)
    return sorted(
        (r["customer"], r["year"], r["key_name"], r["fruit"],
         r["fruit_qty"])
        for r in t.read().collect())


def test_regression02_full_cycle(spark, tmpdir_path, capsys):
    log = _origin_log(spark, tmpdir_path)
    table = os.path.join(tmpdir_path, "t")
    mig = _props_file(tmpdir_path, "migrate.properties", MIGRATE_PROPS)
    fix = _props_file(tmpdir_path, "fix.properties", FIX_PROPS)
    base = ["--table", table, "--key-col", "key-name",
            "--properties-file"]

    # migrate: 3 origin rows × 4 map entries → 12 target rows
    out = _run(spark, capsys, ["migrate", "--log", log,
                               "--schema", "infer", *base, mig])
    assert out["mode"] == "batch"
    assert _target_state(spark, table) == EXPECTED
    t = LakeTable(spark, table)
    assert t.key_col == SURROGATE_KEY_COL
    assert t.n_buckets == 4                 # numParts flowed through

    # validate clean (cdm.validateData.assert: 12 valid)
    out = _run(spark, capsys, ["validate", "--log", log, *base, mig])
    assert out == {"job": "validate", "read": 12, "valid": 12,
                   "mismatch": 0, "missing": 0, "extra_target": 0,
                   "error": 0}

    # breakData.cql: delete all key2 rows + key3/kiwi, set
    # key3/oranges qty to 999
    later = TS + dt.timedelta(seconds=60)
    breaks = [(f"key2{_US}{f}", later, "delete", 100 + i, None, None,
               None, None, None)
              for i, f in enumerate(FRUIT["key2"])]
    breaks.append((f"key3{_US}kiwi", later, "delete", 110, None, None,
                   None, None, None))
    breaks.append((f"key3{_US}oranges", later, "update", 111, "key3",
                   "oranges", 999, "CUSTOMER", 2023))
    bdf = spark.createDataFrame(
        breaks, f"{SURROGATE_KEY_COL} string, warc_ts timestamp, "
                "op string, seq long, key_name string, fruit string, "
                "fruit_qty int, customer string, year int")
    t.merge_batch(bdf)
    broken = _target_state(spark, table)
    assert len(broken) == 7 and ("CUSTOMER", 2023, "key3", "oranges",
                                 999) in broken

    # validate reports the damage (cdm.validateData.assert after break)
    out = _run(spark, capsys, ["validate", "--log", log, *base, mig])
    assert out["missing"] == 5 and out["mismatch"] == 1

    # fix.properties: autocorrect (cdm.fixData.assert: 5 missing +
    # 1 mismatch corrected) → table back at expected.out
    out = _run(spark, capsys, ["validate", "--log", log, *base, fix])
    assert out["corrected_missing"] == 5
    assert out["corrected_mismatch"] == 1
    assert _target_state(spark, table) == EXPECTED

    out = _run(spark, capsys, ["validate", "--log", log, *base, mig])
    assert out["valid"] == 12 and out["missing"] == 0
    assert out["mismatch"] == 0


def test_extract_json_via_properties(spark, tmpdir_path, capsys):
    """ExtractJson end-to-end through the CLI (SIT/features analog:
    pluck one JSON property into its own target column)."""
    rows = [(f"u{i}", TS, json.dumps({"age": 20 + i, "city": "x"}),
             "insert", i) for i in range(6)]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, props string, "
              "op string, seq long")
    log = os.path.join(tmpdir_path, "jlog")
    write_event_log(df, log, n_chunks=2)
    table = os.path.join(tmpdir_path, "jt")
    pf = _props_file(tmpdir_path, "j.properties", (
        "spark.cdm.feature.extractJson.originColumn       props\n"
        "spark.cdm.feature.extractJson.propertyMapping    age:person_age\n"
    ))
    out = _run(spark, capsys, [
        "migrate", "--log", log, "--table", table, "--schema", "infer",
        "--properties-file", pf])
    assert out["events_applied"] == 6
    got = {r["url"]: r["person_age"]
           for r in LakeTable(spark, table).read().collect()}
    assert got == {f"u{i}": str(20 + i) for i in range(6)}


def test_streaming_with_features_and_event_schema(spark, tmpdir_path,
                                                  capsys):
    """Feature chain through the STREAMING path: explicit
    --event-schema DDL (file streams can't infer), rename + constants
    applied per micro-batch."""
    rows = [(f"k{i}", TS + dt.timedelta(seconds=i), f"v{i}",
             "insert", i) for i in range(8)]
    df = spark.createDataFrame(
        rows, "`key-name` string, warc_ts timestamp, val string, "
              "op string, seq long")
    log = os.path.join(tmpdir_path, "slog")
    write_event_log(df, log, n_chunks=4)
    table = os.path.join(tmpdir_path, "st")
    pf = _props_file(tmpdir_path, "s.properties", (
        'spark.cdm.schema.origin.column.names.to.target  "key-name":key_name\n'
        "spark.cdm.feature.constantColumns.names         source\n"
        "spark.cdm.feature.constantColumns.values        'cdm'\n"
    ))
    ddl = ("`key-name` string, warc_ts timestamp, val string, "
           "op string, seq long")
    out = _run(spark, capsys, [
        "migrate", "--log", log, "--table", table, "--streaming",
        "--checkpoint", os.path.join(tmpdir_path, "ckpt"),
        "--key-col", "key-name", "--schema", "infer",
        "--event-schema", ddl, "--properties-file", pf])
    assert out["mode"] == "stream" and out["events_applied"] == 8
    got = sorted((r["key_name"], r["val"], r["source"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [(f"k{i}", f"v{i}", "cdm") for i in range(8)]


def test_migrate_rerun_applies_new_events_by_default(spark, tmpdir_path,
                                                     capsys):
    """The batch-migrate re-invocation contract: a second DEFAULT
    invocation on a grown log applies the new events instead of hitting
    the first invocation's epoch fence (fresh stream id per run)."""
    from cassandra_data_migrator_spark.sources import (
        gen_change_events,
        read_event_log,
    )
    ev = gen_change_events(spark, n_urls=60, n_events=300, seed=5)
    log = os.path.join(tmpdir_path, "grow_log")
    write_event_log(ev.filter(F.col("seq") < 150), log, n_chunks=2)
    table = os.path.join(tmpdir_path, "t")

    out1 = _run(spark, capsys, ["migrate", "--log", log,
                                "--table", table])
    assert out1["events_applied"] == 150 and "fenced" not in out1

    # the log grows; a second default invocation must apply the rest
    write_event_log(ev.filter(F.col("seq") >= 150), log, n_chunks=2,
                    append=True)
    out2 = _run(spark, capsys, ["migrate", "--log", log,
                                "--table", table])
    assert "fenced" not in out2
    assert out2["events_applied"] == 300    # full log re-applied (LWW
                                            # idempotent), new rows in

    # explicit --stream-id opts back into cross-invocation fencing
    out3 = _run(spark, capsys, ["migrate", "--log", log,
                                "--table", table, "--stream-id", "fix"])
    out4 = _run(spark, capsys, ["migrate", "--log", log,
                                "--table", table, "--stream-id", "fix"])
    assert "fenced" not in out3 and out4.get("fenced") is True

    # final state equals a one-shot replay of the full log
    ref_dir = os.path.join(tmpdir_path, "ref")
    _run(spark, capsys, ["migrate", "--log", log, "--table", ref_dir])
    a = {r["url"]: (r["warc_ts"], r["text"])
         for r in LakeTable(spark, table).read().collect()}
    b = {r["url"]: (r["warc_ts"], r["text"])
         for r in LakeTable(spark, ref_dir).read().collect()}
    assert a == b


def test_extract_json_exclusive_projection(spark):
    """extractJson.exclusive=true: the target receives only the key,
    the extracted column, and the engine bookkeeping columns
    (cdm-detailed.properties:447-449) — with keep_cols honoring custom
    ts/seq names."""
    fs = build_featureset({
        "spark.cdm.feature.extractJson.originColumn": "props",
        "spark.cdm.feature.extractJson.propertyMapping": "age:person_age",
        "spark.cdm.feature.extractJson.exclusive": "true",
    })
    df = spark.createDataFrame(
        [("k1", TS, '{"age": 7}', "x", "insert", 1)],
        "k string, event_ts timestamp, props string, other string, "
        "op string, sq long")
    out = fs.transform(df, origin_key="k",
                       keep_cols=("op", "sq", "event_ts"))
    assert sorted(out.columns) == ["event_ts", "k", "op", "person_age",
                                   "sq"]
    assert out.first()["person_age"] == "7"


# ------------------------------------------------- CDC deletes + explode

def _explode_props(tmpdir_path):
    pf = os.path.join(tmpdir_path, "explode.properties")
    with open(pf, "w") as f:
        f.write("""
spark.cdm.feature.explodeMap.origin.name          m
spark.cdm.feature.explodeMap.target.name.key      mk
spark.cdm.feature.explodeMap.target.name.value    mv
""")
    return pf


def test_explode_cdc_delete_fanout(spark, tmpdir_path, capsys):
    """A CDC delete addresses the ORIGIN key; the exploded target is
    keyed per (key, map-entry) surrogate — the tombstone must cover
    every surrogate the key owns, including ones introduced in the
    SAME batch (insert+delete of one key in one epoch converges to
    deleted). Before the fan-out, the inner explode dropped delete
    events entirely and deleted keys lived forever."""
    rows = [
        ("k1", {"a": 1, "b": 2}, dt.datetime(2024, 1, 1), "update", 1),
        ("k2", {"c": 3}, dt.datetime(2024, 1, 1), "update", 2),
        # same-batch insert of k3 then delete of k3 (later ts)
        ("k3", {"x": 9}, dt.datetime(2024, 1, 2), "update", 3),
        ("k3", None, dt.datetime(2024, 1, 3), "delete", 4),
        # delete of k1 (later ts)
        ("k1", None, dt.datetime(2024, 1, 4), "delete", 5),
    ]
    ev = spark.createDataFrame(
        rows, "url string, m map<string,int>, warc_ts timestamp, "
              "op string, seq long")
    log = os.path.join(tmpdir_path, "dlog")
    write_event_log(ev, log, n_chunks=1)
    table = os.path.join(tmpdir_path, "dt")
    pf = _explode_props(tmpdir_path)

    assert main(["migrate", "--log", log, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [("k2", "c", 3)]     # k1 and k3 fully deleted

    # validate agrees: origin truth excludes the deleted keys
    assert main(["validate", "--log", log, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] == 1 and out["extra_target"] == 0
    assert out["missing"] == 0

    # a second migrate on a GROWN log: late update of k1 (newer than
    # the tombstones) re-creates its entries; an OLD update of k2's
    # existing surrogate loses LWW
    extra = spark.createDataFrame(
        [("k1", {"z": 7}, dt.datetime(2024, 1, 5), "update", 6),
         ("k2", {"c": 99}, dt.datetime(2023, 12, 1), "update", 7)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    write_event_log(extra, log, n_chunks=1, append=True)
    assert main(["migrate", "--log", log, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [("k1", "z", 7), ("k2", "c", 3)]


def test_exclusive_extract_json_with_explode(spark, tmpdir_path, capsys):
    """extractJson.exclusive + explodeMap: the exclusive projection
    must keep the explode key column the surrogate key is built from
    (previously an unresolved-column crash)."""
    feat = build_featureset({
        "spark.cdm.feature.explodeMap.origin.name": "m",
        "spark.cdm.feature.explodeMap.target.name.key": "mk",
        "spark.cdm.feature.explodeMap.target.name.value": "mv",
        "spark.cdm.feature.extractJson.originColumn": "props",
        "spark.cdm.feature.extractJson.propertyMapping": "k",
        "spark.cdm.feature.extractJson.exclusive": "true",
    })
    df = spark.createDataFrame(
        [("u1", {"a": 1}, '{"k": 5}', dt.datetime(2024, 1, 1),
          "update", 1)],
        "url string, m map<string,int>, props string, "
        "warc_ts timestamp, op string, seq long")
    out = feat.transform(df, origin_key="url",
                         keep_cols=("op", "seq", "warc_ts"),
                         ts_col="warc_ts")
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0][SURROGATE_KEY_COL] == "u1" + _US + "a"
    assert rows[0]["k"] == "5"


def test_explode_entry_accumulation_validates_clean(spark, tmpdir_path,
                                                    capsys):
    """Entries accumulate per surrogate across CDC updates (an update
    whose map lacks an entry does NOT delete it) — and validate's
    origin truth is per-SURROGATE, so a correct target with entries
    from OLDER events validates clean (previously the per-origin-key
    window kept only the latest event and flagged every older entry as
    extra_target)."""
    rows = [
        ("k1", {"a": 1}, dt.datetime(2024, 1, 1), "update", 1),
        ("k1", {"b": 2}, dt.datetime(2024, 1, 2), "update", 2),
        ("k1", {"a": 9}, dt.datetime(2024, 1, 3), "update", 3),  # a: 1→9
    ]
    ev = spark.createDataFrame(
        rows, "url string, m map<string,int>, warc_ts timestamp, "
              "op string, seq long")
    log = os.path.join(tmpdir_path, "alog")
    write_event_log(ev, log, n_chunks=1)
    table = os.path.join(tmpdir_path, "at")
    pf = _explode_props(tmpdir_path)

    assert main(["migrate", "--log", log, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [("k1", "a", 9), ("k1", "b", 2)]

    assert main(["validate", "--log", log, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out == {"job": "validate", "read": 2, "valid": 2,
                   "mismatch": 0, "missing": 0, "extra_target": 0,
                   "error": 0}


def test_explode_delete_fanout_streaming(spark, tmpdir_path, capsys):
    """Delete fan-out through the STREAMING path: the delete arrives in
    a LATER epoch than the inserts, so the fan-out must see the table
    state as of its own epoch (the closure's table handle advances with
    each commit), not the state at stream start."""
    ev1 = spark.createDataFrame(
        [("k1", {"a": 1, "b": 2}, dt.datetime(2024, 1, 1), "update", 1),
         ("k2", {"c": 3}, dt.datetime(2024, 1, 1), "update", 2)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    ev2 = spark.createDataFrame(
        [("k1", None, dt.datetime(2024, 1, 2), "delete", 3)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log = os.path.join(tmpdir_path, "slog")
    write_event_log(ev1, log, n_chunks=1)

    table = os.path.join(tmpdir_path, "st")
    pf = _explode_props(tmpdir_path)
    ddl = ("url string, m map<string,int>, warc_ts timestamp, "
           "op string, seq long")
    argv = ["migrate", "--streaming", "--log", log, "--table", table,
            "--checkpoint", os.path.join(tmpdir_path, "ck"),
            "--properties-file", pf, "--event-schema", ddl]
    assert main(argv, spark=spark) == 0
    capsys.readouterr()
    assert sorted(r["mk"] for r in
                  LakeTable(spark, table).read().collect()) == \
        ["a", "b", "c"]

    # the delete lands in a LATER drain of the same checkpointed
    # stream — the fan-out must see the CURRENT table state (k1's two
    # live surrogates), not the empty state at first stream start
    write_event_log(ev2, log, n_chunks=1, append=True)
    assert main(argv, spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [("k2", "c", 3)]


def test_explode_delete_blocks_late_old_entries(spark, tmpdir_path,
                                                capsys):
    """Durable key-level tombstone: a surrogate first introduced in a
    LATER invocation with a timestamp OLDER than the key's delete must
    stay deleted (the fan-out alone cannot know future surrogates;
    the placeholder tombstone + per-batch guard close the ordering
    edge) — while a NEWER entry still resurrects the key."""
    table = os.path.join(tmpdir_path, "ot")
    pf = _explode_props(tmpdir_path)
    log = os.path.join(tmpdir_path, "olog")

    ev1 = spark.createDataFrame(
        [("k1", {"a": 1}, dt.datetime(2024, 1, 2), "update", 1),
         ("k1", None, dt.datetime(2024, 1, 5), "delete", 2)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    write_event_log(ev1, log, n_chunks=1)
    assert main(["migrate", "--log", log, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    assert LakeTable(spark, table).read().count() == 0

    # a LATER invocation over a log holding ONLY the new events (a
    # same-path append would put the delete back in the batch, where
    # the same-batch fan-out alone would pass this test): an
    # out-of-order OLD entry for a brand-new surrogate (k1,z) plus a
    # genuinely new one (k1,w) — only the DURABLE key tombstone +
    # per-batch guard can block z here
    ev2 = spark.createDataFrame(
        [("k1", {"z": 7}, dt.datetime(2024, 1, 3), "update", 3),   # old
         ("k1", {"w": 9}, dt.datetime(2024, 1, 6), "update", 4)],  # new
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log2 = os.path.join(tmpdir_path, "olog2")
    write_event_log(ev2, log2, n_chunks=1)
    assert main(["migrate", "--log", log2, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [("k1", "w", 9)]     # z stayed deleted, w resurrected


def test_explode_delete_guard_nonstring_key(spark, tmpdir_path, capsys):
    """Same durable-tombstone scenario with a BIGINT origin key: the
    guard's bucket pruning must hash the key's STRING form (the
    surrogate's bucketing), or it reads the wrong buckets and silently
    misses every stored tombstone for non-string keys."""
    table = os.path.join(tmpdir_path, "nt")
    pf = _explode_props(tmpdir_path)

    ev1 = spark.createDataFrame(
        [(5, {"a": 1}, dt.datetime(2024, 1, 2), "update", 1),
         (5, None, dt.datetime(2024, 1, 5), "delete", 2),
         (8, {"q": 4}, dt.datetime(2024, 1, 2), "update", 3)],
        "id bigint, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log1 = os.path.join(tmpdir_path, "nlog1")
    write_event_log(ev1, log1, n_chunks=1)
    assert main(["migrate", "--log", log1, "--table", table,
                 "--key-col", "id", "--properties-file", pf],
                spark=spark) == 0
    capsys.readouterr()

    ev2 = spark.createDataFrame(
        [(5, {"z": 7}, dt.datetime(2024, 1, 3), "update", 4)],  # old
        "id bigint, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log2 = os.path.join(tmpdir_path, "nlog2")
    write_event_log(ev2, log2, n_chunks=1)
    assert main(["migrate", "--log", log2, "--table", table,
                 "--key-col", "id", "--properties-file", pf],
                spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["id"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [(8, "q", 4)]       # key 5 stayed deleted


def test_explode_with_tracked_run(spark, tmpdir_path, capsys):
    """Tracked (resumable) migration of an exploded CDC log: groups
    split on the SURROGATE key, the delete fan-out covers surrogates
    across groups, resume is a fenced no-op, and the final state
    matches a plain batch replay of the same log."""
    rows = [
        ("k1", {"a": 1, "b": 2}, dt.datetime(2024, 1, 1), "update", 1),
        ("k2", {"c": 3}, dt.datetime(2024, 1, 1), "update", 2),
        ("k3", {"d": 4}, dt.datetime(2024, 1, 1), "update", 3),
        ("k1", None, dt.datetime(2024, 1, 2), "delete", 4),
    ]
    ev = spark.createDataFrame(
        rows, "url string, m map<string,int>, warc_ts timestamp, "
              "op string, seq long")
    log = os.path.join(tmpdir_path, "tlog")
    write_event_log(ev, log, n_chunks=1)
    pf = _explode_props(tmpdir_path)

    tracked = os.path.join(tmpdir_path, "tt")
    out = _run(spark, capsys, [
        "migrate", "--log", log, "--table", tracked, "--n-groups", "4",
        "--properties-file", pf,
        "--conf", "spark.cdm.trackRun=true",
        "--conf", "spark.cdm.trackRun.runId=xr1"])
    assert out["mode"] == "tracked"

    plain = os.path.join(tmpdir_path, "tp")
    _run(spark, capsys, ["migrate", "--log", log, "--table", plain,
                         "--properties-file", pf])
    want = sorted((r["url"], r["mk"], r["mv"]) for r in
                  LakeTable(spark, plain).read().collect())
    got = sorted((r["url"], r["mk"], r["mv"]) for r in
                 LakeTable(spark, tracked).read().collect())
    assert got == want == [("k2", "c", 3), ("k3", "d", 4)]

    # resume: everything PASSed already → fenced no-op, same state
    _run(spark, capsys, [
        "migrate", "--log", log, "--table", tracked, "--n-groups", "4",
        "--properties-file", pf,
        "--conf", "spark.cdm.trackRun.previousRunId=xr1"])
    got2 = sorted((r["url"], r["mk"], r["mv"]) for r in
                  LakeTable(spark, tracked).read().collect())
    assert got2 == want


def test_explode_tombstone_survives_maintain(spark, tmpdir_path,
                                             capsys):
    """Key tombstones carry delete semantics for late events and must
    survive compaction + snapshot expiry — after `maintain --compact`,
    a late OLD entry for the deleted key still stays deleted."""
    table = os.path.join(tmpdir_path, "mt2")
    pf = _explode_props(tmpdir_path)
    ev1 = spark.createDataFrame(
        [("k1", {"a": 1}, dt.datetime(2024, 1, 2), "update", 1),
         ("k1", None, dt.datetime(2024, 1, 5), "delete", 2),
         ("k2", {"c": 3}, dt.datetime(2024, 1, 1), "update", 3)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log1 = os.path.join(tmpdir_path, "mlog1")
    write_event_log(ev1, log1, n_chunks=1)
    assert main(["migrate", "--log", log1, "--table", table,
                 "--properties-file", pf], spark=spark) == 0

    out = _run(spark, capsys, ["maintain", "--table", table,
                               "--compact", "--min-files", "1",
                               "--keep-last", "1"])
    assert out["job"] == "maintain"

    ev2 = spark.createDataFrame(
        [("k1", {"z": 7}, dt.datetime(2024, 1, 3), "update", 4)],  # old
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log2 = os.path.join(tmpdir_path, "mlog2")
    write_event_log(ev2, log2, n_chunks=1)
    assert main(["migrate", "--log", log2, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"]) for r in
                 LakeTable(spark, table).read().collect())
    assert got == [("k2", "c", 3)]     # k1 stayed deleted post-compact


def test_explode_fanout_prunes_to_delete_key_buckets(spark, tmpdir_path,
                                                     capsys, monkeypatch):
    """The delete fan-out's live-surrogate lookup must read ONLY the
    delete keys' buckets. Exploded tables bucket on the surrogate's
    ORIGIN-KEY prefix (bucket_prefix_sep), so every surrogate — and the
    bare-key tombstone — of one key shares its bare key's bucket; a
    delete-carrying batch then prunes its lookup to those buckets
    instead of scanning the table (the round-4 100×-scale finding)."""
    from cassandra_data_migrator_spark.functions.hashing import bucket_expr

    n = 64
    rows = [(f"k{i}", {"a": i, "b": i + 1}, dt.datetime(2024, 1, 1),
             "update", i) for i in range(n)]
    ev = spark.createDataFrame(
        rows, "url string, m map<string,int>, warc_ts timestamp, "
              "op string, seq long")
    log1 = os.path.join(tmpdir_path, "plog1")
    write_event_log(ev, log1, n_chunks=1)
    table = os.path.join(tmpdir_path, "pt")
    pf = _explode_props(tmpdir_path)
    assert main(["migrate", "--log", log1, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()

    t = LakeTable(spark, table)
    assert t.bucket_prefix_sep == _US
    # physical co-location: all stored surrogates of one origin key
    # live in one bucket = the bare key's hash bucket
    from cassandra_data_migrator_spark.lake.table import _BUCKET
    per_key = (t.read(include_internal=True)
               .groupBy("url").agg(F.count_distinct(_BUCKET).alias("nb"),
                                   F.first(_BUCKET).alias("b"))
               .collect())
    assert all(r["nb"] == 1 for r in per_key)
    exp = {r["url"]: r["b"] for r in spark.createDataFrame(
        [(f"k{i}",) for i in range(n)], "url string")
        .select("url", bucket_expr("url", t.n_buckets).alias("b"))
        .collect()}
    assert {r["url"]: r["b"] for r in per_key} == exp

    # delete-only batch: EVERY table read during the migrate must be
    # bucket-pruned, and the fan-out lookup restricted to k5's bucket
    calls: list = []
    orig_read = LakeTable.read

    def spy(self, buckets=None, **kw):
        calls.append(None if buckets is None else sorted(buckets))
        return orig_read(self, buckets=buckets, **kw)

    monkeypatch.setattr(LakeTable, "read", spy)
    dlog = os.path.join(tmpdir_path, "plog2")
    write_event_log(spark.createDataFrame(
        [("k5", None, dt.datetime(2024, 1, 2), "delete", 1000)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long"), dlog, n_chunks=1)
    assert main(["migrate", "--log", dlog, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    monkeypatch.setattr(LakeTable, "read", orig_read)

    assert calls, "no table reads recorded"
    assert all(b is not None for b in calls), \
        f"unpruned full-table scan during delete fan-out: {calls}"
    assert all(set(b) <= {exp["k5"]} for b in calls), \
        f"fan-out read outside the delete key's bucket: {calls}"

    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    want = sorted((f"k{i}", mk, mv) for i in range(n) if i != 5
                  for mk, mv in (("a", i), ("b", i + 1)))
    assert got == want


def test_explode_fanout_legacy_surrogate_bucketing(spark, tmpdir_path,
                                                   capsys):
    """Tables created before prefix bucketing (manifest without
    bucket_prefix_sep, bucketed on the FULL surrogate) still converge:
    the fan-out falls back to the unpruned column-pruned scan."""
    from pyspark.sql import types as T

    from cassandra_data_migrator_spark.config import EngineConfig

    table = os.path.join(tmpdir_path, "lt")
    schema = T.StructType.fromDDL(
        "url string, warc_ts timestamp, mk string, mv int, "
        f"`{SURROGATE_KEY_COL}` string")
    LakeTable.create(spark, table, schema,
                     EngineConfig(key_col=SURROGATE_KEY_COL,
                                  ts_col="warc_ts", n_buckets=8))
    assert LakeTable(spark, table).bucket_prefix_sep is None

    pf = _explode_props(tmpdir_path)
    ev = spark.createDataFrame(
        [("k1", {"a": 1, "b": 2}, dt.datetime(2024, 1, 1), "update", 1),
         ("k2", {"c": 3}, dt.datetime(2024, 1, 1), "update", 2),
         ("k1", None, dt.datetime(2024, 1, 2), "delete", 3)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log = os.path.join(tmpdir_path, "llog")
    write_event_log(ev, log, n_chunks=1)
    assert main(["migrate", "--log", log, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [("k2", "c", 3)]

    # late OLD entry for the deleted key stays deleted (guard works on
    # the legacy layout too — bare key IS its own surrogate bucket-wise)
    ev2 = spark.createDataFrame(
        [("k1", {"z": 7}, dt.datetime(2024, 1, 1, 12), "update", 4)],
        "url string, m map<string,int>, warc_ts timestamp, op string, "
        "seq long")
    log2 = os.path.join(tmpdir_path, "llog2")
    write_event_log(ev2, log2, n_chunks=1)
    assert main(["migrate", "--log", log2, "--table", table,
                 "--properties-file", pf], spark=spark) == 0
    capsys.readouterr()
    got = sorted((r["url"], r["mk"], r["mv"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [("k2", "c", 3)]
