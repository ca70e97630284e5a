"""Round-5 SIT parity: the four reference scenarios not yet mirrored
by name — SIT/features/01_constant_column, SIT/regression/01_explode_
map_with_constants, SIT/regression/04_null_ts_in_pk, SIT/smoke/
06_vector — each driven through the job CLI with the scenario's OWN
property keys and the scenario's full cycle (migrate → validate →
breakData → fixData autocorrect → expected final state). With these,
every reference SIT scenario except 00_test_harness (harness plumbing)
and regression/03_performance (the perf suite — measured by bench.py /
tools/scaling_bench.py instead) has a parity test."""

from __future__ import annotations

import datetime as dt
import json
import os

from cassandra_data_migrator_spark.jobs import main
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.operators.features import (
    SURROGATE_KEY_COL,
    SURROGATE_SEP,
)
from cassandra_data_migrator_spark.sources import write_event_log


def ts(s):
    return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(
        seconds=s)


def _props(tmpdir_path, name, body):
    p = os.path.join(tmpdir_path, name)
    with open(p, "w") as f:
        f.write(body)
    return p


def _last_json(capsys):
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_sit01_constant_column_full_cycle(spark, tmpdir_path, capsys):
    """SIT/features/01_constant_column with the scenario's own keys
    (constantColumns const1,const2 = 1,1234): migrate lands the three
    (key,value) origin rows with both constants; breakData deletes key2
    and corrupts key3 (newer ts, so only a FORCED autocorrect can win);
    fix.properties restores the expected.out state."""
    props = _props(tmpdir_path, "migrate.properties", """
spark.cdm.connect.origin.host                     cdm-sit-cass
spark.cdm.connect.target.host                     cdm-sit-cass
spark.cdm.schema.origin.keyspaceTable             origin.feature_constant_column
spark.cdm.schema.target.keyspaceTable             target.feature_constant_column
spark.cdm.perfops.numParts                        1
spark.cdm.feature.constantColumns.names           const1,const2
spark.cdm.feature.constantColumns.values          1,1234
""")
    fix = _props(tmpdir_path, "fix.properties",
                 open(props).read()
                 + "spark.cdm.autocorrect.missing                 true\n"
                 + "spark.cdm.autocorrect.mismatch                true\n")

    ev_ddl = "key string, warc_ts timestamp, value string, op string, seq long"
    ev = spark.createDataFrame(
        [(f"key{k}", ts(k), f"value{v}", "insert", k)
         for k, v in ((1, "A"), (2, "B"), (3, "C"))], ev_ddl)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=1)
    table = os.path.join(tmpdir_path, "t")

    assert main(["migrate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    assert _last_json(capsys)["events_applied"] == 3
    t = LakeTable(spark, table)
    got = sorted((r["const1"], r["key"], r["const2"], r["value"])
                 for r in t.read().collect())
    # expected.out: (1, key*, 1234, value*) × 3
    assert got == [(1, "key1", 1234, "valueA"), (1, "key2", 1234, "valueB"),
                   (1, "key3", 1234, "valueC")]

    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    out = _last_json(capsys)
    assert out["valid"] == 3 and out["mismatch"] == 0

    # breakData.cql: DELETE key2; key3.value='value999' (newer ts)
    t.merge_batch(spark.createDataFrame(
        [(1, "key2", ts(100), None, 1234, "delete", 100),
         (1, "key3", ts(100), "value999", 1234, "update", 101)],
        "const1 int, key string, warc_ts timestamp, value string, "
        "const2 int, op string, seq long"))

    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", fix], spark=spark) == 0
    out = _last_json(capsys)
    assert out["missing"] == 1 and out["mismatch"] == 1
    assert out["corrected_missing"] == 1 and out["corrected_mismatch"] == 1

    # handles are snapshot-at-open: re-open to see the CLI's commit
    got = sorted((r["const1"], r["key"], r["const2"], r["value"])
                 for r in LakeTable(spark, table).read().collect())
    assert got == [(1, "key1", 1234, "valueA"), (1, "key2", 1234, "valueB"),
                   (1, "key3", 1234, "valueC")]


def test_sitr01_explode_map_with_constants_cycle(spark, tmpdir_path, capsys):
    """SIT/regression/01_explode_map_with_constants — the three-feature
    composition (explodeMap + constantColumns + TIMESTAMP_STRING_MILLIS
    codec) over an explicit target DDL whose ``time`` column is a
    TIMESTAMP while the origin carries epoch-millis STRINGS: 3 origin
    keys × 4 fruits explode to 12 surrogate rows with const1='abcd',
    const2=1234 and time decoded; breakData (key2's partition deleted,
    key3 corrupted per the scenario's CQL) then fix.properties restores
    the origin truth."""
    props = _props(tmpdir_path, "migrate.properties", """
spark.cdm.connect.origin.host                     cdm-sit-cass
spark.cdm.connect.target.host                     cdm-sit-cass
spark.cdm.schema.origin.keyspaceTable             origin.feature_explode_map_with_constants
spark.cdm.schema.target.keyspaceTable             target.feature_explode_map_with_constants
spark.cdm.perfops.numParts                        1
spark.cdm.feature.explodeMap.origin.name          fruits
spark.cdm.feature.explodeMap.target.name.key      fruit
spark.cdm.feature.explodeMap.target.name.value    fruit_qty
spark.cdm.feature.constantColumns.names           const1,const2
spark.cdm.feature.constantColumns.values          'abcd',1234
spark.cdm.transform.codecs                        TIMESTAMP_STRING_MILLIS
""")
    fix = _props(tmpdir_path, "fix.properties",
                 open(props).read()
                 + "spark.cdm.autocorrect.missing                 true\n"
                 + "spark.cdm.autocorrect.mismatch                true\n")

    fruits = {
        "key1": {"apples": 3, "oranges": 5, "bananas": 2, "grapes": 11},
        "key2": {"apples": 4, "oranges": 6, "bananas": 3, "pears": 7},
        "key3": {"apples": 5, "oranges": 7, "bananas": 4, "kiwi": 42},
    }
    ev_ddl = ("key string, warc_ts timestamp, time string, "
              "fruits map<string,int>, op string, seq long")
    ev = spark.createDataFrame(
        [(k, ts(i), "1087383600000", fruits[k], "update", i)
         for i, k in enumerate(sorted(fruits))], ev_ddl)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=1)

    # explicit target DDL (setup.cql's target table): time is TIMESTAMP
    # — the codec must decode the origin's string millis
    tddl = (f"const1 string, const2 int, key string, fruit string, "
            f"time timestamp, fruit_qty int, warc_ts timestamp, "
            f"{SURROGATE_KEY_COL} string")
    table = os.path.join(tmpdir_path, "t")
    assert main(["migrate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--schema", tddl,
                 "--properties-file", props], spark=spark) == 0
    # applied count is post-explode: 3 origin keys × 4 map entries
    assert _last_json(capsys)["events_applied"] == 12
    t = LakeTable(spark, table)
    rows = t.read().collect()
    assert len(rows) == 12          # expected.out: (12 rows)
    expect_time = dt.datetime.utcfromtimestamp(1087383600000 / 1000)
    for r in rows:
        assert r["const1"] == "abcd" and r["const2"] == 1234
        assert r["time"] == expect_time
        assert r["fruit_qty"] == fruits[r["key"]][r["fruit"]]

    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    out = _last_json(capsys)
    assert out["valid"] == 12 and out["mismatch"] == 0

    # breakData.cql, surrogate-keyed: DELETE key2 partition (all four
    # fruits), set key3/apples time, key3/oranges qty, DELETE key3/kiwi
    def surr(k, fruit):
        return f"{k}{SURROGATE_SEP}{fruit}"

    broken_ddl = (f"const1 string, const2 int, key string, fruit string, "
                  f"time timestamp, fruit_qty int, warc_ts timestamp, "
                  f"{SURROGATE_KEY_COL} string, op string, seq long")
    future = dt.datetime.utcfromtimestamp(7398730800000 / 1000)
    bad = [("abcd", 1234, "key2", f, None, None, ts(100),
            surr("key2", f), "delete", 100 + i)
           for i, f in enumerate(fruits["key2"])]
    bad += [
        ("abcd", 1234, "key3", "apples", future, 5, ts(100),
         surr("key3", "apples"), "update", 110),
        ("abcd", 1234, "key3", "oranges", expect_time, 999, ts(100),
         surr("key3", "oranges"), "update", 111),
        ("abcd", 1234, "key3", "kiwi", None, None, ts(100),
         surr("key3", "kiwi"), "delete", 112),
    ]
    t.merge_batch(spark.createDataFrame(bad, broken_ddl))
    live = t.read().count()
    assert live == 12 - 4 - 1       # key2 partition + kiwi gone

    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", fix], spark=spark) == 0
    out = _last_json(capsys)
    assert out["missing"] == 5 and out["mismatch"] == 2
    assert out["corrected_missing"] == 5 and out["corrected_mismatch"] == 2

    rows = LakeTable(spark, table).read().collect()   # fresh snapshot
    assert len(rows) == 12
    for r in rows:
        assert r["time"] == expect_time
        assert r["fruit_qty"] == fruits[r["key"]][r["fruit"]]


def test_sitr04_null_ts_in_pk(spark, tmpdir_path, capsys):
    """SIT/regression/04_null_ts_in_pk: a null timestamp INSIDE the
    target's primary key is replaced by
    ``transform.missing.key.ts.replace.value`` (epoch millis) instead
    of being skipped — key1 arrives with ts NULL and must land with
    ts = 2023-06-01T00:00:00Z; key2's explicit ts is untouched."""
    props = _props(tmpdir_path, "migrate.properties", """
spark.cdm.connect.origin.host                     cdm-sit-cass
spark.cdm.connect.target.host                     cdm-sit-cass
spark.cdm.schema.origin.keyspaceTable             origin.regression_null_ts_in_pk
spark.cdm.schema.target.keyspaceTable             target.regression_null_ts_in_pk
spark.cdm.perfops.numParts                        1
spark.cdm.autocorrect.missing                     true
spark.cdm.autocorrect.mismatch                    true
spark.cdm.transform.missing.key.ts.replace.value  1685577600000
""")
    ev_ddl = "key string, ts timestamp, value string, op string, seq long"
    ev = spark.createDataFrame(
        [("key1", None, "valueA", "insert", 1),
         ("key2", dt.datetime(2023, 6, 2, 12, 0, 0,
                              tzinfo=dt.timezone.utc), "valueB", "insert", 2)],
        ev_ddl)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=1)
    table = os.path.join(tmpdir_path, "t")

    assert main(["migrate", "--log", log, "--table", table,
                 "--key-col", "key", "--ts-col", "ts",
                 "--event-schema", ev_ddl,
                 "--schema", "key string, ts timestamp, value string",
                 "--properties-file", props], spark=spark) == 0
    out = _last_json(capsys)
    assert out["events_applied"] == 2
    # the null-ts row was REPLACED, not quarantined
    assert out.get("quarantined", 0) == 0

    got = {r["key"]: (r["ts"], r["value"])
           for r in LakeTable(spark, table).read().collect()}
    # expected.out: key1 @ 2023-06-01 (the replace value), key2 @ its own ts
    assert got == {
        "key1": (dt.datetime(2023, 6, 1, 0, 0), "valueA"),
        "key2": (dt.datetime(2023, 6, 2, 12, 0), "valueB"),
    }

    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--ts-col", "ts",
                 "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    out = _last_json(capsys)
    assert out["valid"] == 2 and out["mismatch"] == 0 and out["missing"] == 0


def test_sit06_vector_cycle(spark, tmpdir_path, capsys):
    """SIT/smoke/06_vector: a ``vector<float,3>`` column
    (array<float> here) flows migrate → validate → breakData →
    autocorrect unchanged, element-exact."""
    props = _props(tmpdir_path, "migrate.properties", """
spark.cdm.connect.origin.host                     cdm-sit-cass
spark.cdm.connect.target.host                     cdm-sit-cass
spark.cdm.schema.origin.keyspaceTable             origin.smoke_vector
spark.cdm.schema.target.keyspaceTable             target.smoke_vector
spark.cdm.perfops.numParts                        1
spark.cdm.autocorrect.missing                     true
spark.cdm.autocorrect.mismatch                    true
""")
    ev_ddl = ("col1 int, warc_ts timestamp, embedding array<float>, "
              "op string, seq long")
    vecs = {1: [1.1, 2.2, 3.3], 2: [4.4, -0.01, 0.99]}
    ev = spark.createDataFrame(
        [(k, ts(k), v, "insert", k) for k, v in vecs.items()], ev_ddl)
    log = os.path.join(tmpdir_path, "log")
    write_event_log(ev, log, n_chunks=1)
    table = os.path.join(tmpdir_path, "t")

    assert main(["migrate", "--log", log, "--table", table,
                 "--key-col", "col1", "--event-schema", ev_ddl,
                 "--schema", "col1 int, warc_ts timestamp, "
                             "embedding array<float>",
                 "--properties-file", props], spark=spark) == 0
    assert _last_json(capsys)["events_applied"] == 2

    t = LakeTable(spark, table)
    got = {r["col1"]: [round(float(x), 4) for x in r["embedding"]]
           for r in t.read().collect()}
    assert got == {1: [1.1, 2.2, 3.3], 2: [4.4, -0.01, 0.99]}

    # break: row 2 deleted, row 1's vector corrupted with a NEWER ts
    t.merge_batch(spark.createDataFrame(
        [(2, ts(100), None, "delete", 100),
         (1, ts(100), [9.0, 9.0, 9.0], "update", 101)], ev_ddl))

    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "col1", "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    out = _last_json(capsys)
    assert out["missing"] == 1 and out["mismatch"] == 1
    assert out["corrected_missing"] == 1 and out["corrected_mismatch"] == 1

    got = {r["col1"]: [round(float(x), 4) for x in r["embedding"]]
           for r in LakeTable(spark, table).read().collect()}   # fresh snapshot
    assert got == {1: [1.1, 2.2, 3.3], 2: [4.4, -0.01, 0.99]}
