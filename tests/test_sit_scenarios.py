"""SIT-parity scenarios the reference ships as smoke/feature suites:
reserved-keyword identifiers (SIT/smoke/05_reserved_keyword) and the
constant-column remove/replace migrations (SIT/features/06, 07),
composed from this engine's drop/lit/rename/diff primitives."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake import LakeTable
from cassandra_data_migrator_spark.operators.diff import (
    autocorrect,
    diff_counters,
    diff_tables,
)
from cassandra_data_migrator_spark.operators.transforms import constant_columns


def ts(s):
    return dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc) + dt.timedelta(seconds=s)


def test_reserved_keyword_columns_roundtrip(spark, tmpdir_path):
    """SIT/smoke/05_reserved_keyword: a column named ``order`` (plus
    ``select``, both SQL keywords) flows through create → merge → read
    → checksums → diff → autocorrect untouched."""
    schema = T.StructType([
        T.StructField("col1", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("order", T.StringType(), True),
        T.StructField("select", T.StringType(), True),
    ])
    cfg = EngineConfig(n_buckets=4, key_col="col1", ts_col="warc_ts")
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), schema, cfg)
    ev = spark.createDataFrame(
        [("c1", ts(1), "o1", "s1", "insert", 1),
         ("c2", ts(1), "o2", "s2", "insert", 2),
         ("c1", ts(2), "o1b", "s1b", "update", 3)],
        "col1 string, warc_ts timestamp, `order` string, `select` string, "
        "op string, seq long")
    t.merge_batch(ev)
    got = {r["col1"]: (r["order"], r["select"]) for r in t.read().collect()}
    assert got == {"c1": ("o1b", "s1b"), "c2": ("o2", "s2")}
    assert t.checksums().count() > 0

    # diff + autocorrect with the keyword column mismatched
    origin = t.read()
    broken = origin.withColumn(
        "order", F.when(F.col("col1") == "c1", F.lit("BROKEN"))
                  .otherwise(F.col("order")))
    t2 = LakeTable.create(spark, os.path.join(tmpdir_path, "t2"), schema, cfg)
    t2.merge_batch(broken.withColumn("op", F.lit("insert"))
                         .withColumn("seq", F.lit(1)))
    d = diff_tables(origin, t2.read(), key_cols=["col1"], n_buckets=4)
    c = diff_counters(d)
    assert c["mismatch"] == 1
    _res, corrected = autocorrect(t2, origin, d, key_cols=["col1"])
    assert corrected["corrected_mismatch"] == 1
    d2 = diff_tables(origin, t2.read(), key_cols=["col1"], n_buckets=4)
    c2 = diff_counters(d2)
    assert c2["valid"] == 2 and c2["mismatch"] == 0


def _origin_const(spark):
    # SIT setup.cql: (const1 int, key text, value text, const2 int)
    return spark.createDataFrame(
        [(1, "key1", "valueA", 21), (1, "key2", "valueB", 22),
         (1, "key3", "valueC", 23)],
        "const1 int, key string, value string, const2 int")


def test_constant_column_remove(spark, tmpdir_path):
    """SIT/features/06: origin carries const1/const2; the target drops
    them — migrate only (key, value), then validate clean."""
    schema = T.StructType([
        T.StructField("key", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("value", T.StringType(), True),
    ])
    cfg = EngineConfig(n_buckets=4, key_col="key", ts_col="warc_ts")
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), schema, cfg)
    src = (_origin_const(spark).drop("const1", "const2")
           .withColumn("warc_ts", F.lit(ts(0)))
           .withColumn("op", F.lit("insert"))
           .withColumn("seq", F.col("key").substr(4, 1).cast("long")))
    t.merge_batch(src)
    # expected.out: 3 rows, (key, value) only
    assert sorted((r["key"], r["value"]) for r in t.read().collect()) == [
        ("key1", "valueA"), ("key2", "valueB"), ("key3", "valueC")]
    d = diff_tables(src.drop("op", "seq"), t.read(), key_cols=["key"])
    assert diff_counters(d) == {"read": 3, "valid": 3, "mismatch": 0,
                                "missing": 0, "extra_target": 0, "error": 0}


def test_constant_column_replace(spark, tmpdir_path):
    """SIT/features/07: origin consts (const1=1, const2=2x) are REPLACED
    by target constants const3=2, const4=31 (the feature.constantColumns
    config) — validated with the feature-aware virtual-column diff."""
    schema = T.StructType([
        T.StructField("const3", T.IntegerType(), True),
        T.StructField("key", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("value", T.StringType(), True),
        T.StructField("const4", T.IntegerType(), True),
    ])
    cfg = EngineConfig(n_buckets=4, key_col="key", ts_col="warc_ts")
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "t"), schema, cfg)
    origin = _origin_const(spark)
    src = constant_columns(
        origin.drop("const1", "const2"),
        {"const3": (2, "int"), "const4": (31, "int")},
    ).withColumn("warc_ts", F.lit(ts(0))) \
     .withColumn("op", F.lit("insert")) \
     .withColumn("seq", F.col("key").substr(4, 1).cast("long"))
    t.merge_batch(src)
    # expected.out: const3=2, const4=31 on every row
    assert sorted((r["const3"], r["key"], r["const4"], r["value"])
                  for r in t.read().collect()) == [
        (2, "key1", 31, "valueA"), (2, "key2", 31, "valueB"),
        (2, "key3", 31, "valueC")]
    # virtual-column validation: origin has no const3/const4 — compare
    # the configured literals against the target columns
    d = diff_tables(
        origin.select("key", "value"), t.read(), key_cols=["key"],
        compare_cols=["value"],
        virtual_cols={"const3": (F.lit(2), F.col("const3")),
                      "const4": (F.lit(31), F.col("const4"))},
    )
    assert diff_counters(d) == {"read": 3, "valid": 3, "mismatch": 0,
                                "missing": 0, "extra_target": 0, "error": 0}


def test_sit03_codec_properties_file(spark, tmpdir_path, capsys):
    """SIT/features/03_codec with the reference's OWN migrate.properties
    keys verbatim (``SIT/features/03_codec/migrate.properties``): five
    string origin columns land typed in the target via the enabled
    codec families — INT/DOUBLE/BIGINT/DECIMAL_STRING and
    TIMESTAMP_STRING_FORMAT with pattern ``yyMMddHHmmss`` (Spark's
    two-digit-year base is 2000, matching the reference's
    ``99…`` → 2099 expectation in ``expected.out``)."""
    import json

    from cassandra_data_migrator_spark.jobs import main
    from cassandra_data_migrator_spark.sources import write_event_log

    props = os.path.join(tmpdir_path, "migrate.properties")
    with open(props, "w") as f:
        # the reference file's keys AS-IS (whitespace separator incl.);
        # connect/keyspaceTable keys must warn, not fail
        f.write("""
spark.cdm.connect.origin.host                     cdm-sit-cass
spark.cdm.connect.target.host                     cdm-sit-cass
spark.cdm.schema.origin.keyspaceTable             origin.codec
spark.cdm.schema.target.keyspaceTable             target.codec
spark.cdm.perfops.numParts                        1
spark.cdm.transform.codecs                          INT_STRING,DOUBLE_STRING,BIGINT_STRING,DECIMAL_STRING,TIMESTAMP_STRING_FORMAT
spark.cdm.transform.codecs.timestamp.string.format  yyMMddHHmmss
""")

    table = os.path.join(tmpdir_path, "codec_t")
    LakeTable.create(
        spark, table,
        T.StructType.fromDDL(
            "key string, warc_ts timestamp, val_int int, "
            "val_bigint bigint, val_timestamp timestamp, "
            "val_decimal decimal(10,2), val_double double"),
        EngineConfig(key_col="key"))

    rows = [("key1", "1234", "9223372036854775807", "040616110000",
             "3.14", "21474836470.7"),
            ("key2", "12345", "2147483648", "990616110000",
             "4.14", "21474836470.7"),
            ("key3", "123456", "3141592653589793", "990616110000",
             "5.14", "21474836470.7")]
    ev = spark.createDataFrame(
        [(k, dt.datetime(2024, 1, 1), vi, vb, vt, vd, vdb, "update", n)
         for n, (k, vi, vb, vt, vd, vdb) in enumerate(rows)],
        "key string, warc_ts timestamp, val_int string, "
        "val_bigint string, val_timestamp string, val_decimal string, "
        "val_double string, op string, seq long")
    log = os.path.join(tmpdir_path, "codec_log")
    write_event_log(ev, log, n_chunks=1)

    assert main(["migrate", "--log", log, "--table", table,
                 "--key-col", "key", "--properties-file", props],
                spark=spark) == 0
    cap = capsys.readouterr()
    out = json.loads(cap.out.strip().splitlines()[-1])
    assert out["events_applied"] == 3
    # inapplicable connectivity keys warned, none failed
    assert cap.err.count("ignoring spark.cdm.connect") == 2

    got = {r["key"]: r for r in LakeTable(spark, table).read().collect()}
    assert got["key1"]["val_int"] == 1234
    assert got["key1"]["val_bigint"] == 9223372036854775807
    assert got["key1"]["val_timestamp"] == dt.datetime(2004, 6, 16, 11)
    assert float(got["key1"]["val_decimal"]) == 3.14
    assert got["key1"]["val_double"] == 21474836470.7
    assert got["key2"]["val_timestamp"] == dt.datetime(2099, 6, 16, 11)
    assert got["key3"]["val_bigint"] == 3141592653589793

    # validate under the same properties file is clean (DiffData leg
    # applies the identical codec set)
    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--properties-file", props],
                spark=spark) == 0
    out = json.loads(
        capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] == 3 and out["mismatch"] == 0


def test_sit08_column_subset_target(spark, tmpdir_path, capsys):
    """SIT/features/08_map_columns_origin_target: the target is a
    COLUMN-SUBSET of the origin with a NARROWER key — origin
    ``(key_a, key_b) → val_a, val_b`` lands in target
    ``key_a → val_a, val_c`` with the extra origin columns dropped,
    the target-only column null, and LWW collapsing the composite-key
    rows per ``key_a`` (the reference's expected.out shape)."""
    import json

    from cassandra_data_migrator_spark.jobs import main
    from cassandra_data_migrator_spark.sources import write_event_log

    ev = spark.createDataFrame(
        [(1, "key1", "valueA", 21, dt.datetime(2024, 1, 1), "update", 1),
         (2, "key2", "valueB", 22, dt.datetime(2024, 1, 1), "update", 2),
         (3, "key3", "valueC", 23, dt.datetime(2024, 1, 1), "update", 3)],
        "key_a int, key_b string, val_a string, val_b int, "
        "warc_ts timestamp, op string, seq long")
    log = os.path.join(tmpdir_path, "log08")
    write_event_log(ev, log, n_chunks=1)
    table = os.path.join(tmpdir_path, "t08")

    assert main(
        ["migrate", "--log", log, "--table", table, "--key-col", "key_a",
         "--schema", "key_a int, warc_ts timestamp, val_a string, "
                     "val_c int",
         "--event-schema", "infer"], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["events_applied"] == 3

    got = {r["key_a"]: (r["val_a"], r["val_c"])
           for r in LakeTable(spark, table).read().collect()}
    assert got == {1: ("valueA", None), 2: ("valueB", None),
                   3: ("valueC", None)}

    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key_a", "--event-schema", "infer"],
                spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] == 3 and out["mismatch"] == 0
    assert out["missing"] == 0 and out["extra_target"] == 0


def test_sit04_udt_mapper_auto_struct_mapping(spark, tmpdir_path, capsys):
    """SIT/features/04_udt_mapper with the scenario's OWN properties
    keys (bare connect/keyspaceTable/numParts — NO feature keys): the
    origin's UDT columns (a struct, a list/set of structs, a map of
    structs) land in the target's differently-shaped UDT automatically,
    field-by-field BY POSITION (CqlConversion.java:290-326) — here the
    target struct renames every field. Then the scenario's full cycle:
    validate clean → breakData (key2 deleted from target, key3's UDTs
    corrupted) → fix.properties autocorrect (missing+mismatch) →
    expected final state."""
    import json

    from cassandra_data_migrator_spark.jobs import main
    from cassandra_data_migrator_spark.sources import write_event_log

    props = os.path.join(tmpdir_path, "migrate.properties")
    with open(props, "w") as f:
        f.write("""
spark.cdm.connect.origin.host                     cdm-sit-cass
spark.cdm.connect.target.host                     cdm-sit-cass
spark.cdm.schema.origin.keyspaceTable             origin.udt_mapper
spark.cdm.schema.target.keyspaceTable             target.udt_mapper
spark.cdm.perfops.numParts                        1
""")
    fix_props = os.path.join(tmpdir_path, "fix.properties")
    with open(fix_props, "w") as f:
        f.write(open(props).read() +
                "spark.cdm.autocorrect.missing                     true\n"
                "spark.cdm.autocorrect.mismatch                    true\n")

    # origin UDT: (text_value, long_value, double_value); the target
    # UDT renames every field (txt, num, dbl) — the Spark analog of the
    # scenario's distinct origin/target UDT types
    o_udt = "struct<text_value:string,long_value:bigint,double_value:double>"
    t_udt = "struct<txt:string,num:bigint,dbl:double>"
    table = os.path.join(tmpdir_path, "udt_t")
    LakeTable.create(
        spark, table,
        T.StructType.fromDDL(
            f"key string, warc_ts timestamp, val_udt {t_udt}, "
            f"val_list array<{t_udt}>, val_set array<{t_udt}>, "
            f"val_map map<string,{t_udt}>"),
        EngineConfig(key_col="key", n_buckets=4))

    def udt(k, i):
        return (f"value{k}{i}", k * 1000000000 + i, k + i / 100.0)

    rows = [
        (f"key{k}", ts(k), udt(k, 0), [udt(k, 1), udt(k, 2)],
         [udt(k, 3), udt(k, 4)],
         {"map_key1": udt(k, 5), "map_key2": udt(k, 6)}, "update", k)
        for k in (1, 2, 3)
    ]
    ev_ddl = (f"key string, warc_ts timestamp, val_udt {o_udt}, "
              f"val_list array<{o_udt}>, val_set array<{o_udt}>, "
              f"val_map map<string,{o_udt}>, op string, seq long")
    ev = spark.createDataFrame(rows, ev_ddl)
    log = os.path.join(tmpdir_path, "udt_log")
    write_event_log(ev, log, n_chunks=1)

    assert main(["migrate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    cap = capsys.readouterr()
    assert json.loads(cap.out.strip().splitlines()[-1])["events_applied"] == 3

    t = LakeTable(spark, table)
    got = {r["key"]: r for r in t.read().collect()}
    assert len(got) == 3
    for k in (1, 2, 3):
        r = got[f"key{k}"]
        assert r["val_udt"].asDict() == {
            "txt": f"value{k}0", "num": k * 1000000000, "dbl": float(k)}
        assert [x["txt"] for x in r["val_list"]] == [f"value{k}1",
                                                     f"value{k}2"]
        assert sorted(x["num"] for x in r["val_set"]) == [
            k * 1000000000 + 3, k * 1000000000 + 4]
        assert r["val_map"]["map_key2"].asDict() == {
            "txt": f"value{k}6", "num": k * 1000000000 + 6,
            "dbl": k + 0.06}

    # validate clean: the origin truth runs through the SAME positional
    # struct mapping
    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] == 3 and out["mismatch"] == 0

    # breakData.cql: DELETE key2; corrupt every UDT of key3 (newer ts
    # so plain LWW would keep the corruption — autocorrect must force)
    bad = ("value999", 9990000000, 999.0)
    t.merge_batch(spark.createDataFrame(
        [("key2", ts(100), None, None, None, None, "delete", 100),
         ("key3", ts(100), bad, [bad, bad], [bad, bad],
          {"map_key1": bad, "map_key2": bad}, "update", 101)],
        f"key string, warc_ts timestamp, val_udt {t_udt}, "
        f"val_list array<{t_udt}>, val_set array<{t_udt}>, "
        f"val_map map<string,{t_udt}>, op string, seq long"))

    # cdm.fixData.assert: 1 mismatch corrected, 1 missing corrected,
    # 1 valid
    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", fix_props], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] == 1 and out["mismatch"] == 1
    assert out["missing"] == 1
    assert out["corrected_missing"] == 1 and out["corrected_mismatch"] == 1

    # cdm.validateData.assert after fix: all clean again
    assert main(["validate", "--log", log, "--table", table,
                 "--key-col", "key", "--event-schema", ev_ddl,
                 "--properties-file", props], spark=spark) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["valid"] == 3 and out["mismatch"] == 0 \
        and out["missing"] == 0
