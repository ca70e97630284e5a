"""Filters (F1-F7) + transforms (T1-T9) — unit tests mirroring the
reference feature tests (ExplodeMapTest, ExtractJsonTest,
ConstantColumnsTest, GuardrailTest, WritetimeTTLTest)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.operators import filters as FL
from cassandra_data_migrator_spark.operators import transforms as TR

UTC = dt.timezone.utc


def ts(s):
    return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=s)


def test_split_events_window_value_and_quarantine(spark):
    schema = T.StructType([
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
    ])
    df = spark.createDataFrame([
        ("u1", ts(100), "en"),      # valid
        ("u2", ts(5000), "en"),     # outside window → skipped
        ("u3", ts(100), " ZZ "),    # column-value filter → skipped
        (None, ts(100), "en"),      # null key → quarantined
        ("u5", None, "en"),         # null ts → defaulted, valid
    ], schema)
    cfg = EngineConfig(
        writetime_min=ts(0), writetime_max=ts(1000),
        skip_column="lang", skip_value="zz",
        null_ts_default=ts(0),
    )
    valid, skipped, quarantined = FL.split_events(df, cfg)
    assert sorted(r["url"] for r in valid.collect()) == ["u1", "u5"]
    assert sorted(r["url"] for r in skipped.collect()) == ["u2", "u3"]
    assert [r["url"] for r in quarantined.collect()] == [None]
    # defaulted null ts
    u5 = {r["url"]: r["warc_ts"] for r in valid.collect()}["u5"]
    assert u5 == ts(0).replace(tzinfo=None)


def test_guardrail(spark):
    df = spark.createDataFrame(
        [("u1", b"x" * 2048), ("u2", b"y" * 100)], ["url", "html"])
    out = FL.guardrail_check(df, ["url", "html"], col_size_kb=1)
    flags = {r["url"]: r["guardrail_large"] for r in out.collect()}
    assert flags == {"u1": True, "u2": False}


def test_rename_cast_constants(spark):
    df = spark.createDataFrame([("a", "231105120000", "42")],
                               ["body", "ts_str", "n_str"])
    out = TR.rename_columns(df, {"body": "html_text"})
    out = TR.parse_timestamp(out, "ts_str", "yyMMddHHmmss", out="warc_ts")
    out = TR.cast_columns(out, {"n_str": "int"})
    out = TR.constant_columns(out, {"source": ("cc-main-2026", "string")})
    r = out.collect()[0]
    assert r["html_text"] == "a"
    assert r["warc_ts"] == dt.datetime(2023, 11, 5, 12, 0, 0)
    assert r["n_str"] == 42 and r["source"] == "cc-main-2026"


def test_explode_map_fanout(spark):
    # SIT/features/02_explode_map: 3 rows × 4 entries → 12
    rows = [(f"u{i}", {f"h{j}": f"v{i}{j}" for j in range(4)})
            for i in range(3)]
    df = spark.createDataFrame(rows, ["url", "headers"])
    out = TR.explode_map(df, "headers", "header_key", "header_value")
    assert out.count() == 12
    assert set(out.columns) == {"url", "header_key", "header_value"}
    got = {(r["url"], r["header_key"]): r["header_value"]
           for r in out.collect()}
    assert got[("u1", "h2")] == "v12"


def test_extract_json_overwrite_modes(spark):
    df = spark.createDataFrame(
        [('{"lang": "fr", "k": 1}', None), ('{"lang": "de"}', "en")],
        ["meta", "lang"])
    ow = TR.extract_json(df, "meta", "$.lang", "lang", overwrite=True)
    assert [r["lang"] for r in ow.collect()] == ["fr", "de"]
    no = TR.extract_json(df, "meta", "$.lang", "lang", overwrite=False)
    assert [r["lang"] for r in no.collect()] == ["fr", "en"]


def test_row_writetime_greatest(spark):
    df = spark.createDataFrame([(ts(10), ts(30), ts(20))], ["a", "b", "c"])
    out = df.select(TR.row_writetime(["a", "b", "c"]).alias("wt"))
    assert out.collect()[0]["wt"] == ts(30).replace(tzinfo=None)


def test_map_null_scrub(spark):
    df = spark.createDataFrame(
        [({"a": "1", "b": None},)], ["m"])
    out = TR.map_null_scrub(df, "m")
    assert out.collect()[0]["m"] == {"a": "1"}


def test_coalesce_unset_nulls_batch(spark):
    src = spark.createDataFrame([("u1", None, "fr")],
                                "url string, text string, lang string")
    existing = spark.createDataFrame([("u1", "old", "en")],
                                     ["url", "text", "lang"])
    out = TR.coalesce_unset_nulls(src, existing, ["url"], ["text", "lang"])
    r = out.collect()[0]
    assert r["text"] == "old" and r["lang"] == "fr"
