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


def test_split_events_null_predicate_is_skipped(spark):
    """A row whose origin_filter_condition evaluates to NULL (e.g.
    ``v > 50`` over NULL v) is SKIPPED, not silently lost — the
    reference counts every non-kept row (OriginFilterCondition.java:
    25-77, SKIPPED counter). Regression: valid+skipped+quarantined
    must partition the input."""
    df = spark.createDataFrame(
        [("u1", ts(100), 60), ("u2", ts(100), 10), ("u3", ts(100), None)],
        "url string, warc_ts timestamp, v int")
    cfg = EngineConfig(origin_filter_condition="v > 50")
    valid, skipped, quarantined = FL.split_events(df, cfg)
    assert [r["url"] for r in valid.collect()] == ["u1"]
    assert sorted(r["url"] for r in skipped.collect()) == ["u2", "u3"]
    assert quarantined.count() == 0


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


def test_ttl_expiry_and_read_filter(spark, tmpdir_path):
    """TTL half of WritetimeTTL: expires_at = ts + TTL, null TTL never
    expires, read(as_of) hides expired rows (ref
    feature/WritetimeTTL.java:104-177; SIT/smoke/03_ttl_writetime)."""
    from datetime import datetime

    from pyspark.sql import types as T

    from cassandra_data_migrator_spark.config import EngineConfig
    from cassandra_data_migrator_spark.lake import LakeTable
    from cassandra_data_migrator_spark.operators import transforms as TR

    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1), 3600), (2, datetime(2024, 1, 1), None),
         (3, datetime(2024, 1, 1), 86400 * 30)],
        "k long, ts timestamp_ntz, ttl long")
    out = TR.ttl_expiry(df, "ts", "ttl")
    got = {r["k"]: r["expires_at"] for r in out.collect()}
    assert got[1] == datetime(2024, 1, 1, 1, 0, 0)
    assert got[2] is None
    schema = T.StructType([
        T.StructField("k", T.LongType(), False),
        T.StructField("ts", T.TimestampNTZType(), True),
        T.StructField("expires_at", T.TimestampNTZType(), True),
    ])
    t = LakeTable.create(
        spark, f"{tmpdir_path}/ttl", schema,
        EngineConfig(n_buckets=4, key_col="k", ts_col="ts",
                     expires_col="expires_at"))
    src = out.select("k", "ts", "expires_at") \
        .withColumn("op", F.lit("update")).withColumn("seq", F.col("k"))
    t.merge_batch(src)
    # at 2024-01-02, row 1 (1h TTL) is expired; 2 (no TTL) and 3 live
    live = {r["k"] for r in t.read(as_of=datetime(2024, 1, 2)).collect()}
    assert live == {2, 3}
    # without as_of, everything is visible (snapshot semantics)
    assert t.read().count() == 3


def test_collection_and_udt_casts(spark):
    from cassandra_data_migrator_spark.operators import transforms as TR

    df = spark.createDataFrame(
        [(1, [1, 2], {"a": 10}, (5, 0.5))],
        "k long, arr array<long>, m map<string,long>, "
        "u struct<x:long,y:double>")
    out = TR.cast_array_elements(df, "arr", "string")
    out = TR.cast_map_values(out, "m", "string")
    out = TR.cast_map_keys(out, "m", "string")
    out = TR.map_struct_fields(out, "u", {"xs": ("x", "string"),
                                          "yd": ("y", "double")})
    r = out.first()
    assert r["arr"] == ["1", "2"]
    assert r["m"] == {"a": "10"}
    assert r["u"].asDict() == {"xs": "5", "yd": 0.5}


def test_guardrail_all_columns_default(spark):
    from cassandra_data_migrator_spark.operators.filters import guardrail_check

    df = spark.createDataFrame(
        [(1, "x" * 2048, [1, 2, 3]), (2, "y", None)],
        "k long, payload string, tags array<long>")
    out = guardrail_check(df, None, 1.0)  # all columns incl. fixed + array
    got = {r["k"]: r["guardrail_large"] for r in out.collect()}
    assert got == {1: True, 2: False}
    # fixed-width primitive contributes its codec width, not 0
    kb = {r["k"]: r["guardrail_max_kb"] for r in out.collect()}
    assert kb[2] >= 8 / 1024.0


def test_custom_where_and_sampling(spark):
    from datetime import datetime

    from cassandra_data_migrator_spark.config import EngineConfig
    from cassandra_data_migrator_spark.operators import filters as FL

    df = spark.createDataFrame(
        [(i, datetime(2024, 1, 1), float(i)) for i in range(100)],
        "url long, warc_ts timestamp_ntz, value double")
    cfg = EngineConfig(origin_filter_condition="value >= 50")
    valid, skipped, _ = FL.split_events(df, cfg)
    assert valid.count() == 50 and skipped.count() == 50
    # sampling is deterministic and key-based
    s1 = {r["url"] for r in df.filter(
        FL.sample_predicate("url", 30.0)).collect()}
    s2 = {r["url"] for r in df.filter(
        FL.sample_predicate("url", 30.0)).collect()}
    assert s1 == s2 and 10 <= len(s1) <= 50


def test_diff_virtual_columns(spark):
    from cassandra_data_migrator_spark.operators import diff as DIFF

    o = spark.createDataFrame(
        [(1, '{"k":"a"}'), (2, '{"k":"b"}')], "id long, props string")
    t = spark.createDataFrame(
        [(1, "a", "r1"), (2, "WRONG", "r1")], "id long, k string, run_id string")
    d = DIFF.diff_tables(
        o, t, key_cols=("id",), compare_cols=(),
        virtual_cols={
            "k": (F.get_json_object("props", "$.k"), F.col("k")),
            "run_id": (F.lit("r1"), F.col("run_id")),
        })
    got = {r["id"]: (r[DIFF.DIFF_STATUS], list(r[DIFF.MISMATCH_COLS]))
           for r in d.collect()}
    assert got[1] == ("valid", [])
    assert got[2] == ("mismatch", ["k"])


def test_stratified_sample_rates_and_determinism(spark):
    """Per-stratum keep rates land near their budgets, the default
    covers unlisted strata (0% default drops them entirely), rerun is
    identical, and the DuckDB rendering picks the same rows."""
    import duckdb

    rows = [(i, ["en", "de", "zz"][i % 3]) for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    rates = {"en": 80.0, "de": 20.0}
    pred = FL.stratified_sample_predicate("doc_id", "lang", rates,
                                          default_percent=0.0)
    got = df.filter(pred).groupBy("lang").count().collect()
    by = {r["lang"]: r["count"] for r in got}
    assert "zz" not in by                       # 0% default
    assert 0.70 < by["en"] / 1000 < 0.90        # ~80%
    assert 0.12 < by["de"] / 1000 < 0.28        # ~20%
    # deterministic: identical keep-set run-over-run
    a = sorted(r["doc_id"] for r in df.filter(pred).collect())
    b = sorted(r["doc_id"] for r in df.filter(pred).collect())
    assert a == b
    # the SQL twin picks the IDENTICAL rows
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, lang VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    sql = FL.stratified_sample_sql("doc_id", "lang", rates,
                                   default_percent=0.0)
    duck = sorted(r[0] for r in con.execute(
        f"SELECT doc_id FROM t WHERE {sql}").fetchall())
    assert duck == a
    # keys stay whole: same key in two strata only differs via stratum
    from cassandra_data_migrator_spark import plans
    assert plans.python_eval_nodes(df.filter(pred)) == 0
