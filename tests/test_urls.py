"""URL canonicalization: rule-by-rule edge cases and the Spark↔DuckDB
rule-set equivalence (the entry query's oracle uses
``canonical_url_sql`` — these tests pin the expression semantics the
two halves must share)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.urls import (
    canonical_url_expr,
    canonical_url_sql,
)

CASES = [
    # (input, canonical)
    ("HTTPS://WWW.Example.COM:443/Path/To?b=2&a=1#frag",
     "https://example.com/Path/To?a=1&b=2"),
    ("http://Example.com:80/", "http://example.com"),
    ("http://example.com:8080/x", "http://example.com:8080/x"),
    ("https://example.com/x?utm_source=a&utm_medium=b&fbclid=z",
     "https://example.com/x"),
    ("https://example.com/x?gclid=1&keep=2&ref=h",
     "https://example.com/x?keep=2"),
    ("https://example.com/a/b/", "https://example.com/a/b"),
    ("https://example.com", "https://example.com"),
    ("  https://example.com/x  ", "https://example.com/x"),
    # path/query VALUE case is preserved; only scheme+host fold
    ("HTTP://H.COM/CaSe?Q=VaLuE", "http://h.com/CaSe?Q=VaLuE"),
    # no scheme: opaque key passes through trimmed, untouched
    (" not-a-url ", "not-a-url"),
    ("k5", "k5"),
    # empty query / dangling separators
    ("https://example.com/x?", "https://example.com/x"),
    ("https://example.com/x?a=1&&b=2", "https://example.com/x?a=1&b=2"),
    # www kept inside the host, only the PREFIX strips
    ("https://www.wwwish.com/x", "https://wwwish.com/x"),
    ("https://notwww.example.com/x", "https://notwww.example.com/x"),
]


def test_canonical_rules_spark(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    got = {r["i"]: r["c"] for r in
           df.select("i", canonical_url_expr("url").alias("c")).collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_canonical_null_in_null_out(spark):
    df = spark.createDataFrame([(1, None)], "i long, url string")
    assert df.select(
        canonical_url_expr("url").alias("c")).first()["c"] is None


def test_strip_www_off(spark):
    df = spark.createDataFrame([("https://www.example.com/x",)],
                               "url string")
    got = df.select(canonical_url_expr(
        "url", strip_www=False).alias("c")).first()["c"]
    assert got == "https://www.example.com/x"


def test_duckdb_replay_matches_spark(spark):
    """The oracle half applies the identical rules: run both engines
    over the same case table and compare verbatim."""
    con = duckdb.connect()
    con.execute("CREATE TABLE cases (i BIGINT, url VARCHAR)")
    con.executemany("INSERT INTO cases VALUES (?, ?)",
                    [(i, u) for i, (u, _) in enumerate(CASES)])
    sql = canonical_url_sql("SELECT i, url FROM cases", "url",
                            carry_cols=("i",))
    duck = {i: c for i, c in con.execute(sql).fetchall()}
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)],
                               "i long, url string")
    spk = {r["i"]: r["c"] for r in
           df.select("i", canonical_url_expr("url").alias("c")).collect()}
    assert duck == spk


def test_canonical_is_idempotent(spark):
    df = spark.createDataFrame([(u,) for u, _ in CASES], "url string")
    once = df.select(canonical_url_expr("url").alias("url"))
    twice = once.select(canonical_url_expr("url").alias("url"))
    assert sorted(r["url"] for r in once.collect()) == \
        sorted(r["url"] for r in twice.collect())


def test_pure_codegen_no_python(spark):
    """The canonicalizer must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython node in the plan."""
    from cassandra_data_migrator_spark import plans
    df = spark.range(10).select(
        F.concat(F.lit("https://WWW.h"), F.col("id").cast("string"),
                 F.lit(".com:443/x?utm_source=1&a=2")).alias("url"))
    out = df.select(canonical_url_expr("url").alias("c"))
    assert plans.python_eval_nodes(out) == 0
