"""PII redaction: rule-by-rule edge cases, the Spark↔DuckDB rule-set
equivalence (the ``pii_redact`` entry query's oracle uses
``redact_pii_sql``), idempotence, and codegen purity."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.pii import (
    PII_RULES,
    pii_count_expr,
    redact_pii_expr,
    redact_pii_sql,
)

CASES = [
    # (input, redacted)
    ("mail john.doe+x@Mail.example.co.uk today",
     "mail <EMAIL> today"),
    ("call (415) 555-0123 or 415-555-0123 or 415.555.0123",
     "call <PHONE> or <PHONE> or <PHONE>"),
    ("intl +14155550123 ok", "intl <PHONE> ok"),
    ("from 192.168.10.1 and 10.0.0.7", "from <IP> and <IP>"),
    ("ssn 123-45-6789 leaked", "ssn <SSN> leaked"),
    ("card 4111 1111-1111 1111 or 4111111111111111",
     "card <CARD> or <CARD>"),
    # non-PII digit shapes survive
    ("v1.2.3 released in 2023, issue #4567", "v1.2.3 released in 2023, issue #4567"),
    ("12 items, 999 total", "12 items, 999 total"),
    # IP is claimed before the dotted phone form can half-eat it
    ("addr 192.168.1.1.", "addr <IP>."),
    ("", ""),
]


def test_redact_rules_spark(spark):
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)],
                               "i long, t string")
    got = {r["i"]: r["r"] for r in
           df.select("i", redact_pii_expr("t").alias("r")).collect()}
    for i, (s, want) in enumerate(CASES):
        assert got[i] == want, f"{s!r}: {got[i]!r} != {want!r}"


def test_redact_null_and_kinds(spark):
    df = spark.createDataFrame(
        [(None, "a@b.co calls 415-555-0123")], "t string, u string")
    row = df.select(
        redact_pii_expr("t").alias("tn"),
        redact_pii_expr("u", kinds=("email",)).alias("em")).first()
    assert row["tn"] is None
    # only the selected kind is scrubbed
    assert row["em"] == "<EMAIL> calls 415-555-0123"
    with pytest.raises(ValueError, match="unknown PII kinds"):
        redact_pii_expr("t", kinds=("nope",))


def test_redact_is_idempotent(spark):
    df = spark.createDataFrame([(s,) for s, _ in CASES], "t string")
    once = df.select(redact_pii_expr("t").alias("t"))
    twice = once.select(redact_pii_expr("t").alias("t"))
    assert sorted(r["t"] for r in once.collect()) == \
        sorted(r["t"] for r in twice.collect())


def test_count_expr(spark):
    df = spark.createDataFrame(
        [("a@b.co and c@d.org; ip 1.2.3.4",)], "t string")
    row = df.select(
        pii_count_expr("t", "email").alias("e"),
        pii_count_expr("t", "ipv4").alias("i"),
        pii_count_expr("t", "ssn").alias("s")).first()
    assert (row["e"], row["i"], row["s"]) == (2, 1, 0)


def test_duckdb_replay_matches_spark(spark):
    """The oracle half applies the identical rules (incl. counts):
    run both engines over the same case table and compare verbatim."""
    con = duckdb.connect()
    con.execute("CREATE TABLE cases (i BIGINT, t VARCHAR)")
    con.executemany("INSERT INTO cases VALUES (?, ?)",
                    [(i, s) for i, (s, _) in enumerate(CASES)])
    sql = redact_pii_sql("SELECT i, t FROM cases", "t", carry_cols=("i",),
                         count_kinds=("email", "phone"))
    duck = {r[0]: r[1:] for r in con.execute(sql).fetchall()}
    df = spark.createDataFrame([(i, s) for i, (s, _) in enumerate(CASES)],
                               "i long, t string")
    spk = {r["i"]: (r["r"], r["n_email"], r["n_phone"]) for r in df.select(
        "i", redact_pii_expr("t").alias("r"),
        pii_count_expr("t", "email").alias("n_email"),
        pii_count_expr("t", "phone").alias("n_phone")).collect()}
    assert {k: (v[0], int(v[1]), int(v[2])) for k, v in duck.items()} == spk


def test_pure_codegen_no_python(spark):
    """The redactor must stay JVM-side: no BatchEvalPython /
    ArrowEvalPython node in the plan."""
    from cassandra_data_migrator_spark import plans
    df = spark.range(10).select(
        F.concat(F.lit("u"), F.col("id").cast("string"),
                 F.lit("@ex.com 415-555-0123")).alias("t"))
    out = df.select(redact_pii_expr("t").alias("r"))
    assert plans.python_eval_nodes(out) == 0


def test_rule_order_is_stable():
    """Order is load-bearing (module doc): IP before dotted phone,
    separator forms before the bare digit run."""
    kinds = [k for k, _, _ in PII_RULES]
    assert kinds.index("ipv4") < kinds.index("phone")
    assert kinds.index("card") < kinds.index("longnum")
    assert kinds.index("phone") < kinds.index("longnum")
