"""Deterministic synthetic web-page table + change-event stream.

Everything is generated *distributed* (``spark.range`` + codegen'd
expressions keyed on ``xxhash64(id, seed)``) — no driver-side loops, so
the same recipe scales from 100 rows in tests to 10^10 events on a
cluster. Seeded and time-free: the same (n, seed) always produces the
same rows on any executor count (FIXTURES.md F1/F2; replaces the
reference's NoSQLBench-generated PERF dataset, ``PERF/perf-iot.yaml:40-52``).

Skew fixture: ~20% of pages land on 3 hot domains (north_rule salting
target). Event fixture includes out-of-order (late) events, deletes,
re-inserts after delete, and exact-duplicate events (replay idempotence),
mirroring FIXTURES.md F2's generation recipe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.udfs import extract_text

BASE_EPOCH = 1_700_000_000  # fixed, never "now" — determinism

_PHRASES = [
    "the quick brown fox jumps over the lazy dog",
    "pack my box with five dozen liquor jugs",
    "how vexingly quick daft zebras jump",
    "sphinx of black quartz judge my vow",
    "the five boxing wizards jump quickly",
]
_LANGS = ["en", "de", "fr", "es", "zh", ""]


def _h(col, seed: int, salt: int):
    return F.xxhash64(col, F.lit(seed), F.lit(salt))


def _mod(col, seed: int, salt: int, n: int):
    return F.pmod(_h(col, seed, salt), F.lit(n))


def _url_expr(page_id, seed: int, n_domains: int = 200):
    """~20% of pages on 3 hot domains, rest uniform over n_domains."""
    hot = _mod(page_id, seed, 1, 10) < 2
    domain_id = F.when(hot, _mod(page_id, seed, 2, 3)) \
                 .otherwise(3 + _mod(page_id, seed, 3, n_domains))
    return F.concat(
        F.lit("https://d"), domain_id.cast("string"),
        F.lit(".example.com/page/"), page_id.cast("string"),
    )


def _html_expr(eid, seed: int, salt_base: int):
    """Pseudo-HTML binary, 0.2–50 KB, deterministic in (eid, seed)."""
    phrase = F.element_at(
        F.array(*[F.lit(p) for p in _PHRASES]),
        (_mod(eid, seed, salt_base, len(_PHRASES)) + 1).cast("int"),
    )
    # mostly 1-400 repeats (~0.05-18 KB); 1% large (~45 KB, guardrail rows)
    reps = F.when(_mod(eid, seed, salt_base + 1, 100) == 0, F.lit(1000)) \
            .otherwise((_mod(eid, seed, salt_base + 2, 400) + 4).cast("int"))
    body = F.concat(
        F.lit("<p>"),
        F.repeat(F.concat(phrase, F.lit(" rev")), reps),
        F.lit(" "), _h(eid, seed, salt_base + 3).cast("string"),
        F.lit("</p>"),
    )
    return F.encode(
        F.concat(
            F.lit("<html><head><title>page "), eid.cast("string"),
            F.lit("</title><script>var t=1;</script>"
                  "<style>p{color:red}</style></head><body>"),
            body, F.lit("</body></html>"),
        ),
        "UTF-8",
    )


def _lang_expr(eid, seed: int, salt: int):
    return F.element_at(
        F.array(*[F.lit(x) for x in _LANGS]),
        (_mod(eid, seed, salt, len(_LANGS)) + 1).cast("int"),
    )


def gen_web_pages(spark: SparkSession, n_rows: int, seed: int = 42,
                  partitions: int | None = None) -> DataFrame:
    """FIXTURES.md F1: ``web_pages(url, warc_ts, html, text, lang)``."""
    ids = spark.range(0, n_rows, numPartitions=partitions)
    pid = F.col("id")
    df = ids.select(
        _url_expr(pid, seed).alias("url"),
        F.timestamp_seconds(
            F.lit(BASE_EPOCH) + _mod(pid, seed, 4, 86_400 * 365)
        ).alias("warc_ts"),
        _html_expr(pid, seed, 10).alias("html"),
        _lang_expr(pid, seed, 5).alias("lang"),
    )
    return df.withColumn("text", extract_text(F.col("html"))) \
             .select("url", "warc_ts", "html", "text", "lang")


def gen_change_events(spark: SparkSession, n_urls: int, n_events: int,
                      seed: int = 42, partitions: int | None = None,
                      dup_rate: int = 50) -> DataFrame:
    """FIXTURES.md F2: ``change_events(seq, op, url, warc_ts, html, lang)``.

    - ~5% deletes, ~1% re-insert-after-delete (op='insert' with a newer
      ts than the delete), rest updates/inserts.
    - ~10% late events (warc_ts far behind their seq position).
    - 1/dup_rate exact duplicates: event i clones event i-1 entirely
      (same seq!) — replay idempotence case.
    """
    ids = spark.range(0, n_events, numPartitions=partitions)
    raw = F.col("id")
    dup = (_mod(raw, seed, 20, dup_rate) == 3) & (raw > 0)
    eid = F.when(dup, raw - 1).otherwise(raw)

    opk = _mod(eid, seed, 21, 100)
    op = (
        F.when(opk < 5, F.lit("delete"))
        .when(opk < 6, F.lit("insert"))    # re-insert flavour
        .when(opk < 40, F.lit("insert"))
        .otherwise(F.lit("update"))
    )
    late = _mod(eid, seed, 22, 10) == 7
    ts_off = F.when(late, eid * 10 - F.lit(500_000)).otherwise(
        eid * 10 + _mod(eid, seed, 23, 5))
    is_del = op == "delete"
    return ids.select(
        eid.alias("seq"),
        op.alias("op"),
        _url_expr(_mod(eid, seed, 24, n_urls), seed).alias("url"),
        F.timestamp_seconds(F.lit(BASE_EPOCH) + ts_off).alias("warc_ts"),
        F.when(is_del, F.lit(None).cast("binary"))
         .otherwise(_html_expr(eid, seed, 30)).alias("html"),
        F.when(is_del, F.lit(None).cast("string"))
         .otherwise(_lang_expr(eid, seed, 35)).alias("lang"),
    )
