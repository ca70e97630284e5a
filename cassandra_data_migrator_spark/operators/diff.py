"""Validation diff + auto-correction (the reference's DiffData job).

The reference validates by scanning the origin per token range and
point-looking-up each row on the target async
(``job/DiffJobSession.java:115-195``), comparing field-by-field with
null-safe equality (``data/DataUtility.java:47-57``), and optionally
re-upserting MISSING/MISMATCH rows
(``DiffJobSession.java:203-241``; autocorrect props
``properties/KnownProperties.java:127-130``). Validation **never
deletes** target rows (``README.md:114-115``).

Spark-native restatement: ONE distributed job —
``origin FULL OUTER JOIN target ON keys`` → per-row classification →
per-bucket counter aggregation → autocorrect = MERGE the bad subset
back into the lake table. The N-async-point-lookups pattern becomes a
single shuffle (sort-merge or broadcast, Catalyst/AQE's choice), which
is the scalable shape at 10^10 rows.

Classification (mirrors the reference's JobCounter vocabulary,
``job/JobCounter.java:32-57``):

- ``valid``          — row present both sides, all compare-columns equal
- ``mismatch``       — present both sides, ≥1 compare-column differs
- ``missing_target`` — in origin, absent on target (reference MISSING)
- ``extra_target``   — on target only; counted, never deleted
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.functions.hashing import bucket_expr
from cassandra_data_migrator_spark.lake.table import LakeTable, MergeResult

DIFF_STATUS = "diff_status"
MISMATCH_COLS = "mismatch_cols"


def diff_tables(
    origin: DataFrame,
    target: DataFrame,
    key_cols: Sequence[str] = ("url",),
    compare_cols: Sequence[str] | None = None,
    n_buckets: int | None = None,
    virtual_cols: Mapping[str, tuple[Column, Column]] | None = None,
) -> DataFrame:
    """Row-level diff of two tables on ``key_cols``.

    Returns one row per key present on either side with:
    ``key_cols…, diff_status, mismatch_cols, bucket?`` plus
    ``o_<col>`` / ``t_<col>`` value pairs for compare columns.

    Null-safe per-column comparison (``eqNullSafe``) matches the
    reference's null-tolerant ``DataUtility.diff``
    (``data/DataUtility.java:47-57``).

    ``virtual_cols`` compares COMPUTED values — ``{name:
    (origin_expr, target_expr)}`` — the reference's feature-aware
    compare: an extract-json / explode-map / constant target column has
    no physical origin counterpart, so the origin side is compared
    through the feature's expression instead
    (``job/DiffJobSession.java:243-330``). E.g. constant column:
    ``("run_id", (F.lit("r1"), F.col("run_id")))``; extracted JSON:
    ``("k", (F.get_json_object("props", "$.k"), F.col("k")))``.
    """
    keys = list(key_cols)
    if compare_cols is None:
        compare_cols = [c for c in origin.columns
                        if c in target.columns and c not in keys]
    compare_cols = list(compare_cols)
    virtual_cols = dict(virtual_cols or {})

    o = origin.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"o_{c}") for c in compare_cols],
        *[oe.alias(f"o_{n}") for n, (oe, _te) in virtual_cols.items()],
        F.lit(True).alias("_in_o"),
    )
    t = target.select(
        *[F.col(k) for k in keys],
        *[F.col(c).alias(f"t_{c}") for c in compare_cols],
        *[te.alias(f"t_{n}") for n, (_oe, te) in virtual_cols.items()],
        F.lit(True).alias("_in_t"),
    )
    j = o.join(t, on=keys, how="full_outer")

    all_compare = compare_cols + list(virtual_cols)

    def _side(c: str, side: str) -> Column:
        # Spark forbids (in)equality on MAP columns (entry order is
        # not canonical); compare their key-sorted entry arrays —
        # equal maps compare equal, like the reference's element-wise
        # map diff (DataUtility.java:47-57)
        from pyspark.sql import types as T
        col = F.col(f"{side}_{c}")
        if isinstance(j.schema[f"{side}_{c}"].dataType, T.MapType):
            return F.array_sort(F.map_entries(col))
        return col

    neq = [
        F.when(~_side(c, "o").eqNullSafe(_side(c, "t")), F.lit(c))
        for c in all_compare
    ]
    mismatch_cols = F.filter(F.array(*neq), lambda x: x.isNotNull()) \
        if all_compare else F.array().cast("array<string>")

    out = (
        j.withColumn(MISMATCH_COLS, mismatch_cols)
        .withColumn(
            DIFF_STATUS,
            F.when(F.col("_in_o").isNull(), F.lit("extra_target"))
            .when(F.col("_in_t").isNull(), F.lit("missing_target"))
            .when(F.size(MISMATCH_COLS) > 0, F.lit("mismatch"))
            .otherwise(F.lit("valid")),
        )
        .drop("_in_o", "_in_t")
    )
    if n_buckets is not None:
        out = out.withColumn("bucket", bucket_expr(keys[0], n_buckets))
    return out


def diff_counters(diff_df: DataFrame) -> dict[str, int]:
    """Run totals in the reference's assert vocabulary
    (``SIT/cdm-assert.sh:25-33``)."""
    rows = {r[DIFF_STATUS]: r["n"]
            for r in diff_df.groupBy(DIFF_STATUS).agg(F.count("*").alias("n")).collect()}
    valid = int(rows.get("valid", 0))
    mismatch = int(rows.get("mismatch", 0))
    missing = int(rows.get("missing_target", 0))
    extra = int(rows.get("extra_target", 0))
    return {
        "read": valid + mismatch + missing,
        "valid": valid,
        "mismatch": mismatch,
        "missing": missing,
        "extra_target": extra,
        "error": 0,
    }


def per_bucket_diff(diff_df: DataFrame) -> DataFrame:
    """Per-bucket diff rollup — the engine's analog of the reference's
    per-range PASS/DIFF status (``DiffJobSession.java:166-180``)."""
    agg = (
        diff_df.groupBy("bucket").agg(
            F.sum(F.when(F.col(DIFF_STATUS) == "valid", 1).otherwise(0)).alias("valid"),
            F.sum(F.when(F.col(DIFF_STATUS) == "mismatch", 1).otherwise(0)).alias("mismatch"),
            F.sum(F.when(F.col(DIFF_STATUS) == "missing_target", 1).otherwise(0)).alias("missing"),
            F.sum(F.when(F.col(DIFF_STATUS) == "extra_target", 1).otherwise(0)).alias("extra_target"),
        )
        .withColumn(
            "status",
            F.when((F.col("mismatch") == 0) & (F.col("missing") == 0), F.lit("PASS"))
            .otherwise(F.lit("DIFF")),
        )
    )
    return agg


# seq used for autocorrect writes: ties on warc_ts must beat whatever the
# target currently stores (the reference force-reupserts the origin row,
# DiffJobSession.java:255-258,296-299)
_AUTOCORRECT_SEQ = (1 << 62)


def autocorrect(
    table: LakeTable,
    origin: DataFrame,
    diff_df: DataFrame,
    key_cols: Sequence[str] = ("url",),
    **merge_kw,
) -> tuple[MergeResult, dict[str, int]]:
    """Repair MISSING/MISMATCH rows by merging the origin truth back in.

    Never touches ``extra_target`` rows (validation never deletes,
    ``README.md:114-115``). Returns the merge result plus corrected
    counters (reference CORRECTED_MISSING / CORRECTED_MISMATCH,
    ``job/JobCounter.java:43-44``). Extra keyword args pass through to
    :meth:`LakeTable.merge_batch` — e.g. ``finalize=`` so corrected
    rows get the same winner-side derivations (text extraction) the
    migration applied.
    """
    keys = list(key_cols)
    bad = diff_df.filter(
        F.col(DIFF_STATUS).isin("missing_target", "mismatch")
    ).select(*keys, DIFF_STATUS)

    fix = origin.join(bad.select(*keys), on=keys, how="left_semi") \
        .withColumn("op", F.lit("update")) \
        .withColumn("seq", F.lit(_AUTOCORRECT_SEQ))
    result = table.merge_batch(fix, force_overwrite=True, **merge_kw)

    counts = {r[DIFF_STATUS]: r["n"] for r in
              bad.groupBy(DIFF_STATUS).agg(F.count("*").alias("n")).collect()}
    corrected = {
        "corrected_missing": int(counts.get("missing_target", 0)),
        "corrected_mismatch": int(counts.get("mismatch", 0)),
    }
    return result, corrected
