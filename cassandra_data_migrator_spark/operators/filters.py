"""Origin-side filters + guardrail (reference §2.3 F1-F7).

The reference applies these per-row in the scan loop
(``cql/statement/OriginSelectStatement.java:86-151``); here each is a
Catalyst predicate so pushdown/pruning is free, and "skipped" rows are
split off as DataFrames (counted, optionally quarantined) instead of
silently dropped — reproducing the reference's SKIPPED counter
(``job/JobCounter.java:36``).
"""

from __future__ import annotations

from datetime import datetime
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.config import EngineConfig


def writetime_window_predicate(
    ts_col: str, lo: datetime | None, hi: datetime | None
) -> Column:
    """Keep rows with ``lo <= ts <= hi`` (reference writetime filter,
    ``OriginSelectStatement.java:117-129``). Open bounds allowed."""
    p = F.lit(True)
    if lo is not None:
        p = p & (F.col(ts_col) >= F.lit(lo))
    if hi is not None:
        p = p & (F.col(ts_col) <= F.lit(hi))
    return p


def column_value_skip_predicate(col: str, value: str) -> Column:
    """Keep rows where ``upper(trim(col)) != upper(value)`` — the
    reference's case-insensitive skip-if-equal filter
    (``OriginSelectStatement.java:108-115,141-151``). Null values are kept
    (null never equals the skip value)."""
    return ~F.upper(F.trim(F.col(col))).eqNullSafe(F.upper(F.lit(value)))


def validity_predicate(key_cols: Sequence[str]) -> Column:
    """Non-null key columns (reference no-null-PK rule,
    ``data/EnhancedPK.java:124-143``)."""
    p = F.lit(True)
    for k in key_cols:
        p = p & F.col(k).isNotNull()
    return p


def null_key_defaults(df: DataFrame, ts_col: str,
                      default: datetime) -> DataFrame:
    """Replace a null timestamp key part with a configured default so the
    row stays insertable (reference null-PK replacement,
    ``schema/CqlTable.java:375-400``; SIT/regression/04_null_ts_in_pk).

    The default literal is cast to the column's own type so
    ``timestamp_ntz`` columns stay ntz (no session-timezone coupling).
    """
    dt = df.schema[ts_col].dataType
    return df.withColumn(
        ts_col, F.coalesce(F.col(ts_col), F.lit(default).cast(dt))
    )


def drop_skip_list(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Column skip-list (``schema/CqlTable.java:479-483``)."""
    return df.drop(*cols)


def split_events(
    df: DataFrame, config: EngineConfig
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Apply all configured origin filters at once.

    Returns ``(valid, skipped, quarantined)``:
    - ``skipped``      — failed writetime-window or column-value filter
      (deliberate exclusions; reference SKIPPED counter)
    - ``quarantined``  — null key column (reference error records); if
      ``config.null_ts_default`` is set, null *timestamps* are defaulted
      instead of quarantined.
    One pass, no shuffle; the three outputs share the scan via Catalyst.
    """
    out = df
    if config.column_skip_list:
        out = drop_skip_list(out, config.column_skip_list)
    if config.null_ts_default is not None and config.ts_col in out.columns:
        out = null_key_defaults(out, config.ts_col, config.null_ts_default)

    keep = writetime_window_predicate(
        config.ts_col, config.writetime_min, config.writetime_max)
    if config.skip_column and config.skip_value is not None:
        keep = keep & column_value_skip_predicate(
            config.skip_column, config.skip_value)
    valid_keys = validity_predicate(
        [config.key_col] + ([config.ts_col] if config.null_ts_default is None
                            else [])
    )
    quarantined = out.filter(~valid_keys)
    kept = out.filter(valid_keys)
    return kept.filter(keep), kept.filter(~keep), quarantined


def guardrail_check(
    df: DataFrame, cols: Sequence[str], col_size_kb: float
) -> DataFrame:
    """Flag rows where any column's encoded size exceeds the threshold.

    Reference: ``feature/Guardrail.java:88-125`` encodes every column via
    its codec and counts bytes (``schema/CqlTable.java:327-340``); Spark
    equivalent is ``octet_length`` (binary/string) — JVM-side, no UDF.
    Adds ``guardrail_large: boolean`` and ``guardrail_max_kb: double``.
    """
    sizes = [
        F.coalesce(F.octet_length(F.col(c)), F.lit(0)).alias(f"_sz_{c}")
        for c in cols
    ]
    largest = F.greatest(*sizes) if len(sizes) > 1 else sizes[0]
    return (
        df.withColumn("guardrail_max_kb", largest / 1024.0)
          .withColumn("guardrail_large",
                      F.col("guardrail_max_kb") > F.lit(float(col_size_kb)))
    )
