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
from cassandra_data_migrator_spark.functions.hashing import md5_int48_expr


def sample_predicate(key_col: str, percent: float,
                     salt: str = "sample") -> Column:
    """Deterministic coverage sampling: keep a key iff
    ``hash(key#salt) % 10000 < percent * 100``.

    Reference analog: coverage-percent sampled validation runs
    (``job/SplitPartitions.java:66-68``). Hash-based (not ``rand()``)
    so a sampled validation is reproducible run-over-run, every engine
    agrees on the sample (DuckDB-oracle-checkable), and all events of
    one key stay together — sampling keys, not rows.
    """
    h = md5_int48_expr(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#{salt}")))
    return F.pmod(h, F.lit(10_000)) < F.lit(int(round(percent * 100)))


def sample_predicate_sql(key_expr: str, percent: float,
                         salt: str = "sample") -> str:
    """DuckDB rendering of :func:`sample_predicate`."""
    from cassandra_data_migrator_spark.functions.hashing import md5_int48_sql
    h = md5_int48_sql(f"CAST({key_expr} AS VARCHAR) || '#{salt}'")
    return f"(({h}) % 10000 < {int(round(percent * 100))})"


def stratified_sample_predicate(
    key_col: str, stratum_col: str, rates: dict[str, float],
    default_percent: float = 0.0, salt: str = "strata",
) -> Column:
    """Per-stratum deterministic sampling — the training-corpus
    subsampling step (e.g. per-language retention budgets): keep a row
    iff ``hash(key#salt) % 10000 < rate(stratum)·100``, with
    ``default_percent`` for strata not named in ``rates``.

    Same contract as :func:`sample_predicate` (reference analog
    ``job/SplitPartitions.java:66-68``), lifted per-stratum: hash-based
    so the sample is reproducible run-over-run, engine-independent
    (DuckDB-oracle-checkable), and all events of one key land on the
    same side. One codegen predicate — a CASE over the stratum column
    against the shared key hash; no join against a rates table, so
    nothing shuffles regardless of stratum skew.
    """
    thr: Column = F.lit(int(round(default_percent * 100)))
    for k in sorted(rates, reverse=True):   # chain is order-free; fixed
        thr = F.when(F.col(stratum_col) == k,                 # for plan
                     F.lit(int(round(rates[k] * 100)))).otherwise(thr)
    h = md5_int48_expr(
        F.concat(F.col(key_col).cast("string"), F.lit(f"#{salt}")))
    return F.pmod(h, F.lit(10_000)) < thr


def stratified_sample_sql(
    key_expr: str, stratum_expr: str, rates: dict[str, float],
    default_percent: float = 0.0, salt: str = "strata",
) -> str:
    """DuckDB rendering of :func:`stratified_sample_predicate` — kept
    adjacent so the two rule sets cannot drift apart silently."""
    from cassandra_data_migrator_spark.functions.hashing import md5_int48_sql
    whens = "".join(
        f" WHEN {stratum_expr} = '{k}' THEN {int(round(rates[k] * 100))}"
        for k in sorted(rates, reverse=True))
    case = f"CASE{whens} ELSE {int(round(default_percent * 100))} END"
    h = md5_int48_sql(f"CAST({key_expr} AS VARCHAR) || '#{salt}'")
    return f"(({h}) % 10000 < {case})"


_RING_MAX = (1 << 48) - 1


def normalize_token_bounds(lo: int | None, hi: int | None,
                           native: bool = False
                           ) -> tuple[int | None, int | None]:
    """Token bounds → points on the engine's 48-bit ring.

    By default bounds carry the REFERENCE property's semantics —
    signed-64 Murmur-style tokens (``partition.min/max``,
    ``KnownProperties.java:226-227``) — and are mapped onto the ring
    measure-preservingly: the hashes differ, but a "lower half of the
    ring" slice keeps the same FRACTION of keys and complementary
    reference slices stay complementary AND disjoint here — the
    property the rerun-a-failed-slice workflow actually needs, and the
    one a sliced ``--counter`` load (non-idempotent adds) depends on.
    Disjointness needs asymmetric rounding across the 2^16 contraction:
    hi bounds round DOWN (``(v + 2^63) >> 16``) and lo bounds round UP
    (``(v + 2^63 + 0xFFFF) >> 16``), so the reference pair
    ``[min, a]`` / ``[a+1, max]`` maps to adjacent non-overlapping
    48-bit ranges for every ``a`` — a floor-only mapping would send the
    shared boundary point to BOTH slices in 65535/65536 cases and
    double-process its keys. The unit is fixed per call site, never
    guessed from the value (a range heuristic would make ``min=0``'s
    meaning depend on whether a max is present). ``native=True`` takes
    bounds already on the 48-bit ring, clamped into range."""
    def _conv(v: int | None, round_up: bool) -> int | None:
        if v is None:
            return None
        if native:
            return max(0, min(v, _RING_MAX))
        v = max(-(1 << 63), min(v, (1 << 63) - 1))
        return (v + (1 << 63) + (0xFFFF if round_up else 0)) >> 16
    return _conv(lo, True), _conv(hi, False)


def token_slice_predicate(key_col: str, lo: int | None,
                          hi: int | None, native: bool = False) -> Column:
    """Partial-range slice: keep keys whose PORTABLE 48-bit hash lies in
    ``[lo, hi]`` — the analog of the reference's
    ``spark.cdm.filter.cassandra.partition.min/max`` token bounds
    (``KnownProperties.java:226-227``; partial/rerun migrations scan
    only that slice of the ring). The Murmur3 token ring becomes the
    md5-int48 key-hash space here (0..2^48-1): deterministic, uniform,
    identical in every engine (DuckDB-replayable), and — like the
    reference's — a pure function of the key, so migrate and validate
    slice identically. Bounds are signed-64 reference tokens by
    default, mapped measure-preservingly; pass ``native=True`` for
    bounds already on the 48-bit ring
    (:func:`normalize_token_bounds`)."""
    lo, hi = normalize_token_bounds(lo, hi, native=native)
    h = md5_int48_expr(F.col(key_col).cast("string"))
    p = F.lit(True)
    if lo is not None:
        p = p & (h >= F.lit(lo))
    if hi is not None:
        p = p & (h <= F.lit(hi))
    return p


def token_slice_sql(key_expr: str, lo: int | None, hi: int | None,
                    native: bool = False) -> str:
    """DuckDB rendering of :func:`token_slice_predicate`."""
    from cassandra_data_migrator_spark.functions.hashing import md5_int48_sql
    lo, hi = normalize_token_bounds(lo, hi, native=native)
    h = md5_int48_sql(f"CAST({key_expr} AS VARCHAR)")
    parts = []
    if lo is not None:
        parts.append(f"({h}) >= {lo}")
    if hi is not None:
        parts.append(f"({h}) <= {hi}")
    return "(" + " AND ".join(parts or ["TRUE"]) + ")"


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


def split_predicates(
    df: DataFrame, config: EngineConfig
) -> tuple[DataFrame, Column, Column]:
    """The shared core of event splitting: the pre-processed frame plus
    the ``keep`` (not-skipped) and ``valid_keys`` (not-quarantined)
    predicates — so callers can either materialize three DataFrames
    (:func:`split_events`) or tag statuses for a single-pass rollup
    (``CdcPipeline``)."""
    out = df
    if config.token_min is not None or config.token_max is not None:
        # partition-range slice is a SCAN restriction, not a row
        # filter: rows outside the slice are never read in the
        # reference (no SKIPPED counter), so they are cut before the
        # counted predicates
        out = out.filter(token_slice_predicate(
            config.key_col, config.token_min, config.token_max))
    if config.column_skip_list:
        out = drop_skip_list(out, config.column_skip_list)
    if config.null_ts_default is not None and config.ts_col in out.columns:
        out = null_key_defaults(out, config.ts_col, config.null_ts_default)

    keep = writetime_window_predicate(
        config.ts_col, config.writetime_min, config.writetime_max)
    if config.skip_column and config.skip_value is not None:
        keep = keep & column_value_skip_predicate(
            config.skip_column, config.skip_value)
    if config.origin_filter_condition:
        # free-form predicate (ref OriginFilterCondition.java:25-77) —
        # a Catalyst expr, so it reaches the scan as a pushed filter
        keep = keep & F.expr(config.origin_filter_condition)
    if config.sample_percent is not None:
        keep = keep & sample_predicate(config.key_col,
                                       config.sample_percent)
    # NULL-predicate rows (e.g. `value > 50` over a NULL value) are
    # SKIPPED, not dropped: the reference's WHERE evaluation treats a
    # non-true predicate as "filter out → SKIPPED counter"
    # (OriginFilterCondition.java:25-77), and without this both
    # `filter(keep)` and `filter(~keep)` would silently lose the row.
    keep = F.coalesce(keep, F.lit(False))
    valid_keys = validity_predicate(
        [config.key_col] + ([config.ts_col] if config.null_ts_default is None
                            else [])
    )
    return out, keep, valid_keys


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
    out, keep, valid_keys = split_predicates(df, config)
    quarantined = out.filter(~valid_keys)
    kept = out.filter(valid_keys)
    return kept.filter(keep), kept.filter(~keep), quarantined


# fixed encoded widths for non-variable types (bytes) — mirrors the
# reference's codec-encoded sizes (schema/CqlTable.java:327-340)
_FIXED_WIDTHS = {
    "boolean": 1, "tinyint": 1, "smallint": 2, "int": 4, "date": 4,
    "float": 4, "bigint": 8, "double": 8, "timestamp": 8,
    "timestamp_ntz": 8,
}


def _encoded_size(df: DataFrame, c: str) -> Column:
    """Encoded byte size of one column, JVM-side. Strings/binary count
    bytes; fixed-width primitives use their codec width; collections /
    structs fall back to their JSON encoding length (a deterministic
    over-estimate, fine for a guardrail)."""
    t = df.schema[c].dataType.simpleString()
    if t in ("string", "binary"):
        return F.coalesce(F.octet_length(F.col(c)), F.lit(0))
    w = _FIXED_WIDTHS.get(t)
    if w is not None:
        return F.when(F.col(c).isNotNull(), F.lit(w)).otherwise(F.lit(0))
    if t.startswith(("array", "map", "struct")):
        return F.coalesce(F.octet_length(F.to_json(F.col(c))), F.lit(0))
    return F.coalesce(F.octet_length(F.col(c).cast("string")), F.lit(0))


def guardrail_check(
    df: DataFrame, cols: Sequence[str] | None = None,
    col_size_kb: float = 10.0,
) -> DataFrame:
    """Flag rows where any column's encoded size exceeds the threshold.

    Reference: ``feature/Guardrail.java:88-125,101-125`` encodes EVERY
    column via its codec and counts bytes (``schema/CqlTable.java:
    327-340``) — so ``cols=None`` defaults to every column, with
    fixed-width primitives contributing their codec width and
    collections their serialized length. All JVM-side expressions, no
    UDF. Adds ``guardrail_large: boolean`` and ``guardrail_max_kb:
    double``.
    """
    cols = list(cols) if cols is not None else list(df.columns)
    sizes = [_encoded_size(df, c).alias(f"_sz_{c}") for c in cols]
    largest = F.greatest(*sizes) if len(sizes) > 1 else sizes[0]
    return (
        df.withColumn("guardrail_max_kb", largest / 1024.0)
          .withColumn("guardrail_large",
                      F.col("guardrail_max_kb") > F.lit(float(col_size_kb)))
    )
