"""Hashing / bucketing / checksum expressions.

The reference partitions work by Cassandra token ranges:
``TOKEN(pk) >= ? AND TOKEN(pk) <= ?``
(``cql/statement/OriginSelectByPartitionRangeStatement.java:52-56``),
splitting the Murmur3 ring into ``numParts`` BigInteger ranges
(``job/SplitPartitions.java:32-76``). We own the ring, so Murmur3
parity is unnecessary: the bucket of a key is ``pmod(xxhash64(key), N)``
— computed JVM-side inside whole-stage codegen, and usable both as a
shuffle partitioning key and as a storage partition column that Catalyst
prunes on.

Checksums are order-insensitive per-bucket sums of row hashes
(``sum(xxhash64(cols))``) so they can be computed partition-parallel
with a map-side partial aggregate and compared origin-vs-target —
the engine's strengthened version of the reference's per-range
PASS/DIFF status (``cql/statement/TargetUpsertRunDetailsStatement.java:207-216``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def bucket_expr(key_col: str | Column, n_buckets: int) -> Column:
    """Hash bucket of a key: non-negative ``pmod(xxhash64(key), n)``.

    Spark analog of the reference token-range id
    (``job/PartitionRange.java:23-51``).
    """
    col = F.col(key_col) if isinstance(key_col, str) else key_col
    return F.pmod(F.xxhash64(col), F.lit(n_buckets)).cast("int")


def row_checksum_expr(*cols: str | Column) -> Column:
    """64-bit row hash over the given columns (null-stable).

    xxhash64 hashes nulls deterministically, so MISSING vs null-valued
    rows still differ via the row-count component of the lineage row.
    """
    cs = [F.col(c) if isinstance(c, str) else c for c in cols]
    return F.xxhash64(*cs)


def hash_safe_cols(schema, cols: "list[str]") -> "list[Column]":
    """Checksum inputs with map columns canonicalized.

    Spark forbids hashing MAP values (map equality is entry-order-
    insensitive but hashcodes are not); a map column contributes its
    key-sorted entry array instead — deterministic, order-canonical,
    and equal maps hash equal. Non-map columns pass through.
    """
    from pyspark.sql import types as T
    out = []
    for c in cols:
        if isinstance(schema[c].dataType, T.MapType):
            out.append(F.array_sort(F.map_entries(F.col(c))))
        else:
            out.append(F.col(c))
    return out


def checksum_agg_expr(*cols: str | Column) -> Column:
    """Order-insensitive aggregate checksum: ``bit_xor(xxhash64(cols))``.

    XOR-folded, so the result stays a plain 64-bit long at ANY group
    size (no ANSI-overflow risk, unlike a sum) and renders identically
    in every engine (DuckDB ``bit_xor`` over BIGINT gives the same
    value) — the canonical cross-engine per-bucket checksum. Paired
    with the bucket row count in lineage rows, it detects any
    single-row difference; duplicate full rows cancelling under XOR are
    caught by the count.
    """
    return F.bit_xor(row_checksum_expr(*cols))


def md5_int48_expr(col: str | Column, salt: int | None = None) -> Column:
    """Portable 48-bit integer hash: first 12 hex chars of md5 as a long.

    Identical value is computable in DuckDB as
    ``CAST(('0x' || substr(md5(x), 1, 12)) AS BIGINT)`` — used wherever an
    oracle-checkable hash is needed (minhash, simhash, fingerprints).
    xxhash64 stays the engine-internal hash (faster, 64-bit) where no
    cross-engine parity is required.
    """
    c = F.col(col) if isinstance(col, str) else col
    x = c.cast("string") if salt is None else F.concat(
        c.cast("string"), F.lit(f"#{salt}"))
    return F.conv(F.substring(F.md5(x), 1, 12), 16, 10).cast("long")


def md5_int48_sql(expr: str, salt: int | None = None) -> str:
    """DuckDB rendering of :func:`md5_int48_expr` for oracle queries."""
    x = f"CAST({expr} AS VARCHAR)" if salt is None else \
        f"(CAST({expr} AS VARCHAR) || '#{salt}')"
    return f"CAST(('0x' || substr(md5({x}), 1, 12)) AS BIGINT)"


def salted_partition_exprs(
    key_col: str, n_buckets: int, salt_buckets: int
) -> list[Column]:
    """Partitioning expressions that break hot-key skew by salting.

    A hot key (one domain producing most of a batch — north_rule skew
    case) would put its whole bucket on one task. Repartitioning by
    ``(bucket, salt)`` where ``salt = pmod(xxhash64(key, seq-ish rand), S)``
    splits a hot bucket across ``S`` tasks. Use for pre-MERGE transform
    stages (extraction UDFs) where rows are independent; the final
    per-bucket write re-gathers by bucket alone.

    Reference analog: the double ``Collections.shuffle`` of splits
    (``job/SplitPartitions.java:36-37``) — load-levelling, but at
    range granularity only; salting levels *within* a range.
    """
    bucket = bucket_expr(key_col, n_buckets)
    # deterministic salt: spread rows of one key by a secondary hash of
    # monotonically_increasing_id so replays stay reproducible per-partition
    salt = F.pmod(F.xxhash64(F.col(key_col), F.monotonically_increasing_id()),
                  F.lit(salt_buckets)).cast("int")
    return [bucket, salt]
