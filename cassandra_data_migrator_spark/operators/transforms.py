"""Projection / per-row transform operators (reference §2.4 T1-T9).

Every reference "feature" that rewrites rows on the copy path maps to a
built-in Catalyst expression here — no UDFs, so the whole transform
stage stays inside whole-stage codegen. Reference features live under
``src/main/java/com/datastax/cdm/feature/``.
"""

from __future__ import annotations

from typing import Any, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def rename_columns(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Origin→target column-name map (T1).

    Reference: corresponding-index rename map built from
    ``spark.cdm.schema.origin.column.names.to.target``
    (``data/DataUtility.java:71-140``; ``schema/CqlTable.java:408-428``).
    """
    return df.withColumnsRenamed(dict(mapping))


def cast_columns(df: DataFrame, casts: Mapping[str, str]) -> DataFrame:
    """Type-cast transform (T2): ``{col: type_ddl}``.

    Replaces the reference's codec engine for primitive↔primitive
    conversions (``data/CqlConversion.java:262-288``,
    ``cql/codec/CodecFactory.java:29-64``) with Catalyst ``cast``.
    """
    return df.withColumns({c: F.col(c).cast(t) for c, t in casts.items()})


def parse_timestamp(df: DataFrame, col: str, fmt: str,
                    out: str | None = None) -> DataFrame:
    """String→timestamp with an explicit pattern (T2, codec
    ``TIMESTAMP_StringFormatCodec.java:33-47`` — e.g. 'yyMMddHHmmss')."""
    return df.withColumn(out or col, F.to_timestamp(F.col(col), fmt))


def format_timestamp(df: DataFrame, col: str, fmt: str,
                     out: str | None = None) -> DataFrame:
    """Timestamp→string (the codec's encode direction)."""
    return df.withColumn(out or col, F.date_format(F.col(col), fmt))


def constant_columns(df: DataFrame,
                     constants: Mapping[str, tuple[Any, str]]) -> DataFrame:
    """Add literal-valued target columns (T3): ``{name: (value, type_ddl)}``.

    Reference: ``feature/ConstantColumns.java:32-148`` (values may even be
    part of the target PK — here they can join the key expression freely).
    """
    return df.withColumns(
        {name: F.lit(v).cast(t) for name, (v, t) in constants.items()}
    )


def explode_map(df: DataFrame, map_col: str, key_name: str, value_name: str,
                drop_map: bool = True) -> DataFrame:
    """Fan out one row per map entry (T4) — the reference's single
    row-multiplying operator (``feature/ExplodeMap.java:181-201``;
    fan-out ``data/PKFactory.java:235-248``). SIT/features/02_explode_map:
    3 origin rows × 4 entries → 12 target rows."""
    out = df.select(
        "*", F.explode(F.col(map_col)).alias(key_name, value_name)
    )
    return out.drop(map_col) if drop_map else out


def extract_json(df: DataFrame, json_col: str, json_path: str, out_col: str,
                 overwrite: bool = True) -> DataFrame:
    """Pluck one property from a JSON text column (T5).

    Reference: ``feature/ExtractJson.java:132-138``; the
    ``overwrite=False`` variant keeps an existing target value and only
    fills nulls (``DiffJobSession.java:265-270`` skip semantics).
    """
    extracted = F.get_json_object(F.col(json_col), json_path)
    if not overwrite and out_col in df.columns:
        extracted = F.coalesce(F.col(out_col), extracted)
    return df.withColumn(out_col, extracted)


def row_writetime(cols: Sequence[str], increment: int = 0) -> Column:
    """Row-level writetime = max over eligible columns (+ optional
    increment) — T6/A1 (``feature/WritetimeTTL.java:235-258``; the
    increment is the duplicate-timestamp mitigation at :167-172)."""
    m = F.greatest(*[F.col(c) for c in cols]) if len(cols) > 1 \
        else F.col(cols[0])
    if increment:
        m = m + F.expr(f"INTERVAL {increment} MILLISECOND")
    return m


def row_ttl(cols: Sequence[str]) -> Column:
    """Row-level TTL = max over eligible columns' TTL values (seconds) —
    the TTL half of WritetimeTTL (``feature/WritetimeTTL.java:104-177``:
    ``max(TTL(col))`` across configured columns, written ``USING TTL``,
    ``cql/statement/TargetUpsertStatement.java:113-130``)."""
    return F.greatest(*[F.col(c) for c in cols]) if len(cols) > 1 \
        else F.col(cols[0])


def ttl_expiry(df: DataFrame, ts_col: str, ttl_secs: Column | str,
               out: str = "expires_at") -> DataFrame:
    """Materialize the row's expiry instant: ``ts + TTL seconds``.

    Cassandra stores TTL per cell and expires server-side; the lake
    analog is an explicit ``expires_at`` column computed at write time
    and honored at read time (``LakeTable.read(as_of=...)`` filters
    expired rows). Null TTL ⇒ null expiry ⇒ the row never expires —
    matching Cassandra's "no TTL" semantics
    (``feature/WritetimeTTL.java:259-281``).
    """
    t = F.col(ttl_secs) if isinstance(ttl_secs, str) else ttl_secs
    return (
        df.withColumn("_ttl_secs", t.cast("long"))
        # timestampadd works directly on timestamp_ntz (no session-TZ
        # round trip) and propagates a null TTL to a null expiry
        .withColumn(out, F.expr(f"timestampadd(SECOND, _ttl_secs, {ts_col})"))
        .drop("_ttl_secs")
    )


def cast_array_elements(df: DataFrame, col: str, type_ddl: str,
                        out: str | None = None) -> DataFrame:
    """Element-wise LIST/SET conversion (T2 collections): cast every
    element of an array column (``data/CqlConversion.java:290-321``,
    codecs ``cql/codec/Codecset.java:18-21``; SIT/features/03_codec).
    Pure ``F.transform`` — stays inside codegen, no UDF."""
    return df.withColumn(
        out or col, F.transform(F.col(col), lambda x: x.cast(type_ddl)))


def cast_map_values(df: DataFrame, col: str, type_ddl: str,
                    out: str | None = None) -> DataFrame:
    """Value-wise MAP conversion (``data/CqlConversion.java:322-347``)."""
    return df.withColumn(
        out or col, F.transform_values(F.col(col),
                                       lambda _k, v: v.cast(type_ddl)))


def cast_map_keys(df: DataFrame, col: str, type_ddl: str,
                  out: str | None = None) -> DataFrame:
    """Key-wise MAP conversion (same reference path as values)."""
    return df.withColumn(
        out or col, F.transform_keys(F.col(col),
                                     lambda k, _v: k.cast(type_ddl)))


def map_struct_fields(
    df: DataFrame, col: str,
    mapping: Mapping[str, tuple[str, str]],
    out: str | None = None,
) -> DataFrame:
    """UDT→UDT mapper: build a new struct from an existing one with
    per-field rename + cast — the reference's field-wise UDT conversion
    (``data/CqlConversion.java:348-375``; SIT/features/04_udt_mapper).
    ``mapping`` is ``{new_field: (old_field, type_ddl)}``.
    """
    s = F.struct(*[
        F.col(f"{col}.{old}").cast(t).alias(new)
        for new, (old, t) in mapping.items()
    ])
    return df.withColumn(out or col, s)


def _struct_involved(dt) -> bool:
    import pyspark.sql.types as T
    if isinstance(dt, T.StructType):
        return True
    if isinstance(dt, T.ArrayType):
        return _struct_involved(dt.elementType)
    if isinstance(dt, T.MapType):
        return _struct_involved(dt.keyType) or _struct_involved(dt.valueType)
    return False


def _positionally_alignable(src, tgt) -> bool:
    """True when two types agree structurally enough for a positional
    field-wise cast: struct arities match at every nesting level and
    container kinds line up (scalar leaves are left to Cast's own
    analysis-time rules)."""
    import pyspark.sql.types as T
    if isinstance(src, T.StructType) or isinstance(tgt, T.StructType):
        return (isinstance(src, T.StructType)
                and isinstance(tgt, T.StructType)
                and len(src.fields) == len(tgt.fields)
                and all(_positionally_alignable(a.dataType, b.dataType)
                        for a, b in zip(src.fields, tgt.fields)))
    if isinstance(src, T.ArrayType) or isinstance(tgt, T.ArrayType):
        return (isinstance(src, T.ArrayType)
                and isinstance(tgt, T.ArrayType)
                and _positionally_alignable(src.elementType,
                                            tgt.elementType))
    if isinstance(src, T.MapType) or isinstance(tgt, T.MapType):
        return (isinstance(src, T.MapType) and isinstance(tgt, T.MapType)
                and _positionally_alignable(src.keyType, tgt.keyType)
                and _positionally_alignable(src.valueType, tgt.valueType))
    return True


def auto_map_structs(df: DataFrame, target_schema) -> DataFrame:
    """Automatic field-wise UDT mapping: every column whose source type
    is a struct (or list/set/map of structs) that differs from the
    same-named target column's struct shape is rebuilt POSITIONALLY —
    field i renamed to the target's field i name and cast to its type,
    recursively through collections.

    The reference does this with no configuration at all
    (``data/CqlConversion.java:290-326`` — origin UDT → target UDT
    conversion by field index; ``SIT/features/04_udt_mapper`` exercises
    it over a bare keyspaceTable-only properties file), so this stage
    runs on every migrate/validate leg, independent of the feature
    properties. Scalar column mismatches stay codec-gated
    (:func:`apply_codecs`) — only struct-involving types auto-map,
    because a UDT's identity is its SHAPE, not its (engine-less here)
    type name. Shapes that don't align positionally (differing arity)
    are left untouched for the sink's own loud schema error. Spark's
    ``Cast`` handles struct→struct positionally, so the whole mapping
    is one codegen'd projection — no extra shuffle, no Python.
    ``map_struct_fields`` remains for explicit non-positional per-field
    remaps."""
    tmap = {f.name: f.dataType for f in target_schema.fields}
    out_cols: dict[str, Column] = {}
    for f in df.schema.fields:
        tgt = tmap.get(f.name)
        if tgt is None or tgt == f.dataType:
            continue
        if not (_struct_involved(f.dataType) and _struct_involved(tgt)):
            continue
        if _positionally_alignable(f.dataType, tgt):
            out_cols[f.name] = F.col(f.name).cast(tgt)
    return df.withColumns(out_cols) if out_cols else df


def apply_codecs(df: DataFrame, target_schema, codecs: Sequence[str],
                 ts_format: str | None = None,
                 ts_zone: str = "UTC") -> DataFrame:
    """Reconcile mismatched origin→target column types using the
    enabled codec families — the declarative analog of the reference's
    codec registry (``spark.cdm.transform.codecs``,
    ``cql/codec/CodecFactory.java:29-64``, ``Codecset.java``): a codec
    only engages for a column whose source type ≠ target type AND whose
    (source, target) pair belongs to an enabled family. Unrecognized
    mismatches are left for the sink's own cast/error path, matching
    the reference's "no codec registered" failure mode.

    ``TIMESTAMP_STRING_FORMAT`` uses ``ts_format``/``ts_zone``
    (``TIMESTAMP_StringFormatCodec.java:33-47``): the string is a local
    datetime in ``ts_zone``; ``TIMESTAMP_STRING_MILLIS`` strings are
    epoch milliseconds (``TIMESTAMP_StringMillisCodec.java``).
    """
    import pyspark.sql.types as T

    fam = {c.strip().upper() for c in codecs}
    tmap = {f.name: f.dataType for f in target_schema.fields}
    # cast-only families: (source type, target type) → required family
    _num = {
        (T.IntegerType, T.StringType): "INT_STRING",
        (T.StringType, T.IntegerType): "INT_STRING",
        (T.DoubleType, T.StringType): "DOUBLE_STRING",
        (T.StringType, T.DoubleType): "DOUBLE_STRING",
        (T.LongType, T.StringType): "BIGINT_STRING",
        (T.StringType, T.LongType): "BIGINT_STRING",
        (T.StringType, T.BinaryType): "STRING_BLOB",
        (T.BinaryType, T.StringType): "STRING_BLOB",
    }
    out_cols: dict[str, Column] = {}
    for f in df.schema.fields:
        tgt = tmap.get(f.name)
        if tgt is None or tgt == f.dataType:
            continue
        src_t, c = f.dataType, F.col(f.name)
        if isinstance(tgt, T.TimestampType) and isinstance(src_t,
                                                           T.StringType):
            if "TIMESTAMP_STRING_FORMAT" in fam and ts_format:
                out_cols[f.name] = F.to_utc_timestamp(
                    F.to_timestamp(c, ts_format), ts_zone)
            elif "TIMESTAMP_STRING_MILLIS" in fam:
                out_cols[f.name] = F.timestamp_millis(c.cast("long"))
        elif isinstance(src_t, T.TimestampType) and isinstance(
                tgt, T.StringType):
            if "TIMESTAMP_STRING_FORMAT" in fam and ts_format:
                out_cols[f.name] = F.date_format(
                    F.from_utc_timestamp(c, ts_zone), ts_format)
            elif "TIMESTAMP_STRING_MILLIS" in fam:
                out_cols[f.name] = F.unix_millis(c).cast("string")
        elif isinstance(tgt, T.DecimalType) and isinstance(src_t,
                                                           T.StringType):
            if "DECIMAL_STRING" in fam:
                out_cols[f.name] = c.cast(tgt)
        elif isinstance(src_t, T.DecimalType) and isinstance(
                tgt, T.StringType):
            if "DECIMAL_STRING" in fam:
                out_cols[f.name] = c.cast("string")
        else:
            need = _num.get((type(src_t), type(tgt)))
            if need is not None and need in fam:
                out_cols[f.name] = c.cast(tgt)
    return df.withColumns(out_cols) if out_cols else df


def map_null_scrub(df: DataFrame, map_col: str) -> DataFrame:
    """Drop map entries whose value is null (T8,
    ``schema/CqlTable.java:348-350,369-373``)."""
    return df.withColumn(
        map_col, F.map_filter(F.col(map_col), lambda _k, v: v.isNotNull())
    )


def coalesce_unset_nulls(src: DataFrame, existing: DataFrame,
                         key_cols: Sequence[str],
                         data_cols: Sequence[str]) -> DataFrame:
    """Standalone UNSET-null projection (T9): null source fields take the
    existing target value instead of overwriting
    (``cql/statement/TargetInsertStatement.java:82-85``; README.md:181).
    The merge path implements this inline (``LakeTable.merge_batch``
    ``unset_nulls=True``); this variant serves plain batch copies."""
    keys = list(key_cols)
    ex = existing.select(
        *keys, *[F.col(c).alias(f"_ex_{c}") for c in data_cols])
    j = src.join(ex, on=keys, how="left")
    out = j.withColumns(
        {c: F.coalesce(F.col(c), F.col(f"_ex_{c}")) for c in data_cols}
    )
    return out.drop(*[f"_ex_{c}" for c in data_cols])
