"""Property-driven feature set — the reference's ``spark.cdm.feature.*``
/ ``spark.cdm.schema.origin.column.names.to.target`` surface wired to
the transform operators, so a reference ``cdm.properties`` file drives
the same row rewrites here that it drives there.

The reference's features are stateful Java classes loaded from
properties and applied per-row while binding the target statement
(``feature/ConstantColumns.java:32-148``, ``feature/ExplodeMap.java:
36-250``, ``feature/ExtractJson.java:33-159``, rename map
``data/DataUtility.java:71-140`` from
``properties/KnownProperties.java:112``). Here the same properties
compile once into a single Catalyst projection chain (rename →
explode → extract-json → constants) that runs inside whole-stage
codegen — no per-row work on the driver or in Python.

Composite target keys: the reference's ExplodeMap widens the target
primary key with the map-key column (``data/PKFactory.java:235-248``).
This engine's lake table merges on ONE key column, so an exploding
feature set synthesizes a deterministic surrogate key
``concat(key, US, map_key)`` (unit-separator joined, order-stable) and
the table is keyed on that — same uniqueness, one column.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any, Mapping

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_data_migrator_spark.operators import transforms as TR

# every property this module consumes (KnownProperties.java:112,255-285)
RENAME_KEY = "spark.cdm.schema.origin.column.names.to.target"
CONST_NAMES = "spark.cdm.feature.constantColumns.names"
CONST_VALUES = "spark.cdm.feature.constantColumns.values"
CONST_REGEX = "spark.cdm.feature.constantColumns.splitRegex"
EXPLODE_ORIGIN = "spark.cdm.feature.explodeMap.origin.name"
EXPLODE_KEY = "spark.cdm.feature.explodeMap.target.name.key"
EXPLODE_VALUE = "spark.cdm.feature.explodeMap.target.name.value"
XJSON_ORIGIN = "spark.cdm.feature.extractJson.originColumn"
XJSON_MAPPING = "spark.cdm.feature.extractJson.propertyMapping"
XJSON_OVERWRITE = "spark.cdm.feature.extractJson.overwrite"
XJSON_EXCLUSIVE = "spark.cdm.feature.extractJson.exclusive"

FEATURE_PROPERTY_KEYS = frozenset({
    RENAME_KEY, CONST_NAMES, CONST_VALUES, CONST_REGEX,
    EXPLODE_ORIGIN, EXPLODE_KEY, EXPLODE_VALUE,
    XJSON_ORIGIN, XJSON_MAPPING, XJSON_OVERWRITE, XJSON_EXCLUSIVE,
})

# surrogate-key separator: ASCII unit separator, cannot appear in the
# reference's CQL identifier-ish keys
_US = "\x1f"
SURROGATE_KEY_COL = "_cdm_pk"


def _unquote(name: str) -> str:
    """Strip CQL identifier quoting (``"key-name"`` → ``key-name``) —
    the reference's ``CqlTable.unFormatNames``."""
    name = name.strip()
    if len(name) >= 2 and name[0] == '"' and name[-1] == '"':
        return name[1:-1].replace('""', '"')
    return name


def parse_rename_map(v: str) -> dict[str, str]:
    """``"key-name":key_name,colA:col_a`` → ``{origin: target}``
    (``DataUtility.java:71-140``)."""
    out: dict[str, str] = {}
    for pair in v.split(","):
        pair = pair.strip()
        if not pair:
            continue
        o, sep, t = pair.partition(":")
        if not sep:
            raise ValueError(f"rename entry {pair!r} is not origin:target")
        out[_unquote(o)] = _unquote(t)
    return out


_INT_RE = re.compile(r"^[+-]?\d+$")
_FLOAT_RE = re.compile(r"^[+-]?(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?$")


def parse_cql_literal(tok: str) -> tuple[Any, str]:
    """One CQL-ish constant literal → ``(python value, spark type ddl)``.

    The reference binds constant values as raw CQL literals
    (``ConstantColumns.java:126-148``); the equivalents here:
    ``'text'`` → string, ``true/false`` → boolean, integers → int
    (bigint when out of int range), decimals → double, ``null`` → null
    string.
    """
    tok = tok.strip()
    if len(tok) >= 2 and tok[0] == "'" and tok[-1] == "'":
        return tok[1:-1].replace("''", "'"), "string"
    low = tok.lower()
    if low in ("true", "false"):
        return low == "true", "boolean"
    if low == "null":
        return None, "string"
    if _INT_RE.match(tok):
        i = int(tok)
        return i, ("int" if -(2**31) <= i < 2**31 else "bigint")
    if _FLOAT_RE.match(tok):
        return float(tok), "double"
    raise ValueError(f"cannot parse constant literal {tok!r}")


def parse_constants(names: str, values: str,
                    split_regex: str = ",") -> dict[str, tuple[Any, str]]:
    """names + regex-split values → ``{name: (value, ddl)}``
    (``ConstantColumns.java:130-148``; regex default matches the
    reference's shipped ``cdm-detailed.properties`` examples)."""
    ns = [_unquote(n) for n in names.split(",") if n.strip()]
    vs = [v for v in re.split(split_regex, values)] if values else []
    if len(ns) != len(vs):
        raise ValueError(
            f"constantColumns.names has {len(ns)} entries but values "
            f"split into {len(vs)} (splitRegex={split_regex!r})")
    return {n: parse_cql_literal(v) for n, v in zip(ns, vs)}


@dataclass(frozen=True)
class FeatureSet:
    """Compiled per-migration feature chain.

    Application order mirrors the reference's row construction: the
    rename map resolves origin names to target names first (every later
    feature is configured in target terms), ExplodeMap fans rows out,
    ExtractJson derives its column, constants are appended last.
    """

    rename: Mapping[str, str] = field(default_factory=dict)
    constants: Mapping[str, tuple[Any, str]] = field(default_factory=dict)
    # (map_col_target_name, key_col_name, value_col_name)
    explode: tuple[str, str, str] | None = None
    # (origin_col, json_field, target_col, overwrite, exclusive)
    extract_json: tuple[str, str, str, bool, bool] | None = None

    def __bool__(self) -> bool:
        return bool(self.rename or self.constants or self.explode
                    or self.extract_json)

    # ------------------------------------------------------------ keys

    def target_key_col(self, origin_key: str) -> str:
        """The merge/partition key of the TARGET table: the renamed key
        column, widened to the surrogate composite when ExplodeMap is on
        (reference PK widening, ``PKFactory.java:235-248``)."""
        if self.explode is not None:
            return SURROGATE_KEY_COL
        return self.rename.get(origin_key, origin_key)

    # ------------------------------------------------------- transform

    def transform(self, df: DataFrame, origin_key: str | None = None,
                  keep_cols: tuple[str, ...] = ("op", "seq", "warc_ts"),
                  ) -> DataFrame:
        """Apply the whole chain; pass ``origin_key`` to also add the
        surrogate key column when exploding. ``keep_cols`` names engine
        bookkeeping columns (op / seq / event-time) an ``exclusive``
        extract-json projection must ride along — callers with
        non-default column names pass their own."""
        out = df
        if self.rename:
            out = TR.rename_columns(
                out, {o: t for o, t in self.rename.items()
                      if o in out.columns})
        if self.explode is not None:
            map_col, key_name, value_name = self.explode
            map_col = self.rename.get(map_col, map_col)
            out = TR.explode_map(out, map_col, key_name, value_name)
        if self.extract_json is not None:
            origin_col, fieldname, target_col, overwrite, exclusive = \
                self.extract_json
            origin_col = self.rename.get(origin_col, origin_col)
            out = TR.extract_json(out, origin_col, f"$.{fieldname}",
                                  target_col, overwrite=overwrite)
            if exclusive:
                # exclusive: the target receives only PK + extracted
                # column (cdm-detailed.properties:447-449)
                keep = {target_col}
                if origin_key is not None:
                    keep.add(self.rename.get(origin_key, origin_key))
                # engine bookkeeping columns ride along
                keep |= {c for c in keep_cols if c in out.columns}
                out = out.select(*[c for c in out.columns if c in keep])
        if self.constants:
            out = TR.constant_columns(out, self.constants)
        if self.explode is not None and origin_key is not None:
            key = self.rename.get(origin_key, origin_key)
            out = out.withColumn(
                SURROGATE_KEY_COL,
                F.concat_ws(_US, F.col(key).cast("string"),
                            F.col(self.explode[1]).cast("string")))
        return out


def build_featureset(props: Mapping[str, str]) -> FeatureSet:
    """Compile the feature properties out of a parsed ``spark.cdm.*``
    map (non-feature keys ignored)."""
    rename = parse_rename_map(props[RENAME_KEY]) if RENAME_KEY in props \
        else {}
    constants: dict[str, tuple[Any, str]] = {}
    if CONST_NAMES in props or CONST_VALUES in props:
        constants = parse_constants(
            props.get(CONST_NAMES, ""), props.get(CONST_VALUES, ""),
            props.get(CONST_REGEX, ","))
    explode = None
    if EXPLODE_ORIGIN in props:
        if EXPLODE_KEY not in props or EXPLODE_VALUE not in props:
            raise ValueError(
                "explodeMap requires origin.name, target.name.key and "
                "target.name.value (ExplodeMap.java:36-97)")
        explode = (_unquote(props[EXPLODE_ORIGIN]),
                   _unquote(props[EXPLODE_KEY]),
                   _unquote(props[EXPLODE_VALUE]))
    extract_json = None
    if XJSON_ORIGIN in props or XJSON_MAPPING in props:
        if XJSON_ORIGIN not in props or XJSON_MAPPING not in props:
            raise ValueError(
                "extractJson requires both originColumn and "
                "propertyMapping (ExtractJson.java:75-90)")
        mapping = _unquote(props[XJSON_MAPPING])
        fieldname, sep, target = mapping.partition(":")
        if not sep:
            # single token = field name doubles as target column
            # (ExtractJson.java:56-63)
            fieldname = target = mapping
        lit = props.get(XJSON_OVERWRITE, "false").strip().lower()
        excl = props.get(XJSON_EXCLUSIVE, "false").strip().lower()
        extract_json = (_unquote(props[XJSON_ORIGIN]), fieldname,
                        _unquote(target),
                        lit in ("true", "1", "yes"),
                        excl in ("true", "1", "yes"))
    return FeatureSet(rename=rename, constants=constants,
                      explode=explode, extract_json=extract_json)
