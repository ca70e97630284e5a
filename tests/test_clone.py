"""Zero-copy (shallow) clone: fork a lake table at a version with no
data movement (lake/table.py clone_to/localize/external_buckets).

Contract under test: the clone reads the SOURCE's files in place,
diverges by CoW on its own merges, can never damage the source (its
vacuum walks only its own data dir), and localize() rewrites the
still-inherited buckets so the source can be vacuumed or deleted.
Reference analog: forking a dataset in the migrator is a full re-copy
(Migrate.java); this is the lake-native O(manifest) equivalent."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import types as T

from cassandra_data_migrator_spark.config import EngineConfig
from cassandra_data_migrator_spark.lake import LakeTable

UTC = dt.timezone.utc

SCHEMA = T.StructType([
    T.StructField("url", T.StringType(), False),
    T.StructField("warc_ts", T.TimestampType(), False),
    T.StructField("text", T.StringType(), True),
])

_EV = T.StructType([
    T.StructField("seq", T.LongType(), False),
    T.StructField("op", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("warc_ts", T.TimestampType(), True),
    T.StructField("text", T.StringType(), True),
])


def ts(s):
    return dt.datetime(2024, 1, 1, tzinfo=UTC) + dt.timedelta(seconds=s)


def mk(spark, rows):
    return spark.createDataFrame(
        [(q, op, u, ts(t), b) for q, op, u, t, b in rows], _EV)


def _state(df):
    return {r["url"]: r["text"] for r in df.collect()}


def _local_files(path):
    out = []
    for root, _dirs, files in os.walk(os.path.join(path, "data")):
        out += [f for f in files if f.endswith(".parquet")]
    return out


@pytest.fixture()
def source(spark, tmpdir_path):
    t = LakeTable.create(spark, os.path.join(tmpdir_path, "csrc"),
                         SCHEMA, EngineConfig(n_buckets=4))
    t.merge_batch(mk(spark, [
        (1, "insert", "a", 100, "a1"),
        (2, "insert", "b", 100, "b1"),
        (3, "insert", "c", 100, "c1"),
    ]))
    return t


def test_clone_is_zero_copy_and_reads_source_state(spark, source,
                                                   tmpdir_path):
    c = source.clone_to(os.path.join(tmpdir_path, "cl"))
    assert _state(c.read()) == _state(source.read())
    assert _local_files(c.path) == []          # no data moved
    assert c.external_buckets() != []
    assert c.manifest["cloned_from"]["table"] == source.path


def test_clone_diverges_without_touching_source(spark, source,
                                                tmpdir_path):
    c = source.clone_to(os.path.join(tmpdir_path, "cl"))
    src_v = source.version
    c.merge_batch(mk(spark, [
        (4, "update", "a", 200, "a2-clone"),
        (5, "delete", "b", 200, None),
    ]))
    assert _state(c.read()) == {"a": "a2-clone", "c": "c1"}
    source.refresh()
    assert source.version == src_v
    assert _state(source.read()) == {"a": "a1", "b": "b1", "c": "c1"}
    # untouched buckets still inherited; touched ones now clone-local
    assert len(c.external_buckets()) < 4
    assert _local_files(c.path) != []


def test_clone_vacuum_cannot_delete_source_files(spark, source,
                                                 tmpdir_path):
    c = source.clone_to(os.path.join(tmpdir_path, "cl"))
    c.merge_batch(mk(spark, [(4, "update", "a", 200, "a2")]))
    c.merge_batch(mk(spark, [(5, "update", "c", 300, "c2")]))
    before = set(_local_files(source.path))
    out = c.expire_versions(keep_last=1)
    assert set(_local_files(source.path)) == before
    assert out["manifests_removed"] >= 1
    assert _state(c.read()) == {"a": "a2", "b": "b1", "c": "c2"}
    assert _state(source.read()) == {"a": "a1", "b": "b1", "c": "c1"}


def test_localize_breaks_source_dependency(spark, source, tmpdir_path):
    import shutil

    c = source.clone_to(os.path.join(tmpdir_path, "cl"))
    want = _state(c.read())
    res = c.localize()
    assert res is not None and c.external_buckets() == []
    assert c.localize() is None                 # idempotent no-op
    # the source can now disappear entirely
    shutil.rmtree(source.path)
    assert _state(LakeTable(spark, c.path).read()) == want


def test_clone_of_clone_and_version_pin(spark, source, tmpdir_path):
    v1 = source.version
    source.merge_batch(mk(spark, [(4, "update", "a", 200, "a2")]))
    old = source.clone_to(os.path.join(tmpdir_path, "clv"), version=v1)
    assert _state(old.read()) == {"a": "a1", "b": "b1", "c": "c1"}
    # clone of a clone keeps absolute refs (no double-join corruption)
    cc = old.clone_to(os.path.join(tmpdir_path, "clcl"))
    assert _state(cc.read()) == _state(old.read())
    with pytest.raises(ValueError, match="already exists"):
        source.clone_to(os.path.join(tmpdir_path, "clv"))


def test_clone_follows_schema_registry(spark, source, tmpdir_path):
    """Inherited files were written under the source's schema ids; a
    rename on the CLONE must reconcile them by field id."""
    c = source.clone_to(os.path.join(tmpdir_path, "cl"))
    c.rename_column("text", "body")
    assert {r["url"]: r["body"] for r in c.read().collect()} == {
        "a": "a1", "b": "b1", "c": "c1"}
    source.refresh()
    assert "text" in source.read().columns      # source untouched


def test_clone_resolves_scheme_uri_entries(spark, tmpdir_path):
    """A table living on a registered URI scheme (s3-style) has
    manifest entries whose ABSOLUTE form is a scheme'd URI —
    os.path.isabs is false for those, so the resolution helpers must
    treat scheme'd entries as absolute or a shallow clone double-joins
    them into garbage paths and external_buckets() sees nothing."""
    import json

    from cassandra_data_migrator_spark.lake.fs import (
        ObjectStoreEmulatorFS,
        register_fs,
    )
    from cassandra_data_migrator_spark.lake.table import (
        _is_abs,
        _resolve_entry,
        _write_manifest,
    )

    assert _is_abs("s3://bkt/t/data/f.parquet")
    assert _is_abs("/abs/data/f.parquet")
    assert not _is_abs("data/f.parquet")
    assert _resolve_entry("s3://bkt/clone", "s3://bkt/src/data/f.parquet") \
        == "s3://bkt/src/data/f.parquet"

    register_fs("s3clone",
                lambda: ObjectStoreEmulatorFS(strip_scheme="s3clone"))
    src_path = f"s3clone://{tmpdir_path}/src"
    t = LakeTable.create(spark, src_path, SCHEMA, EngineConfig(n_buckets=4))
    # plant a committed file entry driver-side (local Spark cannot do
    # data I/O against a scheme'd path; the resolution logic under test
    # is all manifest-level)
    m = json.loads(json.dumps(t.manifest))
    m["version"], m["parent"] = 2, 1
    m["files"]["0"] = [{"path": "data/d1/part-0.parquet",
                        "schema_version": 1}]
    _write_manifest(src_path, m, fs=t.fs)
    t.refresh()

    clone = t.clone_to(f"s3clone://{tmpdir_path}/clone")
    entry = clone.manifest["files"]["0"][0]["path"]
    assert entry == f"{src_path}/data/d1/part-0.parquet"  # one join only
    assert clone.external_buckets() == [0]
    # the read path hands the inherited entry to Spark VERBATIM
    assert _resolve_entry(clone.path, entry) == entry
    # clone-of-clone keeps the already-absolute entry untouched
    clone2 = clone.clone_to(f"s3clone://{tmpdir_path}/clone2")
    assert clone2.manifest["files"]["0"][0]["path"] == entry
