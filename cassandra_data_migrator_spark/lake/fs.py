"""Minimal filesystem interface for lake-table METADATA I/O.

Data files are always read/written by Spark itself (any Hadoop-visible
URI works there already); only the manifest/side-table bookkeeping the
driver performs — tiny JSON/parquet files — goes through this
interface. Routing it through one seam means pointing a table at an
object store is a matter of registering a scheme, not rewriting
``LakeTable``.

Semantics the table layer relies on:

- ``create_exclusive`` — atomic create-if-absent (the commit-conflict
  detector; local: ``O_CREAT|O_EXCL``; object stores: conditional PUT
  e.g. S3 ``If-None-Match``).
- ``replace`` — atomic pointer swap for the LATEST file (local:
  ``os.replace``; object stores: plain PUT, which is atomic per key).

Local filesystem is the default and only built-in; register others via
:func:`register_fs`.
"""

from __future__ import annotations

import os
import uuid
from typing import Callable


class LocalFS:
    """POSIX-backed implementation (the test/bench default)."""

    def makedirs(self, path: str) -> None:
        os.makedirs(path, exist_ok=True)

    def exists(self, path: str) -> bool:
        return os.path.exists(path)

    def isdir(self, path: str) -> bool:
        return os.path.isdir(path)

    def listdir(self, path: str) -> list[str]:
        return sorted(os.listdir(path))

    def read_text(self, path: str) -> str:
        with open(path) as f:
            return f.read()

    def create_exclusive(self, path: str, data: str) -> None:
        """Atomically create ``path`` with ``data``; raise
        ``FileExistsError`` if it already exists (commit conflict)."""
        fd = os.open(path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        with os.fdopen(fd, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())

    def replace(self, path: str, data: str) -> None:
        """Atomically (over)write ``path`` with ``data`` via a temp file
        + rename — readers never observe a partial write."""
        d = os.path.dirname(path)
        tmp = os.path.join(d, f".{os.path.basename(path)}.{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def write_bytes(self, path: str, data: bytes) -> None:
        """(Over)write a small binary object (driver-side side-table
        appends). Atomic via temp+rename; object stores: plain PUT."""
        d = os.path.dirname(path)
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".{os.path.basename(path)}.{uuid.uuid4().hex}")
        with open(tmp, "wb") as f:
            f.write(data)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    def delete(self, path: str) -> None:
        """Delete one file/object; missing is not an error (GC retry)."""
        try:
            os.remove(path)
        except FileNotFoundError:
            pass

    def rmdir(self, path: str) -> None:
        """Remove an empty directory; no-op for object stores (no dirs)
        and for non-empty/missing local dirs."""
        try:
            os.rmdir(path)
        except OSError:
            pass


_REGISTRY: dict[str, Callable[[], object]] = {"file": LocalFS}


def register_fs(scheme: str, factory: Callable[[], object]) -> None:
    """Register a filesystem implementation for a URI scheme
    (e.g. ``register_fs("s3", lambda: S3FS(...))``)."""
    _REGISTRY[scheme] = factory


def get_fs(path: str):
    """Resolve the filesystem for a table path. Bare paths are local."""
    scheme = path.split("://", 1)[0] if "://" in path else "file"
    factory = _REGISTRY.get(scheme)
    if factory is None:
        raise NotImplementedError(
            f"no filesystem registered for scheme {scheme!r} "
            f"(register one with cassandra_data_migrator_spark.lake.fs."
            f"register_fs)")
    return factory()
