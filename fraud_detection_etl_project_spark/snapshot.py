"""Snapshot-versioned parquet tables: manifest-listed immutable data
files with atomic version commits — the minimal table-format layer
(Iceberg/Delta's core idea, re-derived from public designs) that a
100 TB parquet store needs for safe operations:

- **Atomic commits.** A writer stages data files under unique names,
  then publishes ONE manifest file and flips the ``CURRENT`` pointer
  with ``os.replace`` (atomic on POSIX). A reader resolves
  ``CURRENT`` -> manifest -> file list once at plan time; it either
  sees the old complete version or the new complete version, never a
  half-written directory listing. This is what plain
  ``mode("overwrite").parquet(path)`` cannot give: Spark's overwrite
  deletes before it writes, so a concurrent reader of the bare path
  can observe an empty or partial table.
- **Time travel.** Old manifests keep their file lists; any version
  can be read until vacuumed — reproducible training runs pin the
  snapshot version instead of copying 100 TB.
- **Compaction without downtime.** ``compact`` rewrites the current
  file set into fewer files as a NEW version; readers at older
  versions are untouched (files are immutable, commits only add).
- **Optimistic concurrency.** Commit re-checks that ``CURRENT`` still
  names the parent it planned against and refuses otherwise — the
  single-table writer-wins discipline; retries re-plan on the new
  current version.

Reference parity: the reference appends CSV rows into one Postgres
table with no versioning (`/root/reference/Lambda Function/
lambda_function_aws.py:63-99`); this module is the engine-side answer
for the parquet lake the rest of the repo writes to.

Scale posture: manifests hold only relative file names (O(#files)
metadata, no data bytes); reads hand Spark the explicit file list so
partition planning, predicate pushdown, and column pruning all apply
unchanged; vacuum is a pure metadata diff (referenced set vs listing).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
_CURRENT = "CURRENT"


class SnapshotConflictError(RuntimeError):
    """CURRENT moved between plan and publish — retry against the new
    current version."""


def _manifest_name(version: int) -> str:
    return f"v{version:05d}.json"


def _paths(table_path: str) -> tuple[str, str]:
    return os.path.join(table_path, _MANIFEST_DIR), os.path.join(table_path, _DATA_DIR)


def current_version(table_path: str) -> int | None:
    """The committed version CURRENT points at, or None for an empty /
    uninitialized table."""
    mdir, _ = _paths(table_path)
    cur = os.path.join(mdir, _CURRENT)
    if not os.path.exists(cur):
        return None
    with open(cur) as f:
        name = f.read().strip()
    return int(name[1:6])


def read_manifest(table_path: str, version: int) -> dict:
    mdir, _ = _paths(table_path)
    with open(os.path.join(mdir, _manifest_name(version))) as f:
        return json.load(f)


def _stage_data_files(df: DataFrame, table_path: str) -> list[str]:
    """Write df's partitions as parquet under data/ with globally unique
    names (stage dir -> rename). Files are immutable once named; a
    failed job leaves only unreferenced staging garbage for vacuum."""
    _, ddir = _paths(table_path)
    os.makedirs(ddir, exist_ok=True)
    stage = os.path.join(table_path, f"_staging_{uuid.uuid4().hex}")
    df.write.mode("overwrite").parquet(stage)
    names = []
    for f in sorted(os.listdir(stage)):
        if f.endswith(".parquet") and not f.startswith("_") and not f.startswith("."):
            unique = f"{uuid.uuid4().hex}-{f}"
            os.replace(os.path.join(stage, f), os.path.join(ddir, unique))
            names.append(unique)
    shutil.rmtree(stage, ignore_errors=True)
    return names


def _publish(table_path: str, files: list[str], operation: str, parent: int | None) -> int:
    """Write manifest v(parent+1) and flip CURRENT atomically, with the
    optimistic re-check."""
    mdir, _ = _paths(table_path)
    os.makedirs(mdir, exist_ok=True)
    version = 1 if parent is None else parent + 1
    manifest = {
        "version": version,
        "parent": parent,
        "operation": operation,
        "files": files,
    }
    mpath = os.path.join(mdir, _manifest_name(version))
    if os.path.exists(mpath):
        raise SnapshotConflictError(
            f"manifest v{version} already exists — another writer committed"
        )
    tmp = mpath + f".tmp{uuid.uuid4().hex}"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, mpath)
    # CURRENT flip with parent re-check (optimistic concurrency)
    if current_version(table_path) != parent:
        os.remove(mpath)
        raise SnapshotConflictError(
            f"CURRENT moved past v{parent} during commit — replan and retry"
        )
    ctmp = os.path.join(mdir, _CURRENT + f".tmp{uuid.uuid4().hex}")
    with open(ctmp, "w") as f:
        f.write(_manifest_name(version))
    os.replace(ctmp, os.path.join(mdir, _CURRENT))
    return version


def overwrite(df: DataFrame, table_path: str) -> int:
    """Commit a new version whose file set is exactly df — the previous
    version's files stay readable via time travel. Returns the version."""
    parent = current_version(table_path)
    files = _stage_data_files(df, table_path)
    return _publish(table_path, files, "overwrite", parent)


def append(df: DataFrame, table_path: str) -> int:
    """Commit a new version = parent's files + df's files. Returns the
    version."""
    parent = current_version(table_path)
    prev = read_manifest(table_path, parent)["files"] if parent else []
    files = _stage_data_files(df, table_path)
    return _publish(table_path, prev + files, "append", parent)


def read(spark: SparkSession, table_path: str, version: int | None = None) -> DataFrame:
    """Read a snapshot (CURRENT if version is None) as a DataFrame. The
    explicit file list keeps pushdown/pruning intact and pins the plan
    to the snapshot even if CURRENT advances mid-query."""
    v = current_version(table_path) if version is None else version
    if v is None:
        raise FileNotFoundError(f"snapshot table has no committed version: {table_path}")
    m = read_manifest(table_path, v)
    _, ddir = _paths(table_path)
    if not m["files"]:
        raise FileNotFoundError(f"snapshot v{v} is empty: {table_path}")
    return spark.read.parquet(*[os.path.join(ddir, f) for f in m["files"]])


def compact(spark: SparkSession, table_path: str, n_files: int) -> int:
    """Rewrite CURRENT's data into n_files files as a new version (old
    versions untouched — small-files compaction with zero reader
    downtime). Returns the new version."""
    parent = current_version(table_path)
    df = read(spark, table_path, parent).coalesce(n_files)
    files = _stage_data_files(df, table_path)
    return _publish(table_path, files, "compact", parent)


def vacuum(table_path: str, keep_versions: int = 1) -> list[str]:
    """Drop manifests older than the newest ``keep_versions`` and delete
    data files no surviving manifest references (plus any orphaned
    staging dirs). Returns the deleted file names. Time travel reaches
    only surviving versions afterwards."""
    mdir, ddir = _paths(table_path)
    cur = current_version(table_path)
    if cur is None:
        return []
    keep = set(range(max(1, cur - keep_versions + 1), cur + 1))
    referenced: set[str] = set()
    for v in keep:
        referenced.update(read_manifest(table_path, v)["files"])
    deleted = []
    for f in sorted(os.listdir(ddir)):
        if f not in referenced:
            os.remove(os.path.join(ddir, f))
            deleted.append(f)
    for m in sorted(os.listdir(mdir)):
        if m.startswith("v") and m.endswith(".json") and int(m[1:6]) not in keep:
            os.remove(os.path.join(mdir, m))
    for d in os.listdir(table_path):
        if d.startswith("_staging_"):
            shutil.rmtree(os.path.join(table_path, d), ignore_errors=True)
            deleted.append(d)
    return deleted
