"""Versioned table snapshots with time travel (Nessie/Iceberg analog).

The reference gets snapshot history for free from Nessie commits on Iceberg
tables (SURVEY.md §4 "snapshot isolation / atomic table swap"); the built-in
session catalog's overwrite loses history. This module provides the minimal
versioned-store semantics on plain parquet so the engine keeps time travel
without the Iceberg runtime jar:

- every write lands in an immutable, UNIQUELY-NAMED ``v=<n>-<uuid>``
  directory (never rewritten, never re-used): a writer that crashes after
  staging but before committing leaves an orphan directory that can never
  collide with a later attempt at the same version number, so one crash
  cannot wedge all future publishes;
- a version is COMMITTED by writing a one-row manifest parquet under
  ``_manifests/`` naming (version, path) — readers resolve versions ONLY
  through manifests, so a half-written data directory is invisible
  (write-then-commit, the same protocol Iceberg's metadata pointer swap
  relies on);
- time travel = read the path the given (or the max) version's manifest
  records. If two racing writers ever commit the same version number, the
  lexicographically smallest path wins deterministically on every read.

With the Iceberg jar present, ``sources/connectors.py`` swaps in real
``VERSION AS OF`` reads; the API here is shaped to match.

Scale notes: version directories are plain partition-pruned parquet reads;
manifests are tiny single-row files, so listing versions scans KBs, not the
data. Writers never mutate existing files => concurrent readers at any
version are consistent without locks.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(base: str, table: str) -> str:
    return os.path.join(base, table, "_manifests")


def _data_dir(base: str, table: str, version: int) -> str:
    """Fresh staging directory for ``version`` — unique per call, so a
    crashed or concurrent writer can never block a later claim of the same
    version number with a path-already-exists error."""
    return os.path.join(base, table, f"v={version}-{uuid.uuid4().hex[:12]}")


def _manifest_rows(spark: SparkSession, base: str, table: str) -> list:
    try:
        return spark.read.parquet(_manifest_dir(base, table)).collect()
    except Exception:
        return []


def snapshot_versions(spark: SparkSession, base: str, table: str) -> list[int]:
    """Committed versions, ascending (empty if the table doesn't exist)."""
    return sorted({int(r["version"]) for r in _manifest_rows(spark, base, table)})


def _resolve_path(spark: SparkSession, base: str, table: str, version: int) -> str:
    """The data path a committed version's manifest names (min-path wins on
    a duplicate-version race, deterministically)."""
    paths = [
        r["path"]
        for r in _manifest_rows(spark, base, table)
        if int(r["version"]) == version
    ]
    if not paths:
        raise ValueError(f"version {version} has no manifest for {table!r}")
    return min(paths)


def commit_version(
    spark: SparkSession, base: str, table: str, version: int, path: str
) -> None:
    """Publish ``path`` as ``version``: one manifest row, O(1)."""
    manifest = spark.createDataFrame([(version, path)], "version int, path string")
    manifest.coalesce(1).write.mode("append").parquet(_manifest_dir(base, table))


def write_snapshot(df: DataFrame, base: str, table: str) -> int:
    """Write ``df`` as the next version and commit it; returns the version.

    Data first, manifest second: the version exists only once its manifest
    row is readable.
    """
    spark = df.sparkSession
    versions = snapshot_versions(spark, base, table)
    version = (versions[-1] + 1) if versions else 1
    staged = _data_dir(base, table, version)
    df.write.mode("errorifexists").parquet(staged)
    commit_version(spark, base, table, version, staged)
    return version


def read_snapshot(
    spark: SparkSession, base: str, table: str, version: int | None = None
) -> DataFrame:
    """Time-travel read: ``version`` (or the latest committed one)."""
    versions = snapshot_versions(spark, base, table)
    if not versions:
        raise ValueError(f"no committed snapshots for {table!r} under {base!r}")
    if version is None:
        version = versions[-1]
    if version not in versions:
        raise ValueError(f"version {version} not in {versions} for {table!r}")
    return spark.read.parquet(_resolve_path(spark, base, table, version))
