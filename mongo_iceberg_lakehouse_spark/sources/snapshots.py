"""Versioned table snapshots with time travel (Nessie/Iceberg analog).

The reference gets snapshot history for free from Nessie commits on Iceberg
tables (SURVEY.md §4 "snapshot isolation / atomic table swap"); the built-in
session catalog's overwrite loses history. This module provides the minimal
versioned-store semantics on plain parquet so the engine keeps time travel
without the Iceberg runtime jar:

- every write lands in an immutable ``v=<n>`` directory (never rewritten);
- a version is COMMITTED by writing a one-row manifest parquet under
  ``_manifests/`` naming it — readers resolve versions only through
  manifests, so a half-written data directory is invisible (write-then-
  commit, the same protocol Iceberg's metadata pointer swap relies on);
- time travel = read the directory a given (or the max) manifest names.

With the Iceberg jar present, ``sources/connectors.py`` swaps in real
``VERSION AS OF`` reads; the API here is shaped to match.

Scale notes: version directories are plain partition-pruned parquet reads;
manifests are tiny single-row files, so listing versions scans KBs, not the
data. Writers never mutate existing files => concurrent readers at any
version are consistent without locks.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _manifest_dir(base: str, table: str) -> str:
    return os.path.join(base, table, "_manifests")


def _data_dir(base: str, table: str, version: int) -> str:
    return os.path.join(base, table, f"v={version}")


def snapshot_versions(spark: SparkSession, base: str, table: str) -> list[int]:
    """Committed versions, ascending (empty if the table doesn't exist)."""
    md = _manifest_dir(base, table)
    try:
        rows = spark.read.parquet(md).collect()
    except Exception:
        return []
    return sorted(int(r["version"]) for r in rows)


def write_snapshot(df: DataFrame, base: str, table: str) -> int:
    """Write ``df`` as the next version and commit it; returns the version.

    Data first, manifest second: the version exists only once its manifest
    row is readable.
    """
    spark = df.sparkSession
    versions = snapshot_versions(spark, base, table)
    version = (versions[-1] + 1) if versions else 1
    df.write.mode("errorifexists").parquet(_data_dir(base, table, version))
    manifest = spark.createDataFrame(
        [(version, _data_dir(base, table, version))], "version int, path string"
    )
    manifest.coalesce(1).write.mode("append").parquet(_manifest_dir(base, table))
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
    return spark.read.parquet(_data_dir(base, table, version))
