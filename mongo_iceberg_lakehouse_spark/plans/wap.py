"""Write-Audit-Publish (WAP) over the versioned snapshot store.

The Iceberg/Nessie branch-audit-merge pattern the reference's infra enables
but never exercises: stage a new table version, run the data-quality suite
against the STAGED data, and only commit (publish) the version if every
check passes. A failed audit leaves the staged directory uncommitted —
readers can never observe it, because versions exist only through manifests
(sources/snapshots.py commit protocol).

Scale notes: the audit is operators/quality.py's single-pass conditional
aggregation over the staged snapshot (one scan), and publish is a one-row
manifest write — audit cost is O(staged data), publish cost is O(1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from ..operators.quality import Check, run_checks
from ..sources.snapshots import _data_dir, snapshot_versions


def wap_publish(
    df: DataFrame,
    base: str,
    table: str,
    checks: list[Check],
) -> tuple[bool, int | None, DataFrame]:
    """Stage ``df``, audit it, publish iff all checks pass.

    Returns (published, version-or-None, audit report). The staged data is
    written BEFORE the audit (write-audit-publish, not audit-write): the
    audit reads back what was actually persisted, so serialization bugs
    can't slip a bad version through.
    """
    spark = df.sparkSession
    versions = snapshot_versions(spark, base, table)
    version = (versions[-1] + 1) if versions else 1
    staged = _data_dir(base, table, version)
    df.write.mode("errorifexists").parquet(staged)

    report = run_checks(spark.read.parquet(staged), checks)
    # pin the report locally: on failure the staged files are deleted, and
    # the returned report must stay collectible afterwards
    rows = report.collect()
    report = spark.createDataFrame(rows, report.schema)
    ok = all(r["passed"] for r in rows)
    if not ok:
        # the version never became visible; remove the staged files so the
        # next publish attempt can claim this version number cleanly
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
        return False, None, report

    manifest = spark.createDataFrame(
        [(version, staged)], "version int, path string"
    )
    manifest.coalesce(1).write.mode("append").parquet(
        os.path.join(base, table, "_manifests")
    )
    return True, version, report
