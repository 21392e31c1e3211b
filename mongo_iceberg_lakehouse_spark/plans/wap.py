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

from pyspark.sql import DataFrame, SparkSession

from ..operators.quality import Check, run_checks
from ..sources.snapshots import _data_dir, commit_version, snapshot_versions


def _fs_delete(spark: SparkSession, path: str) -> None:
    """Best-effort recursive delete through the Hadoop FileSystem API, so
    cleanup works on any supported filesystem (local, HDFS, s3a, ...), not
    just the driver's local disk."""
    try:
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(hpath, True)
    except Exception:
        # an orphan staged dir is harmless: it is uncommitted (invisible to
        # readers) and its unique name can never collide with later writes
        pass


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
    can't slip a bad version through. Staging goes to a unique directory
    (sources/snapshots.py::_data_dir appends a uuid) whose path is recorded
    in the manifest at commit: a crash between stage and audit — or a
    concurrent writer racing for the same version number — leaves only an
    invisible orphan directory, never a path collision that would wedge
    every subsequent publish.
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
        # the version never became visible; reclaim the staged space
        # (best-effort — correctness does not depend on this delete)
        _fs_delete(spark, staged)
        return False, None, report

    commit_version(spark, base, table, version, staged)
    return True, version, report
