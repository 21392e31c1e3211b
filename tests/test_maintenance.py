"""Table maintenance: small-file compaction + snapshot expiry
(sources/maintenance.py — Iceberg rewrite_data_files / expire_snapshots
analogs on the versioned snapshot store)."""

from __future__ import annotations

import os
import tempfile

import pytest

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.sources.maintenance import (
    _dir_stats,
    compact_snapshot,
    expire_snapshots,
    remove_orphan_files,
)
from mongo_iceberg_lakehouse_spark.sources.snapshots import (
    _resolve_path,
    read_snapshot,
    snapshot_versions,
    write_snapshot,
)


@pytest.fixture()
def store(tmp_path):
    return str(tmp_path / "store")


def _df(spark, n=500):
    return spark.range(n).select(
        F.col("id"), (F.col("id") * 3 % 7).alias("v")
    )


def test_compact_reduces_files_preserves_rows(spark, store):
    write_snapshot(_df(spark).repartition(16), store, "t")
    stats = compact_snapshot(spark, store, "t", target_bytes=1 << 30)
    assert stats["files_before"] == 16
    assert stats["files_after"] == 1
    assert stats["new_version"] == 2
    v1 = read_snapshot(spark, store, "t", 1)
    v2 = read_snapshot(spark, store, "t", 2)
    assert v1.exceptAll(v2).count() == 0
    assert v2.exceptAll(v1).count() == 0
    # compaction is a committed snapshot: history shows both versions
    assert snapshot_versions(spark, store, "t") == [1, 2]


def test_compact_respects_target_bytes(spark, store):
    write_snapshot(_df(spark, 2000).repartition(16), store, "t")
    _n, total = _dir_stats(_resolve_path(spark, store, "t", 1))
    # target half the bytes -> at least 2 output files
    stats = compact_snapshot(spark, store, "t", target_bytes=total // 2)
    assert stats["files_after"] >= 2
    assert stats["files_after"] < stats["files_before"]


def test_compact_plan_has_no_exchange(spark, store):
    # coalesce is a narrow dependency: compacting must not shuffle
    write_snapshot(_df(spark).repartition(8), store, "t")
    df = read_snapshot(spark, store, "t", 1).coalesce(1)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_expire_keeps_last_n_and_reclaims(spark, store):
    for i in (1, 2, 3):
        write_snapshot(_df(spark, 100 * i), store, "t")
    paths = {v: _resolve_path(spark, store, "t", v) for v in (1, 2, 3)}
    out = expire_snapshots(spark, store, "t", keep_last=2)
    assert out["expired"] == [1]
    assert out["remaining"] == [2, 3]
    assert out["bytes_reclaimed"] > 0
    assert not os.path.exists(paths[1])
    assert os.path.exists(paths[3])
    # expired version is unresolvable; survivors read fine
    with pytest.raises(ValueError):
        read_snapshot(spark, store, "t", 1)
    assert read_snapshot(spark, store, "t", 3).count() == 300


def test_expire_noop_when_nothing_to_expire(spark, store):
    write_snapshot(_df(spark), store, "t")
    out = expire_snapshots(spark, store, "t", keep_last=2)
    assert out["expired"] == []
    assert out["remaining"] == [1]
    assert read_snapshot(spark, store, "t").count() == 500


def test_expire_rejects_bad_keep_last(spark, store):
    write_snapshot(_df(spark), store, "t")
    with pytest.raises(ValueError):
        expire_snapshots(spark, store, "t", keep_last=0)


# ------------------------------------------------ orphan-file cleanup


def test_remove_orphans_deletes_unreferenced_only(spark, store):
    from mongo_iceberg_lakehouse_spark.sources.snapshots import _data_dir

    write_snapshot(_df(spark), store, "t")                 # committed v1
    orphan = _data_dir(store, "t", 2)
    _df(spark, 100).write.parquet(orphan)                  # crashed writer
    out = remove_orphan_files(spark, store, "t", grace_seconds=0)
    assert out["orphans_removed"] == 1
    assert out["bytes_reclaimed"] > 0
    assert out["referenced_kept"] == 1
    assert not os.path.exists(orphan)
    # the committed version is untouched
    assert read_snapshot(spark, store, "t").count() == 500
    # idempotent: nothing left to remove
    again = remove_orphan_files(spark, store, "t", grace_seconds=0)
    assert again["orphans_removed"] == 0


def test_remove_orphans_grace_keeps_live_stages(spark, store):
    from mongo_iceberg_lakehouse_spark.sources.snapshots import _data_dir

    write_snapshot(_df(spark), store, "t")
    live = _data_dir(store, "t", 2)
    _df(spark, 10).write.parquet(live)                     # stage-in-progress
    out = remove_orphan_files(spark, store, "t", grace_seconds=3600)
    assert out["orphans_removed"] == 0
    assert os.path.exists(live)


def test_remove_orphans_missing_table_is_noop(spark, store):
    out = remove_orphan_files(spark, store, "nope", grace_seconds=0)
    assert out == {
        "orphans_removed": 0,
        "bytes_reclaimed": 0,
        "referenced_kept": 0,
    }
