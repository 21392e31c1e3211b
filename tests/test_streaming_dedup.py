"""dropDuplicatesWithinWatermark: duplicates across micro-batches are
suppressed while state lives, and the streamed result equals batch distinct.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F


def _ts(m):
    return dt.datetime(2024, 1, 1, 10, m, 0)


def test_cross_batch_duplicates_suppressed(spark, tmp_path):
    src = tmp_path / "dup_src"
    src.mkdir()
    batches = [
        [(1, _ts(0), "a"), (2, _ts(1), "b")],
        [(1, _ts(2), "a"), (3, _ts(3), "c")],   # id 1 is a cross-batch dup
        [(2, _ts(30), "b"), (4, _ts(31), "d")], # id 2 dup, still in state
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(rows, "event_id long, ts timestamp, v string")
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))
        for root, _, files in os.walk(src / f"b{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (1000 + i, 1000 + i))

    raw = (
        spark.readStream.schema("event_id long, ts timestamp, v string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    deduped = raw.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_xbatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    got = sorted(r["event_id"] for r in spark.table("dedup_xbatch").collect())
    assert got == [1, 2, 3, 4]
    # the survivor of each id is its FIRST occurrence
    first = {
        r["event_id"]: r["ts"] for r in spark.table("dedup_xbatch").collect()
    }
    assert first[1] == _ts(0) and first[2] == _ts(1)
