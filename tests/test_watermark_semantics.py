"""Watermark semantics, demonstrated precisely (and honestly).

Append-mode windowed aggregation over 3 ordered micro-batches:

  b1: 10:15                   -> seeds window [10:00,11:00)
  b2: 8:30  (below the 9:15 watermark set by b1 - 1h)
      10:20 (late but >= watermark -> GUARANTEED accepted)
      13:00 (advances the watermark to 12:00)
  b3: 13:30 (lets the engine emit windows closed by b2's advance)

Guaranteed semantics asserted here:
  - the within-delay late row lands in window 10 (count 2);
  - windows the watermark never passed (13:00) are NOT emitted in append
    mode — availableNow termination doesn't flush open windows;
  - the watermark trails max-event-time by exactly the delay, one batch
    behind.

NOT asserted: whether the 8:30 row is dropped. Spark only guarantees drops
for windows whose state was already evicted; a sub-watermark row that would
CREATE state "may or may not" be aggregated (Structured Streaming guide's
exact words — Spark 4.1 aggregates it, emitting window 8:00 on the next
eviction). Pipelines needing hard cutoffs must filter explicitly:
``df.filter(col("ts") >= lit(cutoff))``.
"""

from __future__ import annotations

import datetime as dt
import os

from mongo_iceberg_lakehouse_spark.streaming.events import windowed_counts


def _ts(h, m):
    return dt.datetime(2024, 1, 1, h, m, 0)


def test_watermark_guaranteed_semantics(spark, tmp_path):
    src = tmp_path / "stream_src"
    src.mkdir()
    batches = [
        [(_ts(10, 15), "view", 1.0)],
        [(_ts(8, 30), "view", 1.0), (_ts(10, 20), "view", 1.0),
         (_ts(13, 0), "view", 1.0)],
        [(_ts(13, 30), "view", 1.0)],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "ts timestamp, event_type string, value double"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))
        # file source orders by modification time: force strict ordering
        for root, _, files in os.walk(src / f"b{i}"):
            for f in files:
                os.utime(os.path.join(root, f), (1000 + i, 1000 + i))

    raw = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    agg = windowed_counts(raw, window="1 hour", watermark="1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("wm_semantics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    marks = [
        p["eventTime"].get("watermark")
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    q.stop()

    got = {
        (r["window_start"], r["cnt"])
        for r in spark.table("wm_semantics").collect()
    }
    # within-delay late row counted: window 10 has both 10:15 and 10:20
    assert (_ts(10, 0), 2) in got
    # never-finalized windows are not emitted
    assert all(w < _ts(13, 0) for w, _ in got)
    # watermark trails max event time by the 1h delay, one batch behind
    assert marks == [
        "1970-01-01T00:00:00.000Z",
        "2024-01-01T09:15:00.000Z",
        "2024-01-01T12:00:00.000Z",
    ]
