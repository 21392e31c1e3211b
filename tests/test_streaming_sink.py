"""foreachBatch sink: stream -> per-batch MERGE-style upsert into a lake
table (the exactly-once-style sink pattern for engines without Delta)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.sources.tables import load_events
from mongo_iceberg_lakehouse_spark.streaming.events import read_events_stream

from .conftest import SF_SMOKE


def test_foreach_batch_upsert_sink(spark, tmp_path):
    out_dir = str(tmp_path / "user_latest")

    def upsert_batch(batch_df, epoch_id: int) -> None:
        # keep the latest event per user across the batch, merge with what's
        # already on disk (idempotent per epoch: full snapshot-replace)
        from mongo_iceberg_lakehouse_spark.operators.dedup import window_dedup

        latest = window_dedup(
            batch_df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).select("user_id", "event_id", "ts", "value")
        latest.write.mode("overwrite").parquet(out_dir)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(upsert_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    q.stop()

    written = spark.read.parquet(out_dir)
    batch_truth = (
        load_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
    )
    got = {r.user_id: r.event_id for r in written.collect()}
    want = {r.user_id: r.event_id for r in batch_truth.collect()}
    assert got == want
