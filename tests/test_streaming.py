"""Structured Streaming: availableNow windowed counts == batch equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.sources.tables import load_events
from mongo_iceberg_lakehouse_spark.streaming.events import (
    run_windowed_counts_available_now,
)

from .conftest import SF_SMOKE


def test_streaming_window_counts_match_batch(spark):
    streamed = run_windowed_counts_available_now(
        spark, SF_SMOKE, query_name="t_stream_counts"
    )
    batch = (
        load_events(spark, SF_SMOKE)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt",
                "total_value")
    )
    s = {(r.window_start, r.event_type): (r.cnt, round(r.total_value, 6))
         for r in streamed.collect()}
    b = {(r.window_start, r.event_type): (r.cnt, round(r.total_value, 6))
         for r in batch.collect()}
    assert s == b
    assert len(s) > 0


def test_streaming_is_incremental_source(spark):
    # the stream reads the parquet as a file source with an explicit schema
    from mongo_iceberg_lakehouse_spark.streaming.events import read_events_stream

    stream = read_events_stream(spark, SF_SMOKE)
    assert stream.isStreaming
    assert dict(stream.dtypes)["ts"] == "timestamp"
