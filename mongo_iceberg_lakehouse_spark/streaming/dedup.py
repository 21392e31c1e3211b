"""Streaming deduplication: exactly-once event counts from at-least-once
delivery (§2.9 / phase F).

Every real event pipeline delivers duplicates (producer retries, replayed
partitions). The streaming fix is state-backed: ``dropDuplicatesWithinWatermark``
keeps each key's fingerprint only until the watermark passes it, so state is
O(keys per watermark window), not O(all history) — the property that makes
dedup feasible on an unbounded stream. (Plain ``dropDuplicates`` on a stream
never expires state.)

The harness unions two reads of the same source — a deterministic 2x
at-least-once stream — and dedups on event_id; the availableNow result must
equal the source exactly, which is the SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .events import read_events_stream, state_partitions


def deduped_events_stream(
    spark: SparkSession, sf_dir: str, watermark: str = "2 hours"
) -> DataFrame:
    doubled = read_events_stream(spark, sf_dir).unionByName(
        read_events_stream(spark, sf_dir)
    )
    return doubled.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def run_streaming_dedup_available_now(
    spark: SparkSession,
    sf_dir: str,
    query_name: str = "events_deduped",
) -> DataFrame:
    for q in spark.streams.active:
        if q.name == query_name:
            q.stop()
    with state_partitions(spark):
        q = (
            deduped_events_stream(spark, sf_dir)
            .writeStream.format("memory")
            .queryName(query_name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
    return spark.table(query_name)
