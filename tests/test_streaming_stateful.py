"""applyInPandasWithState custom operator == batch equivalent."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.sources.tables import load_events
from mongo_iceberg_lakehouse_spark.streaming.stateful import (
    run_user_profiles_available_now,
)

from .conftest import SF_SMOKE


def test_stateful_user_profiles_match_batch(spark):
    streamed = run_user_profiles_available_now(spark, SF_SMOKE)
    batch = (
        load_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    s = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in streamed.collect()}
    b = {r.user_id: (r.n_events, round(r.total_value, 6)) for r in batch.collect()}
    assert s == b
    # last_type is the max-ts event's type for each user (spot check one)
    last = (
        load_events(spark, SF_SMOKE)
        .orderBy(F.col("ts").desc(), F.col("event_id").desc())
        .limit(1)
        .collect()[0]
    )
    streamed_last = {r.user_id: r.last_type for r in streamed.collect()}
    assert streamed_last[last.user_id] == last.event_type
