"""Hypertable rollup: materialized aggregate + rollup∪tail rewrite must
equal a full recompute over raw data."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.catalog import create_namespace, read_table
from mongo_iceberg_lakehouse_spark.operators.rollup import (
    bucket_aggregate,
    materialize_rollup,
    rollup_with_tail,
)
from mongo_iceberg_lakehouse_spark.sources.tables import load_events

from .conftest import SF_SMOKE


def _as_dict(df):
    return {
        (r.bucket_start, r.event_type): (r.cnt, round(r.total_value, 6))
        for r in df.collect()
    }


def test_rollup_union_tail_equals_full_recompute(spark):
    events = load_events(spark, SF_SMOKE)
    seal = F.lit("2024-01-08 00:00:00").cast("timestamp")

    create_namespace(spark, "rollup_test")
    # materialize from data before the seal point only (sealed history)
    materialize_rollup(
        events.filter(F.col("ts") < seal), "rollup_test.events_hourly"
    )
    rollup = read_table(spark, "rollup_test.events_hourly")

    rewritten = rollup_with_tail(rollup, events, seal)
    full = bucket_aggregate(events).withColumn(
        "avg_value", F.col("total_value") / F.col("cnt")
    )
    assert _as_dict(rewritten) == _as_dict(full)
    assert rewritten.count() == full.count()


def test_rollup_table_is_day_partitioned(spark):
    events = load_events(spark, SF_SMOKE)
    create_namespace(spark, "rollup_test")
    materialize_rollup(events, "rollup_test.events_hourly_p")
    back = read_table(spark, "rollup_test.events_hourly_p")
    assert "day" in back.columns
    one_day = back.filter(F.col("day") == "2024-01-03")
    assert one_day.count() > 0
