"""Hypertable rollup: materialized aggregate + rollup∪tail rewrite must
equal a full recompute over raw data."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.catalog import create_namespace, read_table
import datetime as _dt

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
    full = (
        bucket_aggregate(events)
        .withColumn("total_value", F.col("total_micro") / F.lit(1e6))
        .withColumn(
            "avg_value",
            F.col("total_micro").cast("double") / (F.col("cnt") * F.lit(1e6)),
        )
        .drop("total_micro")
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


def test_gapfill_locf_planted_series(spark):
    from mongo_iceberg_lakehouse_spark.operators.timeseries import gapfill_locf

    def t(h):
        return _dt.datetime(2024, 1, 1, h, 0, 0)

    rows = [
        (1, t(0), 10.0), (1, t(0), 5.0),   # hour 0: sum 15
        (1, t(3), 7.0),                    # hours 1-2 are gaps carrying 15
        (2, t(5), 1.0),                    # single-hour user: no gaps
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r["user_id"], r["bucket_ts"]): (r["v_filled"], r["is_gap"])
        for r in gapfill_locf(df, "user_id", "ts", "value").collect()
    }
    assert got == {
        (1, t(0)): (15.0, False),
        (1, t(1)): (15.0, True),
        (1, t(2)): (15.0, True),
        (1, t(3)): (7.0, False),
        (2, t(5)): (1.0, False),
    }
