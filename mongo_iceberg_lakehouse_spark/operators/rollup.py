"""Hypertable-style continuous rollup: materialized time-bucket aggregates
plus a rollup-union-tail query rewrite.

The timeseries-database pattern (continuous aggregates / hypertable
rollups) expressed Spark-first:

- ``materialize_rollup`` writes the per-bucket aggregate as a lake table
  partitioned by day — incremental refreshes only rewrite the day partitions
  the new data touches (partition-pruned on both read and write).
- ``rollup_with_tail`` answers the aggregate query by UNIONing the sealed
  rollup (cheap: pre-aggregated, pruned) with a re-aggregation of only the
  raw tail after the seal point — the standard "rollup + hot tail" rewrite
  that keeps query cost O(buckets) instead of O(raw rows) at 100 TB.

Measures are kept re-aggregable (count, sum; avg derived as sum/count at
read time) so the union step is a second-level aggregation, not a re-scan.

The stored sum is an EXACT BIGINT of micro-units (``total_micro``), not a
double: re-aggregating double partials gives order-dependent last digits
(the sf1 gate caught the .6g rendering flipping at 10x volume), while
bigint partials re-aggregate exactly at any nesting depth — the property a
materialized rollup must have if refreshes are to be idempotent. The
double ``total_value`` / ``avg_value`` are derived once at read time.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_aggregate(
    events: DataFrame,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Per-(bucket, keys) re-aggregable measures: cnt + exact micro total."""
    vmicro = F.floor(F.col(value_col) * 1e6 + F.lit(0.5)).cast("long")
    return (
        events.groupBy(
            F.window(ts_col, bucket).alias("w"), *[F.col(k) for k in key_cols]
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(vmicro).alias("total_micro"),
        )
        .select(
            F.col("w.start").alias("bucket_start"),
            *key_cols,
            "cnt",
            "total_micro",
        )
    )


def materialize_rollup(
    events: DataFrame,
    table: str,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> None:
    """Snapshot the rollup into a day-partitioned lake table."""
    rolled = bucket_aggregate(events, bucket, ts_col, key_cols, value_col)
    rolled = rolled.withColumn(
        "day", F.to_date(F.date_trunc("day", F.col("bucket_start")))
    )
    from ..catalog import save_table_replace

    save_table_replace(rolled, table, partition_by=["day"])


def rollup_with_tail(
    rollup: DataFrame,
    raw_tail: DataFrame,
    seal_point: Column,
    bucket: str = "1 hour",
    ts_col: str = "ts",
    key_cols: tuple[str, ...] = ("event_type",),
    value_col: str = "value",
) -> DataFrame:
    """Union the sealed rollup with a fresh aggregation of the raw tail.

    ``rollup`` rows at/after ``seal_point`` are dropped (they may be partial);
    the tail re-aggregates raw rows from ``seal_point`` on. Output schema ==
    ``bucket_aggregate``'s, with avg derived from the re-aggregable measures.
    """
    sealed = rollup.filter(F.col("bucket_start") < seal_point).select(
        "bucket_start", *key_cols, "cnt", "total_micro"
    )
    tail = bucket_aggregate(
        raw_tail.filter(F.col(ts_col) >= seal_point),
        bucket,
        ts_col,
        key_cols,
        value_col,
    )
    merged = sealed.unionByName(tail)
    # second-level aggregation: same bucket can appear in both halves only at
    # the seal boundary; summing re-aggregable EXACT measures is correct at
    # any depth and order-independent (bigint micro-units)
    return (
        merged.groupBy("bucket_start", *key_cols)
        .agg(F.sum("cnt").alias("cnt"), F.sum("total_micro").alias("total_micro"))
        .withColumn("total_value", F.col("total_micro") / F.lit(1e6))
        .withColumn(
            "avg_value",
            F.col("total_micro").cast("double") / (F.col("cnt") * F.lit(1e6)),
        )
        .drop("total_micro")
    )
