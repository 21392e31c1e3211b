"""HLL sketch rollup: union-of-parts accuracy on a known cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.sketches import sketch_rollup


def test_union_of_parts_estimates_true_cardinality(spark):
    # 20 parts x 500 rows; keys 0..4999 each appearing twice across parts,
    # so per-part distinct ~500 but global distinct is exactly 5000.
    df = spark.range(10_000).select(
        (F.col("id") % 20).alias("part"), (F.col("id") % 5000).alias("key")
    )
    fine, coarse = sketch_rollup(
        df, "key", F.col("part"), lambda c: F.lit(0), fine_name="part"
    )
    assert fine.count() == 20
    row = coarse.collect()[0]
    assert row["rows"] == 10_000
    assert abs(row["approx_distinct"] - 5000) <= 0.05 * 5000


def test_rollup_never_rescans_raw(spark):
    # the coarse plan's only source is the fine aggregate (binary sketches),
    # not the raw table: check by counting scans in the analyzed plan
    df = spark.range(1000).select(
        (F.col("id") % 4).alias("part"), F.col("id").alias("key")
    )
    fine, coarse = sketch_rollup(
        df, "key", F.col("part"), lambda c: c % 2, fine_name="part"
    )
    plan = coarse._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 1000") == 1
