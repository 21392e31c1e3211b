"""IVM: sequentially folded deltas equal the full recompute."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.plans.ivm import (
    aggregate_state,
    gold_view,
    merge_state,
)


def test_three_way_fold_equals_full_recompute(spark):
    df = spark.range(0, 3000).select(
        (F.col("id") % 3).alias("g"),
        (F.col("id") % 100).cast("double").alias("v"),
        (F.col("id") % 40).alias("u"),
    )
    parts = [
        df.filter(F.col("v") < 30),
        df.filter((F.col("v") >= 30) & (F.col("v") < 70)),
        df.filter(F.col("v") >= 70),
    ]
    state = aggregate_state(parts[0], ["g"], "v", "u")
    for p in parts[1:]:
        state = merge_state(state, aggregate_state(p, ["g"], "v", "u"), ["g"])
    got = {
        r["g"]: (r["n_rows"], r["sum_value"], r["max_value"])
        for r in gold_view(state, ["g"]).collect()
    }
    want = {
        r["g"]: (r["n"], r["s"], r["m"])
        for r in df.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"), F.max("v").alias("m"))
        .collect()
    }
    assert got == want
    # distinct estimate: exact distinct is 40 per group; lgK=12 is exact at
    # this cardinality
    est = {r["g"]: r["approx_distinct"] for r in gold_view(state, ["g"]).collect()}
    assert all(abs(e - 40) <= 2 for e in est.values())
