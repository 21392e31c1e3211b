"""AQE skew-join handling: a pathologically skewed join splits at runtime.

Salting (`relational.salted_groupby_sum`) is the manual fix for skewed
aggregation; for skewed *joins* the engine posture is AQE's
OptimizeSkewedJoin — no query rewrite, the runtime splits oversized
partitions after seeing map-output sizes. This test proves the conf path
works end-to-end: with aggressive skew thresholds the final plan marks the
join `skew=true`, and the result matches the unskewed computation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def skew_conf(spark):
    keep = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",  # force SMJ
    }
    old = {k: spark.conf.get(k, None) for k in keep}
    for k, v in keep.items():
        spark.conf.set(k, v)
    yield spark
    for k, v in old.items():
        if v is not None:
            spark.conf.set(k, v)


def test_skewed_join_is_split_by_aqe(skew_conf):
    spark = skew_conf
    # 95% of fact rows share key 0; dim is uniform
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("payload"),
    )
    dim = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("dim_v")
    )
    # NOTE: a groupBy(k) right after the join would pin the join's hash
    # partitioning and AQE would (correctly) refuse to split the skewed
    # partition; a global aggregate has no required distribution.
    # sum(payload) keeps the wide, incompressible column flowing through the
    # shuffle — with only the constant key kept, the 192k-row skewed
    # partition lz4-compresses below any realistic skew threshold
    joined = fact.join(dim, "k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("payload") + F.col("dim_v")).alias("s"),
    )
    row = joined.collect()[0]
    # every fact key 0..99 hits the dim: all 200k rows survive the join
    assert row["n"] == 200_000
    # sum(payload) = sum(0..199999); key 0 adds dim_v=0, keys 20/40/60/80
    # add 2*k over 2000 rows each
    assert row["s"] == 200_000 * 199_999 // 2 + 2000 * 2 * (20 + 40 + 60 + 80)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in plan, f"AQE did not split the skewed join:\n{plan[:2000]}"
