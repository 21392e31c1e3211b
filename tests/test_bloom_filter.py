"""Runtime Bloom-filter join pruning: plan-shape and result-equality checks."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.plans.bloom import (
    bloom_join_confs,
    has_bloom_pruning,
)

SF = "/root/testdata/sf0.001"


def _join(spark):
    part = spark.read.parquet(f"{SF}/part.parquet").filter("p_size < 3")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_size")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def test_bloom_filter_injected_under_confs(spark):
    with bloom_join_confs(spark):
        df = _join(spark)
        assert has_bloom_pruning(df)


def test_bloom_filter_absent_by_default(spark):
    # broadcast path: no bloom filter, by design
    assert not has_bloom_pruning(_join(spark))


def test_results_identical_with_and_without(spark):
    baseline = {tuple(r) for r in _join(spark).collect()}
    with bloom_join_confs(spark):
        pruned = {tuple(r) for r in _join(spark).collect()}
    assert pruned == baseline and len(baseline) > 0


def test_confs_restored_after_context(spark):
    before = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    with bloom_join_confs(spark):
        assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == "-1"
    assert spark.conf.get("spark.sql.autoBroadcastJoinThreshold") == before
