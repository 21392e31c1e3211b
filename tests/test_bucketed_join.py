"""Bucketed co-located join: plan shape (the point) + semantics."""

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.catalog import save_table_bucketed


def _bucketed_pair(spark, tmp_path):
    left = spark.createDataFrame(
        [(i, f"p{i % 3}") for i in range(100)], "k long, grp string"
    )
    right = spark.createDataFrame(
        [(i % 50, i * 10) for i in range(200)], "k long, v long"
    )
    save_table_bucketed(
        left, "tb_left", ["k"], 4, path=str(tmp_path / "left")
    )
    save_table_bucketed(
        right, "tb_right", ["k"], 4, path=str(tmp_path / "right")
    )
    return spark.table("tb_left"), spark.table("tb_right")


def test_bucketed_join_has_no_exchange_or_sort(spark, tmp_path):
    l, r = _bucketed_pair(spark, tmp_path)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = l.join(r, l["k"] == r["k"]).select(l["k"], "grp", "v")
        joined.write.mode("overwrite").format("noop").save()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
        assert "Exchange" not in plan  # bucket layout IS the partitioning

        # Spark >= 3.0 won't TRUST write-time bucket sort order by default
        # (multi-file buckets made the claim unsound; SPARK-24528 made it
        # opt-in). save_table_bucketed writes one file per bucket, so the
        # opt-in is sound here and elides the per-bucket Sort too.
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
        )
        joined2 = l.join(r, l["k"] == r["k"]).select(l["k"], "grp", "v")
        joined2.write.mode("overwrite").format("noop").save()
        plan2 = joined2._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan2
        assert "Exchange" not in plan2
        assert "Sort [" not in plan2.replace("SortMergeJoin", "")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set(
            "spark.sql.legacy.bucketedTableScan.outputOrdering", "false"
        )


def test_bucketed_join_matches_plain_join(spark, tmp_path):
    l, r = _bucketed_pair(spark, tmp_path)
    bucketed = (
        l.join(r, l["k"] == r["k"])
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    plain_l = spark.createDataFrame(
        [(i, f"p{i % 3}") for i in range(100)], "k long, grp string"
    )
    plain_r = spark.createDataFrame(
        [(i % 50, i * 10) for i in range(200)], "k long, v long"
    )
    plain = (
        plain_l.join(plain_r, "k")
        .groupBy("grp")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"))
    )
    assert sorted(map(tuple, bucketed.collect())) == sorted(
        map(tuple, plain.collect())
    )


def test_bucketed_table_rerun_overwrites(spark, tmp_path):
    df = spark.createDataFrame([(1, "a")], "k long, s string")
    save_table_bucketed(df, "tb_rerun", ["k"], 2, path=str(tmp_path / "r1"))
    df2 = spark.createDataFrame([(2, "b"), (3, "c")], "k long, s string")
    # second run at a DIFFERENT external location must not collide
    save_table_bucketed(df2, "tb_rerun", ["k"], 2, path=str(tmp_path / "r2"))
    assert spark.table("tb_rerun").count() == 2
