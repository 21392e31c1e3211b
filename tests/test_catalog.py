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


def test_bucketed_join_skips_shuffle(spark):
    """Bucketing both sides on the join key co-locates the join: the
    SortMergeJoin runs with NO Exchange on either input — the bucket layout
    IS the shuffle, paid once at write time. This is the 100 TB fact-fact
    join strategy."""
    create_namespace(spark, "cat_test")
    li = spark.read.parquet(f"{SF_SMOKE}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .saveAsTable("cat_test.li_bucketed"))
    (o.write.mode("overwrite").bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .saveAsTable("cat_test.o_bucketed"))
    lb = spark.table("cat_test.li_bucketed")
    ob = spark.table("cat_test.o_bucketed")
    spark.conf.set("spark.sql.adaptive.enabled", "false")  # static final plan
    # force the SMJ path: at the test's toy scale Spark would (rightly)
    # broadcast instead, which hides the bucket co-location being asserted
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).groupBy(
            "o_orderstatus"
        ).count()
        plan = joined._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        before_agg = plan.split("SortMergeJoin")[-1]  # join subtree only
        assert "SortMergeJoin" in plan
        assert "Exchange" not in before_agg
        assert "SelectedBucketsCount: 8 out of 8" in plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_upsert_snapshot_merge_emulation(spark):
    from mongo_iceberg_lakehouse_spark.operators.relational import upsert_snapshot

    base = spark.createDataFrame(
        [(1, 1, "a"), (2, 1, "b"), (3, 1, "c")], ["k", "version", "payload"]
    )
    updates = spark.createDataFrame(
        [(2, 2, "b2"), (4, 1, "d")], ["k", "version", "payload"]
    )
    out = {r.k: (r.version, r.payload)
           for r in upsert_snapshot(base, updates, "k", "version").collect()}
    assert out == {1: (1, "a"), 2: (2, "b2"), 3: (1, "c"), 4: (1, "d")}
    # same-version tie prefers the update side
    tie = upsert_snapshot(base, spark.createDataFrame([(1, 1, "a-new")],
                          ["k", "version", "payload"]), "k", "version")
    assert {r.k: r.payload for r in tie.collect()}[1] == "a-new"


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


def test_snapshot_time_travel_and_commit_protocol(spark, tmp_path):
    from mongo_iceberg_lakehouse_spark.sources.snapshots import (
        read_snapshot,
        snapshot_versions,
        write_snapshot,
    )

    base = str(tmp_path / "snaps")
    df1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, s string")
    df2 = spark.createDataFrame([(3, "c")], "id long, s string")
    assert write_snapshot(df1, base, "t") == 1
    assert write_snapshot(df2, base, "t") == 2
    assert snapshot_versions(spark, base, "t") == [1, 2]

    # time travel: v1 unchanged after v2 commit; latest resolves to v2
    assert {r["id"] for r in read_snapshot(spark, base, "t", 1).collect()} == {1, 2}
    assert {r["id"] for r in read_snapshot(spark, base, "t").collect()} == {3}

    # uncommitted data dirs are invisible: fake a half-written v3
    import os

    os.makedirs(os.path.join(base, "t", "v=3"), exist_ok=True)
    assert snapshot_versions(spark, base, "t") == [1, 2]
    with __import__("pytest").raises(ValueError):
        read_snapshot(spark, base, "t", 3)


def test_wap_rejected_version_is_invisible(spark, tmp_path):
    from pyspark.sql import functions as F

    from mongo_iceberg_lakehouse_spark.operators.quality import (
        Check,
        predicate_rate,
    )
    from mongo_iceberg_lakehouse_spark.plans.wap import wap_publish
    from mongo_iceberg_lakehouse_spark.sources.snapshots import (
        read_snapshot,
        snapshot_versions,
    )

    base = str(tmp_path / "wap")
    good = spark.createDataFrame([(1, 10.0), (2, 5.0)], "id long, v double")
    bad = spark.createDataFrame([(3, -1.0)], "id long, v double")
    checks = [Check("v_positive", predicate_rate(F.col("v") > 0), 1.0)]

    ok, ver, report = wap_publish(good, base, "t", checks)
    assert ok and ver == 1
    assert all(r["passed"] for r in report.collect())

    ok2, ver2, report2 = wap_publish(bad, base, "t", checks)
    assert not ok2 and ver2 is None
    assert not all(r["passed"] for r in report2.collect())

    # the rejected version never became visible
    assert snapshot_versions(spark, base, "t") == [1]
    assert {r["id"] for r in read_snapshot(spark, base, "t").collect()} == {1, 2}

    # rejected stages are cleaned up, so a retry claims version 2 cleanly
    ok3, ver3, _ = wap_publish(good, base, "t", checks)
    assert ok3 and ver3 == 2
    assert snapshot_versions(spark, base, "t") == [1, 2]
