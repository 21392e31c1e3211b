"""Idempotent-sink property: foreachBatch is at-least-once, so a batch
redelivered after a crash-between-write-and-commit must not duplicate
rows. streaming/sinks.py::batch_partitioned_writer keys each write by
batch_id (dynamic partition overwrite), making redelivery a byte-for-byte
replace instead of an append."""

from __future__ import annotations

from mongo_iceberg_lakehouse_spark.streaming.sinks import batch_partitioned_writer


def _run(spark, src, ckpt, out):
    q = (
        spark.readStream.schema("id long, v double")
        .parquet(src)
        .writeStream.foreachBatch(batch_partitioned_writer(out))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()


def test_redelivered_batch_is_not_duplicated(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.range(0, 50).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(
        1
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    first = spark.read.parquet(out)
    assert first.count() == 50

    # Simulate the at-least-once failure mode: the checkpoint didn't
    # commit, so the SAME (batch_df, batch_id=0) is delivered again.
    batch0 = spark.read.schema("id long, v double").parquet(src)
    batch_partitioned_writer(out)(batch0, 0)

    got = spark.read.parquet(out)
    assert got.count() == 50, "redelivered epoch must replace, not append"
    assert got.select("id").distinct().count() == 50


def test_distinct_batches_accumulate(spark, tmp_path):
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    spark.range(0, 20).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(
        1
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)
    spark.range(20, 35).selectExpr("id", "CAST(id AS DOUBLE) AS v").coalesce(
        1
    ).write.mode("append").parquet(src)
    _run(spark, src, ckpt, out)

    got = spark.read.parquet(out)
    assert got.count() == 35
    # partition column rides along and identifies the writing epoch
    assert set(got.select("batch_id").distinct().toPandas()["batch_id"]) == {0, 1}


def test_append_sink_control_duplicates(spark, tmp_path):
    # Control: a plain append sink DOES duplicate on redelivery — proving
    # the idempotence above comes from batch-keyed overwrite, not luck.
    out = str(tmp_path / "out")
    batch = spark.range(0, 10).selectExpr("id", "CAST(id AS DOUBLE) AS v")
    batch.write.mode("append").parquet(out)
    batch.write.mode("append").parquet(out)
    assert spark.read.parquet(out).count() == 20
