"""foreachBatch sink: stream -> per-batch MERGE-style upsert into a lake
table (the exactly-once-style sink pattern for engines without Delta)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.sources.tables import load_events
from mongo_iceberg_lakehouse_spark.streaming.events import read_events_stream

from .conftest import SF_SMOKE


def test_foreach_batch_upsert_sink(spark, tmp_path):
    out_dir = str(tmp_path / "user_latest")

    def upsert_batch(batch_df, epoch_id: int) -> None:
        # keep the latest event per user across the batch, merge with what's
        # already on disk (idempotent per epoch: full snapshot-replace)
        from mongo_iceberg_lakehouse_spark.operators.dedup import window_dedup

        latest = window_dedup(
            batch_df, ["user_id"], [F.col("ts").desc(), F.col("event_id").desc()]
        ).select("user_id", "event_id", "ts", "value")
        latest.write.mode("overwrite").parquet(out_dir)

    q = (
        read_events_stream(spark, SF_SMOKE)
        .writeStream.foreachBatch(upsert_batch)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    q.stop()

    written = spark.read.parquet(out_dir)
    batch_truth = (
        load_events(spark, SF_SMOKE)
        .groupBy("user_id")
        .agg(F.max_by("event_id", F.struct("ts", "event_id")).alias("event_id"))
    )
    got = {r.user_id: r.event_id for r in written.collect()}
    want = {r.user_id: r.event_id for r in batch_truth.collect()}
    assert got == want


def test_streaming_gold_to_jdbc_roundtrip(spark):
    """Complete-mode aggregate -> foreachBatch -> embedded-Derby JDBC
    table -> read-back equals the batch aggregate, and repeated runs are
    idempotent (fresh db per run; overwrite-per-epoch inside a run)."""
    from mongo_iceberg_lakehouse_spark.sources.connectors import (
        derby_embedded_available,
    )
    from mongo_iceberg_lakehouse_spark.streaming.sinks import (
        run_gold_report_to_jdbc,
    )

    if not derby_embedded_available(spark):
        import pytest

        pytest.skip("derby embedded driver not on classpath")
    sf = "/root/testdata/sf0.001"
    got = {
        r["o_orderstatus"]: (r["n_orders"], r["revenue"])
        for r in run_gold_report_to_jdbc(spark, sf).collect()
    }
    want = {
        r["o_orderstatus"]: (r["n_orders"], round(r["rev"], 2))
        for r in spark.read.parquet(f"{sf}/orders.parquet")
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("rev"),
        )
        .collect()
    }
    assert {k: (n, round(v, 2)) for k, (n, v) in got.items()} == want
