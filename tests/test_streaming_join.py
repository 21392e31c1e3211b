"""Stream-stream interval join: multi-microbatch equals batch.

Slices the events fixture into 4 time-ordered parquet files and streams them
one file per trigger — the watermark advances between micro-batches and view
state expires along the way, so this exercises real state management (the
single-batch availableNow path in the registry query never expires state).
With in-order arrival no row is ever late, so the result must equal the
static batch join exactly.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.streaming.events import EVENTS_RAW_SCHEMA
from mongo_iceberg_lakehouse_spark.streaming.join import view_click_join

from .conftest import SF_SMOKE


@pytest.fixture(scope="module")
def sliced_events_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_slices")
    t = pq.read_table(f"{SF_SMOKE}/events.parquet")
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pc.cast(t["ts"], pa.int64()),
    )
    t = t.sort_by("ts")
    n = t.num_rows
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        pq.write_table(t.slice(lo, hi - lo), root / f"slice_{i}.parquet")
    return str(root)


def _streamed_pairs(spark, path: str):
    raw = (
        spark.readStream.schema(EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    q = (
        view_click_join(events)
        .writeStream.format("memory")
        .queryName("vc_join_multibatch")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    q.stop()
    return spark.table("vc_join_multibatch"), n_batches


def test_multibatch_join_equals_batch(spark, sliced_events_dir):
    streamed, n_batches = _streamed_pairs(spark, sliced_events_dir)
    assert n_batches >= 4  # one per file: state crossed micro-batches

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    ev = (
        spark.read.schema(EVENTS_RAW_SCHEMA)
        .parquet(sliced_events_dir)
        .withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    )
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("u"), F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    expected = v.join(
        c,
        (v["u"] == c["u"])
        & (F.col("c_ts") >= F.col("v_ts"))
        & (F.col("c_ts") <= F.col("v_ts") + F.expr("INTERVAL 30 minutes")),
    ).select("view_id", "click_id")

    got = {(r["view_id"], r["click_id"]) for r in streamed.collect()}
    want = {(r["view_id"], r["click_id"]) for r in expected.collect()}
    assert got == want
    assert len(want) > 0
