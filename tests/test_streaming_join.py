"""Stream-stream interval join: multi-microbatch equals batch.

Slices the events fixture into 4 time-ordered parquet files and streams them
one file per trigger — the watermark advances between micro-batches and view
state expires along the way, so this exercises real state management (the
single-batch availableNow path in the registry query never expires state).
With in-order arrival no row is ever late, so the result must equal the
static batch join exactly.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.streaming.join import view_click_join

from .conftest import SF_SMOKE

EVENTS_TS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture(scope="module")
def sliced_events_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("events_slices")
    t = pq.read_table(f"{SF_SMOKE}/events.parquet")
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        # normalize either fixture generation (ns or us) to TIMESTAMP(MICROS)
        pc.cast(t["ts"], pa.timestamp("us"), safe=False),
    )
    t = t.sort_by("ts")
    n = t.num_rows
    for i in range(4):
        lo, hi = i * n // 4, (i + 1) * n // 4
        pq.write_table(t.slice(lo, hi - lo), root / f"slice_{i}.parquet")
    return str(root)


def _streamed_pairs(spark, path: str):
    events = (
        spark.readStream.schema(EVENTS_TS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
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

    ev = spark.read.schema(EVENTS_TS_SCHEMA).parquet(sliced_events_dir)
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


def test_left_outer_null_emission_is_watermark_driven(spark, tmp_path):
    """Unmatched views emit null-padded rows only after the watermark passes
    their join bound; tail views never emit their null row."""
    import datetime as dt

    from mongo_iceberg_lakehouse_spark.streaming.join import view_click_left_join

    def t(h, m=0):
        return dt.datetime(2024, 1, 1, h, m, 0)

    src = tmp_path / "lj_src"
    src.mkdir()
    # the global watermark is min(views side, clicks side), and each side
    # only sees its own event_type — so BOTH sides need late events to
    # advance it. Users 998 (views only) and 999 (clicks only) advance the
    # watermarks without ever matching each other.
    batches = [
        # V1 (matched), V2 (never matched)
        [(1, t(10, 0), 100, "view"), (2, t(10, 5), 200, "view")],
        # click matches V1; 16:00 on both sides -> watermark 15:00, far
        # past V2's null-emission bound (10:35 + 1h delay)
        [(3, t(10, 10), 100, "click"), (4, t(16, 0), 998, "view"),
         (5, t(16, 0), 999, "click")],
        # one more batch so the advanced watermark takes effect; 17:00 keeps
        # the final watermark at 16:00 < 16:30, so the 16:00 tail view's
        # null row stays unemitted even if a closing empty batch runs
        [(6, t(17, 0), 998, "view"), (7, t(17, 0), 999, "click")],
    ]
    for i, rows in enumerate(batches):
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        df.coalesce(1).write.mode("overwrite").parquet(str(src / f"b{i}"))
        for root, _, files in os.walk(src / f"b{i}"):
            for fn in files:
                os.utime(os.path.join(root, fn), (1000 + i, 1000 + i))

    raw = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string"
        )
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        view_click_left_join(raw, "30 minutes", "1 hour")
        .writeStream.format("memory")
        .queryName("lj_semantics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()

    rows = spark.table("lj_semantics").collect()
    got = {(r["view_id"], r["click_id"]) for r in rows}
    assert (1, 3) in got          # matched pair
    assert (2, None) in got       # unmatched view: null row emitted
    assert (1, None) not in got   # matched view has no spurious null row
    assert len(rows) == 2
