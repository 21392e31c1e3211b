"""distributed_rank / distributed_ntile vs the global-window built-ins:
must be bit-identical on every input shape — uniform, heavily skewed
(one value dominating a bucket), n < k, and duplicate order values with
id tiebreaks — while never funneling the corpus through one partition."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.ordered import (
    distributed_ntile,
    distributed_rank,
)


def _check(spark, vals: list[int], k: int = 10):
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, ["id", "v"]).repartition(5)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    want_rank = {
        (r["id"], r["rk"])
        for r in df.select("id", F.row_number().over(w).alias("rk")).collect()
    }
    got_rank = {
        (r["id"], r["__rank"])
        for r in distributed_rank(df, "v", "id").collect()
    }
    assert got_rank == want_rank
    want_bin = {
        (r["id"], r["bin"])
        for r in df.select("id", F.ntile(k).over(w).alias("bin")).collect()
    }
    got_bin = {
        (r["id"], r["bin"])
        for r in distributed_ntile(df, "v", "id", k=k).collect()
    }
    assert got_bin == want_bin


def test_uniform(spark):
    _check(spark, list(range(97)))


def test_skewed_single_value(spark):
    # 80% one value: one range bucket holds most rows; ranks still exact
    _check(spark, [5] * 80 + list(range(20)))


def test_fewer_rows_than_tiles(spark):
    _check(spark, [3, 1, 2], k=10)


def test_duplicates_with_tiebreak(spark):
    _check(spark, [1, 2, 2, 2, 3, 3, 1, 1, 1] * 7, k=4)


@pytest.mark.parametrize("seed", [5, 17])
def test_random(spark, seed):
    import random

    rng = random.Random(seed)
    _check(spark, [rng.randint(0, 50) for _ in range(200)], k=7)
