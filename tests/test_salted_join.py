"""salted_join: result parity with the plain join (salting must be
plan-only), left-join row preservation, and the join-type guard."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.relational import salted_join


def _skewed(spark):
    # 90% of left rows share key 1 (the hot key), the rest spread out.
    left = spark.createDataFrame(
        [(1 if i % 10 else i, i) for i in range(1000)], "k long, payload long"
    )
    right = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(0, 1000, 7)], "k long, attr string"
    )
    return left, right


def test_salted_inner_equals_plain(spark):
    left, right = _skewed(spark)
    got = salted_join(left, right, "k", num_salts=4).orderBy("k", "payload")
    want = left.join(right, "k").orderBy("k", "payload")
    assert got.collect() == want.collect()


def test_salted_left_preserves_unmatched_once(spark):
    left, right = _skewed(spark)
    got = salted_join(left, right, "k", num_salts=4, how="left")
    want = left.join(right, "k", "left")
    assert got.count() == want.count()
    unmatched = got.where(F.col("attr").isNull())
    assert unmatched.count() == want.where(F.col("attr").isNull()).count()


def test_salted_join_rejects_outer(spark):
    left, right = _skewed(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(left, right, "k", how="full")
