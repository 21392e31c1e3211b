"""approx_percentile accuracy knob: verify the published rank-error contract.

Spark's approx_percentile is a Greenwald-Khanna-style sketch whose contract
is RANK error, not value error: for accuracy `a`, the returned value's rank
is within n/a of the target rank. This harness measures the actual rank
displacement on the lineitem price column at three accuracy settings —
documenting the accuracy/cost knob an operator would tune at 100 TB (the
sketch is mergeable, so the shuffle carries one sketch per partition instead
of the column).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"
PCTS = [0.5, 0.95, 0.99]


@pytest.fixture(scope="module")
def prices(spark):
    return (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select("l_extendedprice")
        .cache()
    )


@pytest.mark.parametrize("accuracy", [100, 1000, 10000])
def test_rank_error_within_contract(spark, prices, accuracy):
    n = prices.count()
    approx = prices.agg(
        F.percentile_approx(
            "l_extendedprice", PCTS, accuracy
        ).alias("qs")
    ).collect()[0]["qs"]
    for p, v in zip(PCTS, approx):
        target_rank = p * n
        actual_rank = prices.filter(F.col("l_extendedprice") <= v).count()
        # GK contract: |rank - target| <= n/accuracy (+1 row of slack for
        # boundary ties)
        assert abs(actual_rank - target_rank) <= n / accuracy + 1, (
            f"p={p} accuracy={accuracy}: rank {actual_rank} vs {target_rank}"
        )


def test_higher_accuracy_is_no_worse_at_median(spark, prices):
    n = prices.count()
    errs = {}
    for accuracy in (100, 10000):
        v = prices.agg(
            F.percentile_approx("l_extendedprice", 0.5, accuracy).alias("q")
        ).collect()[0]["q"]
        rank = prices.filter(F.col("l_extendedprice") <= v).count()
        errs[accuracy] = abs(rank - 0.5 * n)
    assert errs[10000] <= max(errs[100], n / 10000 + 1)
