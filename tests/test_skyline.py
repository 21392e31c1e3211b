"""skyline_2d unit tests: dominance strictness, duplicate handling, and
equivalence to the quadratic definition on random data (hypothesis-free
randomized check with a fixed seed)."""

from __future__ import annotations

import random

from mongo_iceberg_lakehouse_spark.operators.relational import skyline_2d


def _sky(spark, rows):
    df = spark.createDataFrame(rows, "id long, price double, size int")
    return sorted(r["id"] for r in skyline_2d(df, "price", "size").collect())


def _sky_quadratic(rows):
    out = []
    for p in rows:
        dominated = any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in rows
        )
        if not dominated:
            out.append(p[0])
    return sorted(out)


def test_skyline_basic_frontier(spark):
    rows = [(1, 1.0, 5), (2, 2.0, 7), (3, 3.0, 6), (4, 1.5, 5), (5, 2.5, 9)]
    # 3 is dominated by 5 (cheaper? no: 2.5<3.0 and 9>6 -> dominated);
    # 4 is dominated by 1 (1.0<1.5, 5>=5).
    assert _sky(spark, rows) == [1, 2, 5]


def test_skyline_exact_duplicates_all_kept(spark):
    rows = [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4)]
    assert _sky(spark, rows) == [1, 2]


def test_skyline_same_price_bigger_size_dominates(spark):
    rows = [(1, 1.0, 5), (2, 1.0, 6)]
    assert _sky(spark, rows) == [2]


def test_skyline_matches_quadratic_on_random(spark):
    rng = random.Random(7)
    rows = [
        (i, float(rng.randint(0, 20)) / 2.0, rng.randint(0, 15))
        for i in range(120)
    ]
    assert _sky(spark, rows) == _sky_quadratic(rows)
