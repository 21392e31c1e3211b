"""Secondary-sort streaming consumer: longest_run_per_key.

The cross-batch carry is the risky part, so the main test forces tiny Arrow
batches (maxRecordsPerBatch=3) to make every run and key span batches, and
compares against a plain-Python reference implementation.
"""

from __future__ import annotations

import itertools

import pytest

from mongo_iceberg_lakehouse_spark.operators.ordered import longest_run_per_key


def _ref(rows):
    """Reference: rows = [(key, order, value)]; earliest max run per key."""
    out = {}
    rows = sorted(rows, key=lambda r: (r[0], r[1]))
    for k, grp in itertools.groupby(rows, key=lambda r: r[0]):
        best_len, best_val = 0, None
        for v, run in itertools.groupby(grp, key=lambda r: r[2]):
            ln = len(list(run))
            if ln > best_len:
                best_len, best_val = ln, v
        out[k] = (best_len, best_val)
    return out


ROWS = [
    # key 1: runs a,a,a | b | a,a  -> (3, 'a')
    (1, 1, "a"), (1, 2, "a"), (1, 3, "a"), (1, 4, "b"), (1, 5, "a"), (1, 6, "a"),
    # key 2: tie 2-2 -> earliest run wins: (2, 'x')
    (2, 1, "x"), (2, 2, "x"), (2, 3, "y"), (2, 4, "y"),
    # key 3: single row
    (3, 1, "z"),
    # key 4: one long run spanning many batches
    *[(4, i, "w") for i in range(1, 11)],
]


@pytest.mark.parametrize("batch_size", [3, 1000])
def test_longest_run_matches_reference(spark, batch_size):  # noqa: F811
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    try:
        df = spark.createDataFrame(ROWS, "k long, o long, v string")
        got = {
            r["k"]: (r["streak_len"], r["streak_val"])
            for r in longest_run_per_key(
                df, "k", ["o"], "v", num_partitions=2
            ).collect()
        }
        assert got == _ref(ROWS)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


def test_shuffled_input_same_answer(spark):  # noqa: F811
    rows = list(reversed(ROWS))
    df = spark.createDataFrame(rows, "k long, o long, v string").repartition(7)
    got = {
        r["k"]: (r["streak_len"], r["streak_val"])
        for r in longest_run_per_key(df, "k", ["o"], "v").collect()
    }
    assert got == _ref(ROWS)


def test_cogrouped_interval_match(spark):  # noqa: F811
    """Hand-computed pairs: per key, #(l,r) with l.ts <= r.ts <= l.ts+window."""
    import datetime as dt

    from mongo_iceberg_lakehouse_spark.operators.ordered import (
        cogrouped_interval_match,
    )

    t0 = dt.datetime(2024, 1, 1)

    def ts(sec):
        return t0 + dt.timedelta(seconds=sec)

    # key 1: left at 0, 100; right at 5, 50, 130, 400 (window=60)
    #   left 0   -> rights in [0, 60]: 5, 50        -> 2
    #   left 100 -> rights in [100, 160]: 130       -> 1  => 3 pairs
    # key 2: left at 0; right at 61 (outside)       => 0 pairs -> filtered out
    # key 3: right only -> no left rows             => absent
    left = spark.createDataFrame(
        [(1, ts(0)), (1, ts(100)), (2, ts(0))], "k long, lts timestamp"
    )
    right = spark.createDataFrame(
        [(1, ts(5)), (1, ts(50)), (1, ts(130)), (1, ts(400)),
         (2, ts(61)), (3, ts(10))],
        "k long, rts timestamp",
    )
    got = {
        r["k"]: r["n_pairs"]
        for r in cogrouped_interval_match(
            left, right, "k", "lts", "rts", window_seconds=60
        ).collect()
    }
    assert got == {1: 3}


def _record_highs_ref(rows):
    """rows = [(key, order, value)] -> {key: n strict running-max records}."""
    out = {}
    for k, _, v in sorted(rows, key=lambda r: (r[0], r[1])):
        best, cnt = out.get(k, (float("-inf"), 0))
        if v > best:
            out[k] = (v, cnt + 1)
        else:
            out[k] = (best, cnt)
    return {k: c for k, (_, c) in out.items()}


@pytest.mark.parametrize("batch_size", [2, 1000])
def test_grouped_ordered_fold_record_highs(spark, batch_size):  # noqa: F811
    """Generic fold API: record-high counts vs plain-Python reference,
    with tiny Arrow batches so keys and states span batch boundaries."""
    from mongo_iceberg_lakehouse_spark.operators.ordered import (
        record_highs_per_key,
    )

    rows = [
        # key 1: 5, 3, 7, 7, 9 -> highs at 5, 7, 9 = 3 (tie 7 not a high)
        (1, 1, 5.0), (1, 2, 3.0), (1, 3, 7.0), (1, 4, 7.0), (1, 5, 9.0),
        # key 2: strictly decreasing -> only the first = 1
        (2, 1, 9.0), (2, 2, 8.0), (2, 3, 7.0),
        # key 3: strictly increasing long run spanning batches -> all 10
        *[(3, i, float(i)) for i in range(1, 11)],
        # key 4: single row
        (4, 1, 0.0),
    ]
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", str(batch_size))
    try:
        df = spark.createDataFrame(rows, "k long, o long, v double").repartition(5)
        got = {
            r["k"]: r["n_records"]
            for r in record_highs_per_key(df, "k", ["o"], "v", num_partitions=2).collect()
        }
        assert got == _record_highs_ref(rows)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
