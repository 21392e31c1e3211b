"""Deletion-neighborhood fuzzy join: planted pairs at each edit kind
(substitution, insertion, deletion), and distance-2 exclusion."""

from __future__ import annotations

from mongo_iceberg_lakehouse_spark.operators.text import fuzzy_pairs_ed1


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, "id long, s string")
    return {
        (r["a_id"], r["b_id"])
        for r in fuzzy_pairs_ed1(df, "id", "s").collect()
    }


def test_fuzzy_ed1_substitution_insertion_deletion(spark):
    rows = [
        (1, "spark"),
        (2, "stark"),   # substitution vs 1
        (3, "sparkk"),  # insertion vs 1
        (4, "spak"),    # deletion vs 1 (and distance 2 vs 2)
        (5, "flink"),   # unrelated
    ]
    got = _pairs(spark, rows)
    assert (1, 2) in got
    assert (1, 3) in got
    assert (1, 4) in got
    assert all(5 not in p for p in got)


def test_fuzzy_ed1_excludes_distance_two(spark):
    got = _pairs(spark, [(1, "abcdef"), (2, "abzzef")])
    assert got == set()


def test_fuzzy_ed1_identical_strings_pair(spark):
    # Exact duplicates are distance 0 <= 1: must pair once (a_id < b_id).
    got = _pairs(spark, [(1, "same"), (2, "same")])
    assert got == {(1, 2)}
