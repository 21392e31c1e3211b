"""Unit tests: SCD2 changelog collapse and int8 embedding quantization."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.relational import scd2_from_changelog
from mongo_iceberg_lakehouse_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_int8,
    quantize_int8,
)


@pytest.fixture(scope="module")
def changelog(spark):
    # key 1: A A B A  -> three versions (A, B, A); key 2: single row.
    rows = [
        (1, "A", 10, 100),
        (1, "A", 20, 101),
        (1, "B", 30, 102),
        (1, "A", 40, 103),
        (2, "X", 10, 104),
    ]
    return spark.createDataFrame(rows, ["k", "attr", "ts", "seq"])


def test_scd2_collapses_runs_and_closes_intervals(changelog):
    out = scd2_from_changelog(changelog, "k", "attr", "ts", "seq")
    got = {
        (r["k"], r["version"]): (r["attr"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    }
    assert got[(1, 1)] == ("A", 10, 30, False)  # run of two A rows collapsed
    assert got[(1, 2)] == ("B", 30, 40, False)
    assert got[(1, 3)] == ("A", 40, None, True)  # reopened attr = new version
    assert got[(2, 1)] == ("X", 10, None, True)
    assert len(got) == 4


def test_scd2_intervals_tile_the_timeline(changelog):
    out = scd2_from_changelog(changelog, "k", "attr", "ts", "seq").collect()
    by_key: dict[int, list] = {}
    for r in sorted(out, key=lambda r: (r["k"], r["version"])):
        by_key.setdefault(r["k"], []).append(r)
    for rows in by_key.values():
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]
        assert rows[-1]["valid_to"] is None
        assert sum(r["is_current"] for r in rows) == 1


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (1, [1.0, -2.0, 0.5, 3.0]),
        (2, [0.1, 0.2, -0.3, 0.4]),
        (3, [-5.0, 5.0, 5.0, -5.0]),
        (4, [2.0, 1.0, 0.0, -1.0]),
        (5, [0.9, -1.9, 0.6, 2.9]),  # near vector 1
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )


def test_quantize_int8_codes_bounded_and_reconstruct(vectors):
    z = quantize_int8(vectors).collect()
    for r in z:
        scale = r["scale"]
        assert scale > 0
        assert max(abs(c) for c in r["codes"]) <= 127
        for x, c in zip(r["embedding"], r["codes"]):
            # reconstruction error of half-up rounding is at most scale/2
            assert abs(c * scale - x) <= scale / 2 + 1e-9
    # max-magnitude element always maps to +/-127
    by_id = {r["vec_id"]: r for r in z}
    assert max(abs(c) for c in by_id[3]["codes"]) == 127


def test_quantize_int8_zero_vector_guard(spark):
    df = spark.createDataFrame([(1, [0.0, 0.0])], ["vec_id", "embedding"]).withColumn(
        "embedding", F.col("embedding").cast("array<float>")
    )
    r = quantize_int8(df).collect()[0]
    assert r["scale"] == 1.0 and list(r["codes"]) == [0, 0]


def test_ann_int8_matches_bruteforce_on_separated_data(vectors):
    exact = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk_bruteforce(
            vectors, vectors.filter(F.col("vec_id") <= 2), k=2, include_sim=False
        ).collect()
    }
    approx = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in ann_topk_int8(
            vectors, vectors.filter(F.col("vec_id") <= 2), k=2
        ).collect()
    }
    # rerank_factor*k covers the full corpus here, so int8 ANN is exact
    assert approx == exact
