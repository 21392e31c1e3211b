"""PageRank unit tests: hand-computed fixed point on a tiny graph, plus
the structural invariants (no dangling redistribution => mass < 1)."""

from __future__ import annotations

import pytest

from mongo_iceberg_lakehouse_spark.operators.graph import pagerank


def _ranks(spark, edges, **kw):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r["node"]: r["pr"] for r in pagerank(df, **kw).collect()}


def test_pagerank_cycle_uniform(spark):
    # 3-cycle: every node has in/outdeg 1 -> uniform 1/3 is the fixed
    # point, and every iteration maps 1/3 -> 0.05 + 0.85*(1/3) ... which
    # converges toward 1/3; after any #iterations all nodes are EQUAL.
    r = _ranks(spark, [(1, 2), (2, 3), (3, 1)], iterations=4)
    vals = list(r.values())
    assert len(r) == 3
    assert max(vals) - min(vals) < 1e-12


def test_pagerank_star_hand_computed(spark):
    # 1->3, 2->3 with one iteration from uniform 1/3:
    #   r(1) = r(2) = 0.15/3                      (no in-edges)
    #   r(3) = 0.15/3 + 0.85*(1/3 + 1/3)
    r = _ranks(spark, [(1, 3), (2, 3)], iterations=1, checkpoint_every=0)
    assert r[1] == pytest.approx(0.15 / 3, abs=1e-12)
    assert r[2] == pytest.approx(0.15 / 3, abs=1e-12)
    assert r[3] == pytest.approx(0.15 / 3 + 0.85 * (2 / 3), abs=1e-12)


def test_pagerank_dangling_mass_leaks(spark):
    # 3 is a sink: its rank is never redistributed, total mass < 1.
    r = _ranks(spark, [(1, 3), (2, 3)], iterations=3)
    assert sum(r.values()) < 1.0


def test_pagerank_dedupes_and_drops_self_loops(spark):
    # Duplicate edge (1,3)x2 and self-loop (2,2) must not change outdeg
    # or contributions vs the clean graph.
    clean = _ranks(spark, [(1, 3), (2, 3)], iterations=2)
    dirty = _ranks(spark, [(1, 3), (1, 3), (2, 2), (2, 3)], iterations=2)
    assert clean == dirty


def test_pagerank_checkpoint_matches_uncheckpointed(spark):
    edges = [(1, 2), (2, 3), (3, 1), (1, 3), (4, 1)]
    a = _ranks(spark, edges, iterations=5, checkpoint_every=2)
    b = _ranks(spark, edges, iterations=5, checkpoint_every=0)
    assert a == b


def test_triangle_count_k4(spark):
    from mongo_iceberg_lakehouse_spark.operators.graph import triangle_count

    k4 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    df = spark.createDataFrame(k4, "src long, dst long")
    assert triangle_count(df).collect()[0]["triangles"] == 4


def test_triangle_count_square_no_diagonal(spark):
    from mongo_iceberg_lakehouse_spark.operators.graph import triangle_count

    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert triangle_count(df).collect()[0]["triangles"] == 0


def test_triangle_count_direction_and_dup_insensitive(spark):
    from mongo_iceberg_lakehouse_spark.operators.graph import triangle_count

    # Same triangle given with mixed directions, duplicates, a self-loop.
    df = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 2), (1, 3), (3, 3)], "src long, dst long"
    )
    assert triangle_count(df).collect()[0]["triangles"] == 1
