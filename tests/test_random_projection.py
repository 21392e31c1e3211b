"""Johnson-Lindenstrauss random projection: exactness and the distance-
preservation property that justifies using it ahead of ANN."""

import math

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.similarity import (
    _jl_signs,
    random_projection,
)


def test_one_hot_recovers_sign_column(spark):
    # e_i projects to column i of the sign matrix (times 1e6)
    dim, out = 8, 4
    signs = _jl_signs(dim, out)
    rows = [(i, [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(dim)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out_df = random_projection(df, in_dim=dim, out_dim=out)
    got = {(r["vec_id"], r["k"]): r["proj_micro"] for r in out_df.collect()}
    for i in range(dim):
        for k in range(out):
            assert got[(i, k)] == signs[k][i] * 1_000_000


def test_projection_is_zero_shuffle(spark):
    df = spark.createDataFrame(
        [(0, [0.5] * 64)], "vec_id bigint, embedding array<float>"
    )
    plan = random_projection(df, 64, 16)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_pairwise_distances_preserved(spark):
    # deterministic pseudo-random vectors; JL with 16 of 64 dims should
    # keep relative pairwise L2 distances well correlated
    import hashlib

    def vec(seed):
        return [
            (int(hashlib.md5(f"{seed}:{j}".encode()).hexdigest()[:8], 16)
             / 0xFFFFFFFF - 0.5)
            for j in range(64)
        ]

    vecs = {i: vec(i) for i in range(12)}
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    proj = random_projection(df, 64, 16).collect()
    pv = {}
    for r in proj:
        pv.setdefault(r["vec_id"], [0] * 16)[r["k"]] = r["proj_micro"] / 1e6

    def d(a, b):
        return math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))

    # the JL guarantee is PER-PAIR (1 +- eps) distance distortion, not
    # correlation: random high-dim vectors have concentrated (near-equal)
    # pairwise distances, so correlation of near-constants is noise. At
    # k=16, eps ~ sqrt(ln n / k) ~ 0.4; measured ratios here are
    # [0.65, 1.30] with mean 0.956 (deterministic inputs + matrix).
    ratios = []
    ids = sorted(vecs)
    for a in ids:
        for b in ids:
            if a < b:
                # E[||Px||^2] = out_dim * ||x||^2 for +-1 signs => rescale
                ratios.append(d(pv[a], pv[b]) / math.sqrt(16) / d(vecs[a], vecs[b]))
    assert min(ratios) > 0.5, min(ratios)
    assert max(ratios) < 1.5, max(ratios)
    mean = sum(ratios) / len(ratios)
    assert 0.85 < mean < 1.15, mean
