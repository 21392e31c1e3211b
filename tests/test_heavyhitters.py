"""Heavy hitters: MG superset guarantee, CMS one-sidedness, end-to-end
exactness vs a plain groupBy on skewed synthetic data.
"""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.heavyhitters import (
    cms_build,
    cms_estimate,
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _skewed_tokens(n=20000, seed=7):
    """Zipf-ish: a few hot tokens over a long uniform tail."""
    rng = random.Random(seed)
    hot = [f"hot{i}" for i in range(5)]
    out = []
    for _ in range(n):
        r = rng.random()
        if r < 0.30:
            out.append(hot[int(r * 100) % 5])
        else:
            out.append(f"tail{rng.randrange(3000)}")
    return out


def test_mg_superset_guarantee(spark):
    """Every token with count > N/(k+1) must appear in the MG candidates,
    even with k far below the distinct count and multiple partitions."""
    toks = _skewed_tokens()
    n = len(toks)
    k = 50  # distinct ~3005, so real decrements happen
    df = spark.createDataFrame([(t,) for t in toks], "token string").repartition(8)
    cand = {r["token"] for r in misra_gries_candidates(df, "token", k).collect()}
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    must_have = {t for t, c in exact.items() if c > n / (k + 1)}
    assert must_have, "test data must contain guaranteed-heavy tokens"
    assert must_have <= cand


def test_cms_estimates_never_undercount(spark):
    toks = _skewed_tokens(n=5000)
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    depth, width = 4, 512  # narrow sketch to force collisions
    cms = cms_build(df, "token", depth, width)
    probes = df.select("token").distinct()
    est = {
        r["token"]: r["est"]
        for r in cms_estimate(probes, cms, depth, width).collect()
    }
    exact = {}
    for t in toks:
        exact[t] = exact.get(t, 0) + 1
    assert all(est[t] >= c for t, c in exact.items())
    # with 512 buckets and ~3000 keys some estimates must exceed truth
    assert any(est[t] > c for t, c in exact.items())


def test_heavy_hitters_exact_matches_groupby(spark):
    toks = _skewed_tokens()
    n = len(toks)
    phi = 0.01
    threshold = math.ceil(phi * n)
    df = spark.createDataFrame([(t,) for t in toks], "token string").repartition(8)
    got = {
        (r["token"], r["cnt"])
        for r in heavy_hitters_exact(
            df, "token", threshold, k=math.ceil(1 / phi), depth=4, width=1024
        ).collect()
    }
    want = {
        (r["token"], r["cnt"])
        for r in df.groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") >= threshold)
        .collect()
    }
    assert want, "threshold too high: no heavy hitters in test data"
    assert got == want
