"""Round-6 (verdict item 2): persistable ANN index artifacts + dispatch.

Artifacts (k-means centroid matrices, PQ codebooks) persist as versioned
snapshot tables and must round-trip EXACTLY (doubles through parquet are
lossless); ann_topk(strategy=...) is the single call site whose "auto"
thresholds are pinned here.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.ann_index import (
    BRUTE_MAX,
    INT8_MAX,
    IVF_MAX,
    ann_topk,
    choose_ann_strategy,
    load_centroids,
    load_pq_codebooks,
    save_centroids,
    save_pq_codebooks,
)
from mongo_iceberg_lakehouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_choose_ann_strategy_thresholds():
    # exact tiers by size
    assert choose_ann_strategy(1) == "brute"
    assert choose_ann_strategy(BRUTE_MAX) == "brute"
    assert choose_ann_strategy(BRUTE_MAX + 1) == "int8"
    assert choose_ann_strategy(INT8_MAX) == "int8"
    # approximate tiers
    assert choose_ann_strategy(INT8_MAX + 1) == "ivf"
    assert choose_ann_strategy(IVF_MAX) == "ivf"
    assert choose_ann_strategy(IVF_MAX + 1) == "pq"
    # a >=0.999 recall target forces the exact tiers at ANY size
    assert choose_ann_strategy(IVF_MAX + 1, recall_target=0.999) == "int8"
    assert choose_ann_strategy(100, recall_target=1.0) == "brute"
    # a lower target keeps the size-based pick
    assert choose_ann_strategy(IVF_MAX + 1, recall_target=0.5) == "pq"


def test_centroids_roundtrip_exact(spark, tmp_path):
    base = str(tmp_path / "idx")
    cents = [[0.1, -2.5e-17, 3.0], [1.0 / 3.0, 7.25, -0.0]]
    v = save_centroids(spark, base, "c", cents)
    assert v == 1
    got = load_centroids(spark, base, "c")
    assert got == cents  # exact float equality — parquet doubles lossless


def test_centroids_snapshot_replace_versions(spark, tmp_path):
    base = str(tmp_path / "idx")
    v1 = save_centroids(spark, base, "c", [[1.0, 2.0]])
    v2 = save_centroids(spark, base, "c", [[3.0, 4.0]])
    assert (v1, v2) == (1, 2)
    assert load_centroids(spark, base, "c") == [[3.0, 4.0]]  # latest
    assert load_centroids(spark, base, "c", version=1) == [[1.0, 2.0]]


def test_pq_codebooks_roundtrip_exact(spark, tmp_path):
    base = str(tmp_path / "idx")
    books = [
        [[0.5, 1.5], [2.5, 3.5], [4.5, 5.5]],
        [[-1.0, 1e-300], [0.0, 9.9], [7.0, 8.0]],
    ]
    save_pq_codebooks(spark, base, "pq", books)
    assert load_pq_codebooks(spark, base, "pq") == books


def test_ann_topk_auto_small_equals_bruteforce(spark):
    from mongo_iceberg_lakehouse_spark.operators.similarity import (
        ann_topk_bruteforce,
    )

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 3)
    auto = ann_topk(e, q, k=4, strategy="auto", n_rows=200)
    brute = ann_topk_bruteforce(e, q, k=4, include_sim=False).select(
        "query_id", "neighbor_id", "rank"
    )
    assert auto.exceptAll(brute).count() == 0
    assert brute.exceptAll(auto).count() == 0


def test_ann_topk_pretrained_centroids_match_inline(spark, tmp_path):
    from mongo_iceberg_lakehouse_spark.operators.similarity import (
        kmeans_centroids,
    )

    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 4)
    cents = kmeans_centroids(e, n_centroids=8)
    base = str(tmp_path / "idx")
    save_centroids(spark, base, "ivf", cents)
    loaded = load_centroids(spark, base, "ivf")
    assert loaded == [[float(x) for x in c] for c in cents]
    a = ann_topk(e, q, k=5, strategy="ivf", centroids=cents)
    b = ann_topk(e, q, k=5, strategy="ivf", centroids=loaded)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_ann_topk_unknown_strategy_raises(spark):
    e = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="unknown ANN strategy"):
        ann_topk(e, e.limit(1), strategy="faiss")


def test_ann_topk_every_strategy_runs_uniform_schema(spark):
    e = load_table(spark, SF, "embeddings")
    q = e.filter(F.col("vec_id") < 2)
    for strat in ("brute", "blocked", "int8", "ivf", "pq", "lsh"):
        out = ann_topk(e, q, k=3, strategy=strat)
        assert out.columns == ["query_id", "neighbor_id", "rank"], strat
        assert out.count() > 0, strat
