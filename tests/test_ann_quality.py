"""ANN quality harness: recall of the approximate variants (LSH, IVF)
against the exact brute-force top-k on the real embeddings fixture."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ann_topk_lsh,
)
from mongo_iceberg_lakehouse_spark.sources.tables import load_table

from .conftest import SF_SMOKE

K = 10
N_QUERIES = 8


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


@pytest.fixture(scope="module")
def truth(spark, emb):
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    rows = ann_topk_bruteforce(emb, q, k=K).collect()
    return {(r.query_id, r.neighbor_id) for r in rows}


def _recall(approx_rows, truth) -> float:
    approx = {(r.query_id, r.neighbor_id) for r in approx_rows}
    return len(approx & truth) / len(truth)


def test_lsh_recall_vs_bruteforce(spark, emb, truth):
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    # uniform random vectors are LSH's worst case (neighbors sit at ~60-70°);
    # 8 tables x 4 bits lifts per-neighbor hit probability to ~0.6-0.8
    rows = ann_topk_lsh(emb, q, k=K, dim=64, bits=4, tables=8).collect()
    r = _recall(rows, truth)
    assert r >= 0.4, f"LSH recall {r} below sanity floor"


def test_ivf_recall_vs_bruteforce(spark, emb, truth):
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    rows = ann_topk_ivf(emb, q, k=K, n_centroids=16, n_probe=8).collect()
    r = _recall(rows, truth)
    # probing half the lists on structureless (random) vectors recovers
    # roughly that fraction of true neighbors; assert a conservative floor
    assert r >= 0.35, f"IVF recall {r} below sanity floor"


def test_approx_results_are_subsets_of_corpus(spark, emb, truth):
    # every reported neighbor exists and no self-matches leak through
    q = emb.filter(F.col("vec_id") < N_QUERIES)
    for rows in (
        ann_topk_lsh(emb, q, k=K, dim=64, bits=6).collect(),
        ann_topk_ivf(emb, q, k=K, n_centroids=16, n_probe=4).collect(),
    ):
        for r in rows:
            assert r.neighbor_id != r.query_id
            assert 1 <= r.rank <= K

def test_ivf_kmeans_recall_vs_bruteforce(spark, emb, truth):
    from mongo_iceberg_lakehouse_spark.operators.similarity import kmeans_centroids

    q = emb.filter(F.col("vec_id") < N_QUERIES)
    cents = kmeans_centroids(emb, n_centroids=16)
    rows = ann_topk_ivf(emb, q, k=K, n_probe=8, centroids=cents).collect()
    r = _recall(rows, truth)
    # trained lists should do at least as well as the sampled quantizer's
    # floor at the same probe budget
    assert r >= 0.35, f"k-means IVF recall {r} below sanity floor"


def test_pq_recall_vs_bruteforce(spark, emb, truth):
    from mongo_iceberg_lakehouse_spark.operators.similarity import ann_topk_pq

    q = emb.filter(F.col("vec_id") < N_QUERIES)
    rows = ann_topk_pq(emb, q, k=K, rerank_factor=4).collect()
    r = _recall(rows, truth)
    # 8x8-dim subspaces at 16 centroids on random vectors: the ADC
    # shortlist at 4x overfetch recovers most true neighbors; exact
    # rerank then orders them correctly. Conservative floor.
    assert r >= 0.4, f"PQ recall {r} below sanity floor"


def test_pq_rank_positions_exactly_ordered(spark, emb):
    # within the returned rows, rank must follow exact cosine descending
    from mongo_iceberg_lakehouse_spark.functions.vectors import cosine_similarity
    from mongo_iceberg_lakehouse_spark.operators.similarity import ann_topk_pq

    q = emb.filter(F.col("vec_id") < 2)
    out = ann_topk_pq(emb, q, k=5)
    nv = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("nv"))
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    sims = (
        out.join(nv, "neighbor_id").join(qv, "query_id")
        .withColumn("sim", cosine_similarity("nv", "qv"))
        .orderBy("query_id", "rank")
        .collect()
    )
    by_q = {}
    for r in sims:
        by_q.setdefault(r.query_id, []).append(r.sim)
    for q_id, s in by_q.items():
        assert s == sorted(s, reverse=True), f"query {q_id} ranks not sim-ordered"


def test_neardup_topk_ivf_recall_vs_exact(spark, emb):
    """The sub-quadratic IVF near-dup's per-doc neighbor sets against the
    exact blocked variant: every returned neighbor must be a true
    >=threshold neighbor (precision 1.0 by construction — sims are exact
    within probed lists), and aggregate recall of (doc, neighbor) pairs
    must clear a sanity floor."""
    from mongo_iceberg_lakehouse_spark.operators.similarity import (
        cosine_neardup_topk,
        cosine_neardup_topk_ivf,
    )

    exact = {
        (r["doc_id"], r["neighbor_id"])
        for r in cosine_neardup_topk(emb, threshold=0.4, k=3).collect()
    }
    approx_rows = cosine_neardup_topk_ivf(
        emb, threshold=0.4, k=3, n_centroids=8, n_probe=3
    ).collect()
    approx = {(r["doc_id"], r["neighbor_id"]) for r in approx_rows}
    # every emitted sim is exactly computed, so any (doc, neighbor) the
    # IVF returns that exact top-k lacks must still be a real >=0.4
    # neighbor (just below the doc's exact top-3); spot-check threshold
    assert all(r["sim_micro"] >= 400000 for r in approx_rows)
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.5, f"IVF near-dup recall {recall} below floor"
