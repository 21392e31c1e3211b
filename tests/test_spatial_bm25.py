"""Grid radius join vs brute force; BM25 ranking sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.spatial import radius_pairs_grid
from mongo_iceberg_lakehouse_spark.operators.text import bm25_scores


def test_radius_pairs_match_bruteforce(spark):
    # deterministic scatter incl. cell-boundary-straddling pairs
    pts = [(i, (i * 13) % 97, (i * 29) % 89) for i in range(200)]
    df = spark.createDataFrame(pts, "id long, x long, y long")
    got = {
        (r["id_a"], r["id_b"], r["dist2"])
        for r in radius_pairs_grid(df, radius=7).collect()
    }
    want = set()
    for i, xi, yi in pts:
        for j, xj, yj in pts:
            d2 = (xi - xj) ** 2 + (yi - yj) ** 2
            if i < j and d2 <= 49:
                want.add((i, j, d2))
    assert got == want and len(want) > 0


def test_bm25_ranks_term_density(spark):
    docs = [
        (1, "hash hash hash join"),          # dense in query terms
        (2, "hash filler filler filler filler filler filler filler"),
        (3, "filler words only no match here at all"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    scores = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["hash", "join"]).collect()
    }
    assert 3 not in scores  # no query term -> no row
    assert scores[1] > scores[2] > 0


def test_bm25_idf_downweights_ubiquitous_terms(spark):
    # 'common' appears in every doc, 'rare' in one: the rare term must
    # contribute more to its doc than 'common' does to an equal-tf doc
    docs = [(i, "common filler") for i in range(1, 10)] + [(10, "rare filler")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    s = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(df, ["common", "rare"]).collect()
    }
    assert s[10] > s[1]
