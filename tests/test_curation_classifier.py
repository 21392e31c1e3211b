"""Unit tests for the session's curation operators: the hashed linear
classifier, the embedding outlier filter, cluster-balanced sampling, and
the PNG perceptual hash. Oracle parity is covered by test_oracle_parity;
these pin the semantic contracts the oracle compare can't see (weight
plug-in, invariances, edge cases)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.similarity import (
    cluster_balanced_sample,
    embedding_outlier_filter,
)
from mongo_iceberg_lakehouse_spark.operators.text import (
    _default_classifier_weights,
    hashed_linear_classifier,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_classifier_matches_hand_computed_score(spark):
    # one doc, hand-walk the hash -> bucket -> weight path
    weights = _default_classifier_weights(128, "w")
    text = "alpha beta alpha"
    expected = 0
    for tok in text.split():
        b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % 128
        expected += weights[b]
    out = hashed_linear_classifier(_docs(spark, [(1, text)])).collect()[0]
    assert out.n_tokens == 3
    assert out.score_micros == expected
    assert out.keep == (expected >= 0)


def test_classifier_empty_doc_kept_with_zero_score(spark):
    out = hashed_linear_classifier(_docs(spark, [(1, "")])).collect()[0]
    assert (out.n_tokens, out.score_micros, out.keep) == (0, 0, True)


def test_classifier_accepts_pretrained_weights(spark):
    # real model weights plug in: a table that loves 'good' and hates 'bad'
    b_good = int(hashlib.md5(b"good").hexdigest()[:8], 16) % 8
    b_bad = int(hashlib.md5(b"bad").hexdigest()[:8], 16) % 8
    w = [0] * 8
    w[b_good] = 1_000_000
    w[b_bad] = -1_000_000
    rows = hashed_linear_classifier(
        _docs(spark, [(1, "good good bad"), (2, "bad bad good")]),
        n_buckets=8,
        weights_micros=w,
    ).collect()
    by_id = {r.doc_id: r for r in rows}
    assert by_id[1].keep and by_id[1].score_micros == 1_000_000
    assert not by_id[2].keep and by_id[2].score_micros == -1_000_000


def test_classifier_threshold_is_mean_based(spark):
    # same per-token mean, different lengths: threshold decision agrees
    w = [100] * 8  # every token scores +100 micros
    rows = hashed_linear_classifier(
        _docs(spark, [(1, "a b"), (2, "a b c d e f")]),
        n_buckets=8,
        weights_micros=w,
        threshold_micros=100,
    ).collect()
    assert all(r.keep for r in rows)  # mean == threshold -> kept
    rows = hashed_linear_classifier(
        _docs(spark, [(1, "a b")]),
        n_buckets=8,
        weights_micros=w,
        threshold_micros=101,
    ).collect()
    assert not rows[0].keep


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def test_outlier_filter_drops_the_far_point(spark):
    # 4 clustered points + 1 far outlier in one group
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.1], 0),
        (3, [0.9, 0.0], 0),
        (4, [1.0, 0.0], 0),
        (5, [-100.0, 80.0], 0),
    ]
    out = {r.vec_id: r for r in embedding_outlier_filter(_vecs(spark, rows)).collect()}
    assert not out[5].keep
    assert all(out[i].keep for i in (1, 2, 3, 4))
    # dist2 is exact and the outlier dominates the total
    assert out[5].dist2 > sum(out[i].dist2 for i in (1, 2, 3, 4))


def test_outlier_filter_groups_are_independent(spark):
    # the same geometry duplicated into a second label must not interact
    base = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.1], 0),
        (3, [-5.0, 4.0], 0),
    ]
    shifted = [(i + 10, v, 1) for i, v, _ in base]
    out = {
        r.vec_id: r
        for r in embedding_outlier_filter(
            _vecs(spark, base + shifted)
        ).collect()
    }
    for i in (1, 2, 3):
        assert out[i].keep == out[i + 10].keep
        assert out[i].dist2 == out[i + 10].dist2


def test_cluster_balanced_sample_respects_quota(spark):
    import numpy as np

    rows = [
        (i, [float(x) for x in np.cos([i * 0.1, i * 0.2, i * 0.3, i])], 0)
        for i in range(40)
    ]
    out = cluster_balanced_sample(
        _vecs(spark, rows), k=4, per_cluster=3
    ).collect()
    per = {}
    for r in out:
        per.setdefault(r.cluster_id, []).append(r.sample_rank)
    for cid, ranks in per.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_cluster_balanced_sample_is_partitioning_invariant(spark):
    import numpy as np

    rows = [
        (i, [float(x) for x in np.sin([i * 0.7, i * 1.3, i * 0.2, i])], 0)
        for i in range(30)
    ]
    df = _vecs(spark, rows)
    a = sorted(
        (r.vec_id, r.cluster_id, r.sample_rank)
        for r in cluster_balanced_sample(df, k=3, per_cluster=2).collect()
    )
    b = sorted(
        (r.vec_id, r.cluster_id, r.sample_rank)
        for r in cluster_balanced_sample(
            df.repartition(7), k=3, per_cluster=2
        ).collect()
    )
    assert a == b


def test_ahash_is_brightness_invariant(spark):
    # two images identical up to a +EPS brightness shift (no mod wrap)
    # must collide; a structurally different image must not.
    import numpy as np

    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        ahash_png,
        png_encode,
    )

    rng = np.random.default_rng(7)
    base = rng.integers(10, 200, size=(6, 5, 3)).astype(np.uint8)
    shifted = (base.astype(np.int64) + 40).astype(np.uint8)  # max 240, no wrap
    other = rng.integers(10, 200, size=(6, 5, 3)).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, bytearray(png_encode(base))),
            (2, bytearray(png_encode(shifted))),
            (3, bytearray(png_encode(other))),
        ],
        "doc_id bigint, payload binary",
    )
    out = {r.doc_id: r.ahash for r in ahash_png(df).collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_classifier_null_text_scores_like_empty(spark):
    df = spark.createDataFrame([(1, None), (2, "a b")], "doc_id bigint, text string")
    out = {r.doc_id: r for r in hashed_linear_classifier(df).collect()}
    assert (out[1].n_tokens, out[1].score_micros, out[1].keep) == (0, 0, True)
    assert out[2].n_tokens == 2


def test_zero_norm_vectors_never_win_hard_negative_or_centroid(spark):
    from mongo_iceberg_lakehouse_spark.operators.similarity import (
        hard_negative_topk,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.1], 1),
        (3, [0.0, 0.0], 1),  # zero-norm: would be NaN-ranked #1 unguarded
        (4, [-1.0, 0.0], 1),
    ]
    out = hard_negative_topk(
        _vecs(spark, rows), n_queries=4, k=3
    ).collect()
    assert all(r.neighbor_id != 3 for r in out)
    assert all(r.query_id != 3 for r in out)
    # zero-norm vector must also never become a cluster centroid
    cbs = cluster_balanced_sample(_vecs(spark, rows), k=4, per_cluster=4).collect()
    assert all(r.cluster_id != 3 for r in cbs)
    # ...but it still appears in the sample (assignment keeps all rows)
    assert any(r.vec_id == 3 for r in cbs)


def test_semdedup_zero_vector_drops_no_cluster(spark):
    # a zero-norm vector with the smallest id made BOTH sides of the
    # cross-multiplied cosine test 0 (0 >= 0), silently dropping every
    # other member of its cluster — cosine to a zero vector is
    # undefined, never a near-dup
    from mongo_iceberg_lakehouse_spark.operators.similarity import (
        semdedup_prune,
    )

    rows = [
        (1, [0.0, 0.0], 0),  # zero-norm, smallest id
        (2, [1.0, 0.0], 0),
        (3, [0.0, 1.0], 0),  # orthogonal to 2: not a near-dup of anything
    ]
    out = {r.vec_id: r for r in semdedup_prune(_vecs(spark, rows), k=1).collect()}
    assert out[2].keep and out[3].keep
