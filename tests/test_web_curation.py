"""URL/domain curation operators (operators/web.py, round-5 item 5)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from mongo_iceberg_lakehouse_spark.operators import web as WB


def _canon(spark, url: str) -> str:
    df = spark.createDataFrame([(url,)], "url string")
    return df.select(WB.canonical_url(F.col("url")).alias("c")).first()["c"]


@pytest.mark.parametrize(
    ("url", "want"),
    [
        # scheme + www + default port + trailing slash all normalize away
        ("https://www.foo-ex.com:443/art/3/", "foo-ex.com/art/3"),
        ("http://foo-ex.com:80/art/3", "foo-ex.com/art/3"),
        # non-default port is load-bearing and stays
        ("https://foo-ex.com:8080/art/3", "foo-ex.com:8080/art/3"),
        # tracking params stripped, semantic params kept, fragment dropped
        (
            "https://foo-ex.com/a?utm_source=rss&utm_medium=es#sec2",
            "foo-ex.com/a",
        ),
        ("https://foo-ex.com/a?id=2#x", "foo-ex.com/a?id=2"),
        ("https://foo-ex.com/a?utm_source=r&id=2", "foo-ex.com/a?id=2"),
        # trailing path slash goes even when a query follows
        ("https://foo-ex.com/a/?id=2", "foo-ex.com/a?id=2"),
        # http vs https alias to the same canonical form
        ("http://www.foo-ex.com/a", "foo-ex.com/a"),
    ],
)
def test_canonical_url(spark, url, want):
    assert _canon(spark, url) == want


def test_registrable_domain_multi_label_suffix(spark):
    df = spark.createDataFrame(
        [
            ("cdn.src3-ex.co.uk",),
            ("www.src3-ex.com",),
            ("src3-ex.com",),
            ("a.b.src9-ex.com.au",),
        ],
        "host string",
    )
    out = [
        r["d"]
        for r in df.select(
            WB.registrable_domain(F.col("host")).alias("d")
        ).collect()
    ]
    assert out == [
        "src3-ex.co.uk",
        "src3-ex.com",
        "src3-ex.com",
        "src9-ex.com.au",
    ]


def test_domain_cap_is_window_group_limit(spark):
    df = spark.createDataFrame(
        [(i, f"d{i % 3}", 100 - i) for i in range(30)],
        "doc_id int, domain string, n_chars int",
    )
    out = WB.domain_cap(df, cap=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    rows = out.collect()
    assert len(rows) == 6  # 3 domains x cap 2
    # deterministic: longest docs first, doc_id tiebreak
    best_d0 = sorted(
        (r for r in rows if r["domain"] == "d0"), key=lambda r: r["rk"]
    )
    assert [r["doc_id"] for r in best_d0] == [0, 3]


def test_blocklist_filter_broadcasts_and_flags(spark):
    docs = spark.createDataFrame(
        [(1, "bad-ex.com"), (2, "good-ex.org"), (3, "bad-ex.com")],
        "doc_id int, domain string",
    )
    blocked = spark.createDataFrame([("bad-ex.com",)], "blocked_domain string")
    out = WB.domain_blocklist_filter(docs, blocked)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    kept = {r["doc_id"]: r["kept"] for r in out.collect()}
    assert kept == {1: False, 2: True, 3: False}


def test_image_text_alignment_null_caption_scores_zero(spark):
    from mongo_iceberg_lakehouse_spark.operators.multimodal import (
        image_text_alignment_filter,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "a caption here")], "doc_id long, text string"
    )
    embs = spark.createDataFrame(
        [(1, [1.0] * 64), (2, [0.5] * 64)],
        "vec_id long, embedding array<float>",
    )
    out = {r["doc_id"]: r for r in image_text_alignment_filter(
        docs, embs
    ).collect()}
    # NULL caption == empty caption: 0 tokens, score 0, kept (funnel
    # counts stay exact)
    assert out[1]["n_tokens"] == 0
    assert out[1]["score_micros"] == 0
    assert out[1]["keep"] is True
    assert out[2]["n_tokens"] == 3
