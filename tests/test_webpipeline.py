"""Round-6 (verdict item 3): composed web-crawl curation funnel.

Crafted corpus where every stage fires, pinning the survivor-restricted
semantics: a blocked page must NOT win a canonical-URL group (its
unblocked duplicate survives), the domain cap ranks only URL-unique
pages, and near-dup runs only on the post-exact pool.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.plans.webpipeline import (
    WEB_STATUS_ORDER,
    curate_web_documents,
    web_funnel_counts,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and runs to the hills "
    "in a bright morning of the spring"
)
GOOD2 = (
    "a calm evening settles over the valley and the river is slow to "
    "move under the old stone bridge of the town"
)


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, url string, n_chars int, text string"
    )


def _blocked(spark):
    return spark.createDataFrame([("bad.com",)], "blocked_domain string")


def _statuses(spark, rows, cap=5, **kw):
    log = curate_web_documents(
        _docs(spark, rows), _blocked(spark), cap=cap, **kw
    )
    return {r["doc_id"]: r["status"] for r in log.collect()}


def test_blocked_page_cannot_shadow_unblocked_duplicate(spark):
    rows = [
        # doc 1 (blocked domain) and doc 2 share a canonical URL after
        # scheme/www/tracking normalization; doc 2 must be KEPT, not
        # demoted to drop_url_dup by the blocked doc's smaller id
        (1, "https://bad.com/p?utm_source=x", 100, GOOD),
        (2, "http://www.good.com/p?utm_source=x", 100, GOOD),
        (3, "https://good.com/p#frag", 100, GOOD2),  # dup of 2's canon? no: same canon as 2
    ]
    st = _statuses(spark, rows)
    assert st[1] == "drop_blocklist"
    # 2 and 3 canonicalize to good.com/p -> min id 2 wins, 3 is url-dup
    assert st[2] == "kept"
    assert st[3] == "drop_url_dup"


def test_domain_cap_ranks_only_url_unique_pages(spark, tmp_path):
    # 3 distinct URLs on one domain, cap=2: the two LONGEST survive the
    # cap; URL duplicates must not consume cap slots
    rows = [
        (1, "https://a.com/x", 50, GOOD),
        (2, "https://a.com/x?utm_a=1", 999, GOOD2),  # url-dup of 1 (id 1 wins)
        (3, "https://a.com/y", 80, GOOD2),
        (4, "https://a.com/z", 70, GOOD + " extra words here now"),
    ]
    st = _statuses(spark, rows, cap=2)
    assert st[2] == "drop_url_dup"
    # among URL-unique {1 (50), 3 (80), 4 (70)}: cap keeps 3 and 4
    assert st[1] == "drop_domain_cap"
    assert st[3] == "kept" and st[4] == "kept"


def test_quality_lang_exact_near_stages(spark):
    rows = [
        (1, "https://a.com/1", 10, "too short"),  # quality drop
        (2, "https://a.com/2", 90, "el la de los las que y el la de los las que y el la"),  # lang
        (3, "https://a.com/3", len(GOOD), GOOD),
        (4, "https://a.com/4", len(GOOD), GOOD),  # exact dup of 3
        (5, "https://a.com/5", len(GOOD), GOOD + " tail"),  # near dup of 3
        (6, "https://a.com/6", len(GOOD2), GOOD2),
    ]
    st = _statuses(spark, rows, cap=10, jaccard_threshold=0.2)
    assert st[1] == "drop_quality"
    assert st[2] == "drop_lang"
    assert st[3] == "kept"
    assert st[4] == "drop_exact_dup"
    assert st[5] == "drop_near_dup"
    assert st[6] == "kept"


def test_funnel_counts_conserve_docs_and_order(spark):
    rows = [
        (1, "https://bad.com/p", 100, GOOD),
        (2, "https://a.com/x", 100, GOOD),
        (3, "https://a.com/x?utm_a=1", 100, GOOD),
        (4, "https://a.com/q", 10, "tiny"),
        (5, "https://a.com/r", 100, GOOD2),
    ]
    log = curate_web_documents(_docs(spark, rows), _blocked(spark))
    funnel = web_funnel_counts(log).collect()
    assert sum(r["n_docs"] for r in funnel) == len(rows)
    idx = [WEB_STATUS_ORDER.index(r["status"]) for r in funnel]
    assert idx == sorted(idx)
    # token conservation: funnel token mass == per-doc token mass
    tok = log.agg(F.sum("n_tokens")).collect()[0][0]
    assert sum(r["n_tokens"] for r in funnel) == tok
