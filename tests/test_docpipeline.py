"""Curation pipeline: every lineage status reachable, priority respected."""

from __future__ import annotations

import pytest

from mongo_iceberg_lakehouse_spark.plans.docpipeline import curate_documents

LONG_EN = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun"
)
LONG_EN_NEAR = LONG_EN.replace("afternoon", "evening")
LONG_ES = (
    "el perro corre por la plaza y los gatos miran desde la ventana "
    "mientras que la gente pasea por las calles de la ciudad"
)
SHORT = "too short"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, LONG_EN),          # kept
        (2, LONG_EN),          # exact dup of 1 -> drop_exact_dup
        (3, "  ".join(LONG_EN.upper().split())),  # case/whitespace variant -> exact dup
        (4, LONG_EN_NEAR),     # near dup of 1 -> drop_near_dup
        (5, SHORT),            # drop_quality (under 10 tokens)
        (6, LONG_ES),          # drop_lang
        (7, "completely different content about spark query engines and "
            "lakehouse tables running on large clusters"),  # kept
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_all_statuses_and_priority(corpus):
    log = curate_documents(corpus, jaccard_threshold=0.5)
    got = {r["doc_id"]: r["status"] for r in log.collect()}
    assert got[1] == "kept"
    assert got[2] == "drop_exact_dup"
    assert got[3] == "drop_exact_dup"  # canonicalized fingerprint match
    assert got[4] == "drop_near_dup"
    assert got[5] == "drop_quality"
    assert got[6] == "drop_lang"
    assert got[7] == "kept"
    assert len(got) == 7  # exactly one decision per input document


def test_near_dup_stage_only_sees_survivors(corpus):
    # doc 2 is an exact dup: it must NOT be reported as near-dup even though
    # it is trivially near doc 1 — priority is exact > near.
    log = curate_documents(corpus, jaccard_threshold=0.5)
    statuses = {r["doc_id"]: r["status"] for r in log.collect()}
    assert statuses[2] == "drop_exact_dup"
