"""Brute-force verification of jaccard_cross_best_match on controlled
corpora: planted near-dups across the split, short-doc exclusion, tie
resolution, and empty-result behavior. The fixture-table oracle parity
lives in test_oracle_parity (dedup_cross_corpus_jaccard); this covers the
edge cases the fixture does not plant.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.dedup import (
    jaccard_cross_best_match,
)


def _brute(rows: list[tuple[int, str]], eval_ids: set[int],
           threshold: float = 0.5, n: int = 3):
    def sh(text: str) -> set[tuple[str, ...]]:
        ws = [w for w in text.split(" ") if w != ""]
        return {tuple(ws[i: i + n]) for i in range(len(ws) - n + 1)}

    docs = {i: sh(t) for i, t in rows if len(sh(t)) > 0}
    out = {}
    for c, ctk in docs.items():
        if c in eval_ids:
            continue
        best = None
        for e, etk in docs.items():
            if e not in eval_ids:
                continue
            inter = len(ctk & etk)
            union = len(ctk | etk)
            jm = (1000000 * inter) // union if union else 0
            if jm >= int(threshold * 1000000):
                key = (jm, -e)
                if best is None or key > best:
                    best = key
        if best is not None:
            out[c] = (-best[1], best[0])
    return out


def _run(spark, rows, eval_mod=5, threshold=0.5):
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["match_id"], r["jaccard_micros"])
        for r in jaccard_cross_best_match(
            df, F.col("doc_id") % eval_mod == 0, threshold=threshold
        ).collect()
    }
    eval_ids = {i for i, _ in rows if i % eval_mod == 0}
    assert got == _brute(rows, eval_ids, threshold)
    return got


def test_planted_cross_dup(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (0, base),                       # eval
        (1, base + " extra token"),      # corpus near-dup of 0
        (2, "completely different words here nothing shared at all ok"),
        (5, "another eval document with its own unique content body"),
        (7, base),                       # exact dup of eval 0
    ]
    got = _run(spark, rows)
    assert 7 in got and got[7][0] == 0 and got[7][1] == 1000000
    assert 1 in got and got[1][0] == 0
    assert 2 not in got


def test_tie_prefers_min_match_id(spark):
    txt = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # two identical eval docs -> corpus doc ties at jaccard 1.0; min id wins
    rows = [(0, txt), (5, txt), (1, txt)]
    got = _run(spark, rows)
    assert got[1] == (0, 1000000)


def test_short_docs_excluded_and_empty_ok(spark):
    rows = [
        (0, "just two"),              # eval, < shingle_n words: excluded
        (1, "just two words ok fine"),
        (3, "unrelated totally distinct content with different tokens"),
    ]
    got = _run(spark, rows)
    assert got == {}


def test_threshold_boundary_inclusive(spark):
    # corpus doc with exactly jaccard >= 0.5 against eval: 6 shared
    # shingles of 12 union -> 500000 micros, inclusive
    ev = "a b c d e f g h"          # shingles(3): 6
    co = "a b c d e f g h x y z"    # shingles: 9, inter 6, union 9 -> 0.666
    rows = [(0, ev), (1, co)]
    got = _run(spark, rows)
    assert got[1] == (0, 666666)


@pytest.mark.parametrize("seed", [11, 23])
def test_random_corpus_matches_brute_force(spark, seed):
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(40):
        L = rng.randint(0, 12)
        rows.append((i, " ".join(rng.choice(vocab) for _ in range(L))))
    # plant a few cross-split near-dups
    for i in (3, 7, 11):
        src = rows[i - (i % 5)][1]  # an eval doc's text (i - i%5 is % 5 == 0)
        rows[i] = (i, src + " w0")
    _run(spark, rows, threshold=0.4)
