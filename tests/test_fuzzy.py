"""Deletion-neighborhood fuzzy join: planted pairs at each edit kind
(substitution, insertion, deletion), and distance-2 exclusion."""

from __future__ import annotations

from mongo_iceberg_lakehouse_spark.operators.text import fuzzy_pairs_ed1


def _pairs(spark, rows):
    df = spark.createDataFrame(rows, "id long, s string")
    return {
        (r["a_id"], r["b_id"])
        for r in fuzzy_pairs_ed1(df, "id", "s").collect()
    }


def test_fuzzy_ed1_substitution_insertion_deletion(spark):
    rows = [
        (1, "spark"),
        (2, "stark"),   # substitution vs 1
        (3, "sparkk"),  # insertion vs 1
        (4, "spak"),    # deletion vs 1 (and distance 2 vs 2)
        (5, "flink"),   # unrelated
    ]
    got = _pairs(spark, rows)
    assert (1, 2) in got
    assert (1, 3) in got
    assert (1, 4) in got
    assert all(5 not in p for p in got)


def test_fuzzy_ed1_excludes_distance_two(spark):
    got = _pairs(spark, [(1, "abcdef"), (2, "abzzef")])
    assert got == set()


def test_fuzzy_ed1_identical_strings_pair(spark):
    # Exact duplicates are distance 0 <= 1: must pair once (a_id < b_id).
    got = _pairs(spark, [(1, "same"), (2, "same")])
    assert got == {(1, 2)}


def test_containment_join_matches_bruteforce(spark):
    from mongo_iceberg_lakehouse_spark.operators.dedup import containment_join

    docs = [
        (1, "a b c d e f g h"),          # base
        (2, "a b c d e f g h x y"),      # superset: 1 contained in 2
        (3, "a b c d q r s t u v"),      # partial overlap
        (4, "z z z z z"),                # disjoint content
        (5, "a b c d e f g h"),          # exact dup of 1
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(df, threshold=0.7, shingle_n=3).collect()
    }

    # brute force in python
    def tri(t):
        ws = t.split()
        return set(" ".join(ws[i : i + 3]) for i in range(len(ws) - 2))

    want = {}
    for ia, ta in docs:
        for ib, tb in docs:
            if ia == ib:
                continue
            A, B = tri(ta), tri(tb)
            c = len(A & B) / len(A)
            if c >= 0.7:
                want[(ia, ib)] = c
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-12
    # directional: 1 fully inside 2 (1.0), 2 only partially inside 1 (0.75)
    assert got[(1, 2)] == 1.0 and abs(got[(2, 1)] - 0.75) < 1e-12
