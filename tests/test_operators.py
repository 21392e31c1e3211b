"""Unit tests for the extension operators on small controlled inputs."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.dedup import (
    dedup_exact,
    minhash_lsh_pairs,
    simhash_pairs,
    window_dedup,
)
from mongo_iceberg_lakehouse_spark.operators.multimodal import (
    attach_payload,
    decode_payload,
    extract_features,
    frame_sample_plan,
)
from mongo_iceberg_lakehouse_spark.operators.relational import (
    as_of_join,
    salted_groupby_sum,
    top_k_per_group,
)
from mongo_iceberg_lakehouse_spark.operators.similarity import (
    ann_topk_blocked,
    ann_topk_bruteforce,
    cosine_neardup_blocked,
    cosine_neardup_pairs,
)
from mongo_iceberg_lakehouse_spark.operators.text import (
    content_fingerprint,
    lang_id,
    quality_features,
    winnow_fingerprints,
)

DOC = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the afternoon sun"
)
DOC_NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from a warm windowsill in the evening sun"
)
DOC_OTHER = "completely different content about spark query engines and lakehouse tables"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, DOC), (2, DOC_NEAR), (3, DOC_OTHER), (4, DOC)],
        ["doc_id", "text"],
    )


def test_minhash_finds_planted_neardup(docs):
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", num_hashes=64, bands=16, shingle_n=3,
        jaccard_threshold=0.5,
    ).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 2) in found  # near-dup pair detected
    assert (1, 4) in found  # exact dup has jaccard 1.0
    assert (1, 3) not in found and (2, 3) not in found
    jac = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert jac[(1, 4)] == 1.0


def test_simhash_finds_planted_neardup(docs):
    pairs = simhash_pairs(docs, "doc_id", "text", max_hamming=6).collect()
    found = {(r.id_a, r.id_b) for r in pairs}
    assert (1, 4) in found
    ham = {(r.id_a, r.id_b): r.hamming for r in pairs}
    assert ham[(1, 4)] == 0
    assert (1, 2) in found  # one-word change flips few bits


def test_dedup_exact_deterministic_survivor(docs):
    out = dedup_exact(docs, ["text"], id_col="doc_id")
    ids = sorted(r.doc_id for r in out.collect())
    assert ids == [1, 2, 3]  # doc 4 (dup of 1) dropped, min id kept


def test_window_dedup_keeps_first_by_order(spark):
    df = spark.createDataFrame(
        [("k1", 1, "old"), ("k1", 3, "new"), ("k2", 2, "only")],
        ["key", "version", "payload"],
    )
    out = window_dedup(df, ["key"], [F.col("version").desc()])
    rows = {r.key: r.payload for r in out.collect()}
    assert rows == {"k1": "new", "k2": "only"}


def test_content_fingerprint_normalizes_case_and_space(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "hello worlds")],
        ["doc_id", "text"],
    )
    fps = {r.doc_id: r.fingerprint for r in content_fingerprint(df).collect()}
    assert fps[1] == fps[2]
    assert fps[1] != fps[3]


def test_winnow_fingerprints_shared_for_neardups(docs):
    fp = winnow_fingerprints(docs, kgram=4, window=3)
    a = {r.fingerprint for r in fp.filter(F.col("doc_id") == 1).collect()}
    b = {r.fingerprint for r in fp.filter(F.col("doc_id") == 2).collect()}
    c = {r.fingerprint for r in fp.filter(F.col("doc_id") == 3).collect()}
    assert len(a & b) > 0  # near-dups share fingerprints
    assert len(a & c) == 0


def test_quality_and_lang_id(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat in the house"),
         (2, "el gato de la casa y los perros"),
         (3, "xyz qrs tuv")],
        ["doc_id", "text"],
    )
    q = {r.doc_id: r for r in quality_features(df).collect()}
    assert q[1].n_tokens == 9
    assert q[1].stopword_cnt == 4  # the x3 + in
    lid = {r.doc_id: r.pred_lang for r in lang_id(df).collect()}
    assert lid[1] == "en"
    assert lid[2] == "es"
    assert lid[3] == "und"


def _vec(*xs):
    return list(float(x) for x in xs)


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, _vec(1, 0, 0, 0)),
        (1, _vec(0.9, 0.1, 0, 0)),   # close to 0
        (2, _vec(0, 1, 0, 0)),
        (3, _vec(0, 0.95, 0.05, 0)),  # close to 2
        (4, _vec(0, 0, 1, 1)),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_ann_bruteforce_and_blocked_agree(vectors):
    q = vectors.filter(F.col("vec_id") < 2)
    brute = ann_topk_bruteforce(vectors, q, k=2).collect()
    blocked = ann_topk_blocked(vectors, q, k=2).collect()
    bset = {(r.query_id, r.neighbor_id, r.rank) for r in brute}
    kset = {(r.query_id, r.neighbor_id, r.rank) for r in blocked}
    assert bset == kset
    top = {(r.query_id, r.rank): r.neighbor_id for r in brute}
    assert top[(0, 1)] == 1  # nearest neighbor of v0 is v1


def test_cosine_neardup_variants_agree(vectors):
    plain = {(r.id_a, r.id_b) for r in cosine_neardup_pairs(vectors, 0.9).collect()}
    blocked = {
        (r.id_a, r.id_b)
        for r in cosine_neardup_blocked(vectors, 0.9, num_blocks=2).collect()
    }
    assert plain == blocked
    assert (0, 1) in plain and (2, 3) in plain
    assert (0, 4) not in plain


def test_as_of_join_backward(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0)],
        ["sym", "t", "price"],
    )
    quotes = spark.createDataFrame(
        [("A", 5, 99.5), ("A", 18, 100.5), ("B", 20, 49.0)],
        ["sym", "t", "bid"],
    )
    out = as_of_join(trades, quotes, on="sym", left_time="t", right_time="t")
    rows = {(r.sym, r.t): r.bid for r in out.collect()}
    assert rows[("A", 10)] == 99.5   # latest quote at/before t=10
    assert rows[("A", 20)] == 100.5
    assert rows[("B", 15)] is None   # no quote yet


def test_top_k_per_group(spark):
    df = spark.createDataFrame(
        [("g1", 5), ("g1", 9), ("g1", 1), ("g2", 7)], ["g", "v"]
    )
    out = top_k_per_group(df, ["g"], [F.col("v").desc()], k=2)
    got = sorted((r.g, r.v) for r in out.collect())
    assert got == [("g1", 5), ("g1", 9), ("g2", 7)]


def test_salted_groupby_sum_matches_plain(spark):
    df = spark.createDataFrame(
        [("k", float(i)) for i in range(100)] + [("j", 1.0)] * 10, ["key", "v"]
    )
    out = {r.key: (r.sum_v, r.cnt) for r in
           salted_groupby_sum(df, ["key"], "v").withColumnRenamed("sum_v", "sum_v").collect()}
    assert out["k"][0] == sum(float(i) for i in range(100))
    assert out["k"][1] == 100
    assert out["j"] == (10.0, 10)


def test_multimodal_payload_roundtrip(spark):
    df = spark.createDataFrame([(1, "hello"), (2, "wider payload")], ["doc_id", "text"])
    mm = attach_payload(df)
    assert [f.name for f in mm.schema["meta"].dataType.fields] == [
        "modality", "n_bytes", "content_hash"
    ]
    feats = {r.doc_id: r for r in extract_features(mm).collect()}
    assert feats[1].n_bytes == 5
    assert feats[1].head_hex == "hell".encode().hex()
    assert feats[2].modality == "text"
    frames = frame_sample_plan(mm, every_n=1).collect()
    assert all(f.frame_no == 0 for f in frames)  # payloads < 200 bytes -> 1 frame


def test_decode_payload_dispatch():
    # png/wav/text decode for real; only genuinely library-bound formats
    # are rejected, and as a data error (ValueError), not a stub
    import numpy as np

    from mongo_iceberg_lakehouse_spark.operators.multimodal import png_encode

    px = np.arange(24, dtype=np.uint8).reshape(2, 4, 3)
    w, h, ch, out = decode_payload(png_encode(px), "png")
    assert (w, h, ch) == (4, 2, 3) and (out == px).all()
    assert decode_payload("héllo".encode(), "text") == "héllo"
    with pytest.raises(ValueError):
        decode_payload(b"\x00", "jpeg")
    with pytest.raises(ValueError):
        decode_payload(b"\x00", "png")  # bad signature is a data error too


def test_interval_join_binning(spark):
    from datetime import datetime

    from mongo_iceberg_lakehouse_spark.operators.relational import interval_join

    def t(s):
        return datetime.fromisoformat(s)

    rows = [
        # key A: pair within window, pair across a bin boundary, pair outside
        ("A", 1, t("2024-01-01 00:00:10")),
        ("A", 2, t("2024-01-01 00:00:50")),   # 40s after 1 (same bin)
        ("A", 3, t("2024-01-01 00:01:05")),   # 55s after 2 (crosses bin edge)
        ("A", 4, t("2024-01-01 00:10:00")),   # far from all
        # key B: same timestamps, must not pair with A
        ("B", 5, t("2024-01-01 00:00:10")),
        ("B", 6, t("2024-01-01 00:00:55")),
    ]
    ev = spark.createDataFrame(rows, ["k", "eid", "ts"])
    out = interval_join(ev, ev, "k", "ts", "ts", window_seconds=60)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in out.select(
            F.col("l.eid").alias("id_a"), F.col("r.eid").alias("id_b")
        ).collect()
    }
    # (1,3) is 55s apart across a bin boundary — the 2-bin explode must
    # catch it; (x,4) pairs are outside the window; A/B never mix
    assert pairs == {(1, 2), (2, 3), (1, 3), (5, 6)}


def test_interval_join_exact_boundary(spark):
    from datetime import datetime

    from mongo_iceberg_lakehouse_spark.operators.relational import interval_join

    rows = [
        ("A", 1, datetime.fromisoformat("2024-01-01 00:00:00")),
        ("A", 2, datetime.fromisoformat("2024-01-01 00:01:00")),  # == +W
        ("A", 3, datetime.fromisoformat("2024-01-01 00:02:01")),  # > +W from 2
    ]
    ev = spark.createDataFrame(rows, ["k", "eid", "ts"])
    out = interval_join(ev, ev, "k", "ts", "ts", window_seconds=60)
    pairs = {
        (r["a"], r["b"])
        for r in out.select(
            F.col("l.eid").alias("a"), F.col("r.eid").alias("b")
        ).collect()
    }
    assert pairs == {(1, 2)}  # inclusive upper edge, (2,3) is 61s apart


def test_hash_split_deterministic_and_complete(spark):
    from mongo_iceberg_lakehouse_spark.operators.sampling import hash_split

    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    s1 = hash_split(df, "doc_id")
    s2 = hash_split(df.repartition(7), "doc_id")  # layout must not matter
    c1 = {r["doc_id"]: r["split"] for r in s1.collect()}
    c2 = {r["doc_id"]: r["split"] for r in s2.collect()}
    assert c1 == c2
    assert set(c1.values()) == {"train", "val", "test"}
    n = len(c1)
    frac = {s: sum(1 for v in c1.values() if v == s) / n for s in set(c1.values())}
    assert abs(frac["train"] - 0.8) < 0.05
    assert abs(frac["val"] - 0.1) < 0.03
    assert abs(frac["test"] - 0.1) < 0.03


def test_hash_split_rejects_bad_fractions(spark):
    from mongo_iceberg_lakehouse_spark.operators.sampling import hash_split

    df = spark.range(0, 10).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(df, "doc_id", splits=(("a", 0.5), ("b", 0.1)))


def test_weighted_sample_deterministic_and_proportional(spark):
    from mongo_iceberg_lakehouse_spark.operators.sampling import (
        weighted_sample_ares,
    )

    # ids 0..3999: even ids weight 10, odd ids weight 1
    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, 10.0).otherwise(1.0).alias("w"),
    )
    s1 = {r["doc_id"] for r in weighted_sample_ares(df, "doc_id", "w", 400).collect()}
    s2 = {
        r["doc_id"]
        for r in weighted_sample_ares(df.repartition(11), "doc_id", "w", 400).collect()
    }
    assert s1 == s2  # layout-independent
    assert len(s1) == 400
    heavy = sum(1 for d in s1 if d % 2 == 0)
    # E[heavy] ~ 355 of 400 under A-Res with 10:1 weights; statistically
    # impossible to fall below 300 unless weighting is broken
    assert heavy > 300


def test_weighted_sample_plans_take_ordered(spark):
    from mongo_iceberg_lakehouse_spark.operators.sampling import (
        weighted_sample_ares,
    )

    df = spark.range(0, 100).select(F.col("id").alias("doc_id"), F.lit(1.0).alias("w"))
    plan = (
        weighted_sample_ares(df, "doc_id", "w", 5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_merge_on_read_semantics(spark):
    from mongo_iceberg_lakehouse_spark.operators.mor import merge_on_read

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
    )
    deltas = spark.createDataFrame(
        [
            ("delete", 1, 1, "a"),       # delete existing
            ("upsert", 1, 2, "b1"),      # update...
            ("delete", 2, 2, "b1"),      # ...then delete: gone
            ("delete", 1, 3, "c"),       # delete...
            ("upsert", 2, 3, "c2"),      # ...then reinsert: back with c2
            ("upsert", 1, 9, "new"),     # insert brand-new key
        ],
        "op string, seq long, k long, v string",
    )
    got = {
        (r["k"], r["v"])
        for r in merge_on_read(base, deltas, key="k").collect()
    }
    assert got == {(3, "c2"), (9, "new")}


def test_merge_on_read_no_deltas_is_identity(spark):
    from mongo_iceberg_lakehouse_spark.operators.mor import merge_on_read

    base = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
    empty = spark.createDataFrame(
        [], "op string, seq long, k long, v string"
    )
    got = {(r["k"], r["v"]) for r in merge_on_read(base, empty, "k").collect()}
    assert got == {(1, "a"), (2, "b")}


def test_snapshot_diff_planted_drift(spark):
    from mongo_iceberg_lakehouse_spark.operators.diff import (
        bucket_checksums,
        snapshot_diff,
    )

    a = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") * 7).alias("v")
    )
    # b: drop 3 keys, change 2, add 2
    b = (
        a.filter(~F.col("k").isin(10, 20, 30))
        .withColumn(
            "v", F.when(F.col("k").isin(40, 50), F.lit(-1)).otherwise(F.col("v"))
        )
        .unionByName(
            spark.range(2000, 2002).select(
                F.col("id").alias("k"), F.lit(0).alias("v")
            )
        )
    )
    diff, n_dirty = snapshot_diff(a, b, key="k", num_buckets=64)
    got = {(r["k"], r["status"]) for r in diff.collect()}
    assert got == {
        (10, "removed"), (20, "removed"), (30, "removed"),
        (40, "changed"), (50, "changed"),
        (2000, "added"), (2001, "added"),
    }
    # 7 touched keys can dirty at most 7 of 64 buckets
    assert 1 <= n_dirty <= 7
    # identical snapshots: zero dirty buckets, empty diff
    diff2, n2 = snapshot_diff(a, a, key="k", num_buckets=64)
    assert n2 == 0 and diff2.count() == 0
    assert bucket_checksums(a, "k", 64).count() <= 64


def test_pack_batches_invariants(spark):
    from mongo_iceberg_lakehouse_spark.operators.packing import (
        batch_summary,
        pack_batches,
    )

    rows = [(i, 50 + (i * 37) % 400) for i in range(200)]
    rows.append((1000, 900))  # oversize: must get its own batch
    df = spark.createDataFrame(rows, ["doc_id", "n_tokens"])
    packed = pack_batches(df, "doc_id", "n_tokens", budget=512, n_shards=4)
    out = packed.collect()
    # conservation: every doc exactly once, tokens unchanged
    assert sorted((r["id"], r["tokens"]) for r in out) == sorted(rows)
    # budget: every batch fits, except a batch holding a single oversize doc
    sums = batch_summary(packed, budget=512).collect()
    for b in sums:
        assert b["n_tokens"] <= 512 or b["n_docs"] == 1
    # determinism: layout-independent
    again = pack_batches(
        df.repartition(13), "doc_id", "n_tokens", budget=512, n_shards=4
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_pack_batches_rejects_bad_budget(spark):
    from mongo_iceberg_lakehouse_spark.operators.packing import pack_batches

    df = spark.createDataFrame([(1, 10)], ["doc_id", "n_tokens"])
    with pytest.raises(ValueError):
        pack_batches(df, "doc_id", "n_tokens", budget=0)


def test_stratified_sample_deterministic_and_rated(spark):
    from mongo_iceberg_lakehouse_spark.operators.sampling import stratified_sample

    df = spark.range(0, 4000).select(
        F.col("id").alias("event_id"),
        (F.pmod("id", F.lit(4))).cast("string").alias("grp"),
    )
    kept = stratified_sample(
        df, "event_id", "grp", {"0": 0.5, "1": 1.0, "2": 0.0}, default=0.1
    )
    counts = {
        r["grp"]: r["cnt"]
        for r in kept.groupBy("grp").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert counts.get("2", 0) == 0  # zero-rate stratum fully dropped
    assert counts["1"] == 1000  # rate 1.0 keeps the whole stratum
    assert abs(counts["0"] / 1000 - 0.5) < 0.08
    assert abs(counts.get("3", 0) / 1000 - 0.1) < 0.05  # default rate
    # layout-independence: same kept set after repartition
    k1 = {r["event_id"] for r in kept.collect()}
    k2 = {
        r["event_id"]
        for r in stratified_sample(
            df.repartition(11), "event_id", "grp",
            {"0": 0.5, "1": 1.0, "2": 0.0}, default=0.1,
        ).collect()
    }
    assert k1 == k2


def test_repetition_ngrams_planted(spark):
    # a fully repetitive doc scores high; an all-distinct doc scores 0
    df = spark.createDataFrame(
        [(1, "a b c a b c a b c"), (2, "w x y z q r s t")],
        ["doc_id", "text"],
    )
    words = F.split(F.col("text"), " ")
    ngrams = F.transform(
        F.sequence(F.lit(1), F.size(words) - 2),
        lambda i: F.concat_ws(" ", F.slice(words, i, 3)),
    )
    out = {
        r["doc_id"]: (r["n_windows"], r["n_distinct"])
        for r in df.select(
            "doc_id",
            F.size(ngrams).alias("n_windows"),
            F.size(F.array_distinct(ngrams)).alias("n_distinct"),
        ).collect()
    }
    # doc 1: 7 windows, but only 3 distinct rotations of (a b c)
    assert out[1] == (7, 3)
    assert out[2] == (6, 6)


def test_ngram_overlap_contamination_planted(spark):
    """Planted 4-gram overlap is found, clean docs are not flagged, and the
    eval side of the join is broadcast."""
    from mongo_iceberg_lakehouse_spark.operators.text import (
        ngram_overlap_contamination,
    )

    ev = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id long, text string"
    )
    corpus = spark.createDataFrame(
        [
            # shares two 4-grams with the eval doc
            (1, "x alpha beta gamma delta epsilon y"),
            # shares words but no 4-gram
            (2, "alpha beta gamma x delta epsilon"),
            # too short for any 4-gram
            (3, "alpha beta"),
        ],
        "doc_id long, text string",
    )
    out = ngram_overlap_contamination(corpus, ev, "doc_id", "text", n=4)
    got = {r["doc_id"]: r["n_overlap"] for r in out.collect()}
    assert got == {1: 2}
    assert "BroadcastHashJoin" in out._jdf.queryExecution().executedPlan().toString()
