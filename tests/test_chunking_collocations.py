"""Unit tests for sliding-window chunking, lift collocations, repetition
signals, and the exactly-k content-addressed sample."""

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.sampling import uniform_k_sample
from mongo_iceberg_lakehouse_spark.operators.text import (
    bigram_lift_topk,
    repetition_signals,
    sliding_chunks,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


# ---------------------------------------------------------------- chunking


def test_sliding_chunks_overlap_and_final_partial(spark):
    d = _docs(spark, ["a b c d e f"])
    out = sliding_chunks(d, window=3, overlap=1).orderBy("chunk_id").collect()
    # stride 2: [a b c], [c d e], [e f] — final partial kept, never padded
    assert [(r.chunk_id, r.chunk_text) for r in out] == [
        (0, "a b c"),
        (1, "c d e"),
        (2, "e f"),
    ]
    assert [r.n_tokens for r in out] == [3, 3, 2]


def test_sliding_chunks_short_doc_single_chunk(spark):
    d = _docs(spark, ["x y"])
    out = sliding_chunks(d, window=5, overlap=2).collect()
    assert len(out) == 1 and out[0].chunk_text == "x y"


def test_sliding_chunks_exact_window_no_spurious_tail(spark):
    # n == window must emit exactly one chunk (the ceil arithmetic's edge)
    d = _docs(spark, ["a b c d"])
    assert sliding_chunks(d, window=4, overlap=1).count() == 1
    # n == window + 1 emits two
    d2 = _docs(spark, ["a b c d e"])
    assert sliding_chunks(d2, window=4, overlap=1).count() == 2


def test_sliding_chunks_empty_doc_zero_rows(spark):
    d = _docs(spark, ["", "a"])
    out = sliding_chunks(d, window=3, overlap=0)
    assert out.count() == 1  # only the non-empty doc


def test_sliding_chunks_is_shuffle_free(spark):
    d = _docs(spark, ["a b c d e f"])
    plan = sliding_chunks(d, window=3, overlap=1)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


# ------------------------------------------------------------ collocations


def test_bigram_lift_exact_values(spark):
    # corpus: "x y" twice, "x z" once -> N=6 tokens
    d = _docs(spark, ["x y", "x y", "x z"])
    out = bigram_lift_topk(d, min_count=2, k=10).collect()
    assert len(out) == 1
    r = out[0]
    # c_ab=2, c_x=3, c_y=2, N=6 -> lift = 1e6*2*6 // (3*2) = 2_000_000
    assert (r.bigram, r.c_ab, r.c_a, r.c_b, r.lift_micros) == (
        "x y", 2, 3, 2, 2_000_000
    )


def test_bigram_lift_ordering_and_support_floor(spark):
    d = _docs(spark, ["a b", "a b", "c d", "c d", "c d", "e f"])
    out = bigram_lift_topk(d, min_count=2, k=10).collect()
    names = [r.bigram for r in out]
    assert "e f" not in names  # below support
    # N=12; a b: 1e6*2*12//(2*2)=6e6 ; c d: 1e6*3*12//(3*3)=4e6
    assert names == ["a b", "c d"]
    assert [r.lift_micros for r in out] == [6_000_000, 4_000_000]


# ------------------------------------------------------- repetition rules


def test_repetition_top_bigram_fraction(spark):
    # "ab cd ab cd ab": bigrams 'ab cd' x2, 'cd ab' x2 -> tiebreak asc
    d = _docs(spark, ["ab cd ab cd ab"])
    r = repetition_signals(d).collect()[0]
    assert r.top_bigram == "ab cd"
    # tok_chars = 10; top2_chars = 2 * (5-1) = 8 -> 800000
    assert r.top_bigram_frac_micros == 800_000
    assert not r.rep_top2_ok
    # trigrams 'ab cd ab' x2? occurrences: [ab cd ab], [cd ab cd], [ab cd ab]
    # -> 'ab cd ab' x2 dup -> 2*(8-2)=12 chars / 10 -> 1_200_000 (>1e6 ok)
    assert r.dup_trigram_frac_micros == 1_200_000
    assert not r.passes_repetition


def test_repetition_single_token_doc_null_top(spark):
    d = _docs(spark, ["solo"])
    r = repetition_signals(d).collect()[0]
    assert r.top_bigram is None
    assert r.top_bigram_frac_micros == 0
    assert r.dup_trigram_frac_micros == 0
    assert r.passes_repetition


def test_repetition_no_duplicates_passes(spark):
    d = _docs(spark, [" ".join(f"w{i:02d}" for i in range(20))])
    r = repetition_signals(d).collect()[0]
    assert r.dup_trigram_frac_micros == 0
    # all bigrams count 1 -> asc tiebreak picks 'w00 w01';
    # chars 6 of tok_chars 60 -> exactly 100000 micro-units
    assert r.top_bigram == "w00 w01"
    assert r.top_bigram_frac_micros == 100_000
    assert r.passes_repetition


# ------------------------------------------------------------- k-sampling


def test_uniform_k_sample_partition_invariant(spark):
    d = _docs(spark, [f"t{i}" for i in range(100)])
    a = {r.doc_id for r in uniform_k_sample(d, 10).collect()}
    b = {r.doc_id for r in uniform_k_sample(d.repartition(7), 10).collect()}
    assert a == b and len(a) == 10


def test_uniform_k_sample_salt_draws_new_sample(spark):
    d = _docs(spark, [f"t{i}" for i in range(200)])
    a = {r.doc_id for r in uniform_k_sample(d, 20).collect()}
    b = {r.doc_id for r in uniform_k_sample(d, 20, salt="s2").collect()}
    assert a != b


def test_uniform_k_sample_k_exceeds_corpus(spark):
    d = _docs(spark, ["a", "b"])
    assert uniform_k_sample(d, 10).count() == 2


def test_uniform_k_sample_plan_is_top_k(spark):
    d = _docs(spark, [f"t{i}" for i in range(50)])
    plan = uniform_k_sample(d, 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ------------------------------------------------------- OOV coverage


def test_oov_rate_hand_computed(spark):
    from mongo_iceberg_lakehouse_spark.operators.text import vocab_oov_stats

    # corpus counts: a:4, b:3, c:2, d:1 -> vocab_size=2 keeps {a, b}
    d = _docs(spark, ["a a b c", "a a b b c d"])
    out = {r.doc_id: r for r in vocab_oov_stats(d, vocab_size=2).collect()}
    assert out[0].n_tokens == 4 and out[0].n_oov == 1
    assert out[0].oov_rate_micros == 250_000
    assert out[1].n_tokens == 6 and out[1].n_oov == 2  # c + d
    assert out[1].oov_rate_micros == 333_333


def test_oov_vocab_boundary_tiebreak(spark):
    from mongo_iceberg_lakehouse_spark.operators.text import vocab_oov_stats

    # x and y both count 2; vocab_size=1 must pick 'x' (word-asc tiebreak)
    d = _docs(spark, ["x y x y"])
    r = vocab_oov_stats(d, vocab_size=1).collect()[0]
    assert r.n_oov == 2  # the two 'y' occurrences


def test_oov_empty_doc_zeros(spark):
    from mongo_iceberg_lakehouse_spark.operators.text import vocab_oov_stats

    d = _docs(spark, ["", "a a"])
    out = {r.doc_id: r for r in vocab_oov_stats(d, vocab_size=1).collect()}
    assert out[0].n_tokens == 0 and out[0].n_oov == 0
    assert out[0].oov_rate_micros == 0


# ------------------------------------------------- partition pruning


def test_partition_pruning_reaches_scan(spark, tmp_path):
    # Probes the same partitioned-write -> IN-filtered read the registry
    # query runs INTERNALLY. (The query itself now returns an eagerly
    # checkpointed 2-row aggregate so its backing /tmp copy can be
    # removed — r7 verdict #2 — which makes the query's RETURNED plan a
    # checkpoint scan; the pruning property is pinned here instead.)
    from pyspark.sql import functions as F

    from .conftest import SF_SMOKE

    ev = (
        spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        .select("event_id", "event_type")
    )
    base = str(tmp_path / "part_prune_plan")
    ev.write.mode("overwrite").partitionBy("event_type").parquet(base)
    back = spark.read.parquet(base).filter(
        F.col("event_type").isin("click", "error")
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]


def test_bigram_lift_hashed_matches_string_path(spark):
    # Round-7: the hash-keyed-shuffle form must be row-identical to the
    # string-keyed original (same top-k, counts, and exact lift values).
    from mongo_iceberg_lakehouse_spark.operators.text import (
        bigram_lift_topk,
        bigram_lift_topk_hashed,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = bigram_lift_topk(d, "doc_id", "text", min_count=5, k=20).collect()
    b = bigram_lift_topk_hashed(d, "doc_id", "text", min_count=5, k=20).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
