"""Unit semantics for the round-3 curation additions: span_scrub (sub-
document duplicate-span removal with rebuild) and dsir_importance (hashed
n-gram importance resampling). The registry queries over the synthetic
corpus are oracle-checked in test_oracle_parity; these pin the hand-
checkable edge semantics on tiny frames.
"""

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.dedup import span_scrub
from mongo_iceberg_lakehouse_spark.operators.sampling import dsir_importance


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_span_scrub_canonical_doc_keeps_span(spark):
    # "a b c d e" is shared; doc 1 (min id) is canonical and keeps it,
    # doc 2 loses exactly the 5 covered positions (2..6).
    out = span_scrub(
        _docs(
            spark,
            [
                (1, "a b c d e x"),
                (2, "z a b c d e"),
                (3, "q w e r t y"),
            ],
        ),
        span_n=5,
        min_docs=2,
    )
    got = {r["doc_id"]: (r["n_removed"], r["kept_text"]) for r in out.collect()}
    assert got[1] == (0, "a b c d e x")
    assert got[2] == (5, "z")
    assert got[3] == (0, "q w e r t y")


def test_span_scrub_short_doc_passes_through(spark):
    out = span_scrub(
        _docs(spark, [(1, "a b"), (2, "a b")]), span_n=5, min_docs=2
    )
    got = {r["doc_id"]: r["kept_text"] for r in out.collect()}
    # under span_n words => no windows => untouched, even though identical
    assert got == {1: "a b", 2: "a b"}


def test_span_scrub_full_removal_yields_empty_text(spark):
    out = span_scrub(
        _docs(spark, [(1, "a b c d e"), (2, "a b c d e")]),
        span_n=5,
        min_docs=2,
    )
    got = {r["doc_id"]: (r["n_removed"], r["kept_text"]) for r in out.collect()}
    assert got[1] == (0, "a b c d e")
    assert got[2] == (5, "")


def test_span_scrub_overlapping_spans_union_positions(spark):
    # doc 2 shares a 6-word run => two overlapping 5-windows; removed
    # positions are the union (6), not 10.
    out = span_scrub(
        _docs(spark, [(1, "a b c d e f"), (2, "a b c d e f")]),
        span_n=5,
        min_docs=2,
    )
    got = {r["doc_id"]: r["n_removed"] for r in out.collect()}
    assert got == {1: 0, 2: 6}


def test_dsir_weights_rank_target_like_docs_higher(spark):
    rows = [
        # target (tgt=True) docs speak "good"
        (1, "good good better good", True),
        (2, "good better good good", True),
        # raw-only docs speak "bad"
        (3, "bad worse bad bad", False),
        (4, "bad bad worse bad", False),
        # probes: one good-ish, one bad-ish, same length
        (5, "good better good good", False),
        (6, "bad worse bad bad", False),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string, tgt boolean")
    out = dsir_importance(df, target_filter=F.col("tgt"))
    got = {r["doc_id"]: r["weight_micro"] for r in out.collect()}
    assert got[5] > got[6]
    # n_features = unigrams + bigrams = 4 + 3
    nf = {r["doc_id"]: r["n_features"] for r in out.collect()}
    assert set(nf.values()) == {7}


def test_dsir_weight_is_exact_integer_dot_product(spark):
    # partition-layout independence: identical inputs, different
    # parallelism => bit-identical BIGINT weights (the knife-edge guard)
    rows = [(i, "alpha beta gamma delta " * 3, i % 2 == 0) for i in range(20)]
    df1 = spark.createDataFrame(rows, "doc_id bigint, text string, t boolean")
    df2 = df1.repartition(13)
    w1 = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_importance(df1, F.col("t")).collect()
    }
    w2 = {
        r["doc_id"]: r["weight_micro"]
        for r in dsir_importance(df2, F.col("t")).collect()
    }
    assert w1 == w2


# --- property tests vs brute-force Python references ---------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny vocabulary makes shared spans likely; variable doc lengths cover
# the under-span_n, exact-span_n, and long-doc branches
_word = st.sampled_from(["a", "b", "c", "d"])
_doc = st.lists(_word, min_size=0, max_size=12).map(" ".join)


def _ref_span_scrub(docs, span_n=3, min_docs=2):
    """Brute-force reference: dict of all spans -> (distinct docs, min id),
    remove covered positions in non-canonical docs, rebuild."""
    words = {i: [w for w in t.split(" ") if w] for i, t in docs}
    spans = {}
    for i, ws in words.items():
        for s in range(len(ws) - span_n + 1):
            spans.setdefault(" ".join(ws[s : s + span_n]), set()).add(i)
    dup = {
        g: min(ids) for g, ids in spans.items() if len(ids) >= min_docs
    }
    out = {}
    for i, ws in words.items():
        removed = set()
        for s in range(len(ws) - span_n + 1):
            g = " ".join(ws[s : s + span_n])
            if g in dup and dup[g] != i:
                removed.update(range(s, s + span_n))
        kept = [w for p, w in enumerate(ws) if p not in removed]
        out[i] = (len(ws), len(removed), " ".join(kept))
    return out


@given(texts=st.lists(_doc, min_size=1, max_size=8))
@settings(**_SETTINGS)
def test_span_scrub_matches_reference(spark, texts):
    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        r["doc_id"]: (r["n_words"], r["n_removed"], r["kept_text"])
        for r in span_scrub(df, span_n=3, min_docs=2).collect()
    }
    assert got == _ref_span_scrub(docs)


def _ref_dsir(docs, n_buckets=16):
    """Brute-force DSIR reference mirroring the operator's md5 bucketing
    and integer micro-unit quantization."""
    import hashlib
    import math

    def bucket(f):
        return int(hashlib.md5(f.encode()).hexdigest()[:8], 16) % n_buckets

    feats = {}
    for i, t, tgt in docs:
        ws = [w for w in t.split(" ") if w]
        fs = ws + [" ".join(ws[j : j + 2]) for j in range(len(ws) - 1)]
        feats[i] = (tgt, [bucket(f) for f in fs])
    raw = [0] * n_buckets
    tgt_cnt = [0] * n_buckets
    for tgt, bs in feats.values():
        for b in bs:
            raw[b] += 1
            if tgt:
                tgt_cnt[b] += 1
    tot_raw, tot_tgt = sum(raw), sum(tgt_cnt)
    lr = [
        math.floor(
            (
                math.log((tgt_cnt[b] + 1) / (tot_tgt + n_buckets))
                - math.log((raw[b] + 1) / (tot_raw + n_buckets))
            )
            * 1e6
        )
        for b in range(n_buckets)
    ]
    return {
        i: (sum(lr[b] for b in bs), len(bs))
        for i, (tgt, bs) in feats.items()
        if bs
    }


@given(
    rows=st.lists(
        st.tuples(st.lists(_word, min_size=1, max_size=8), st.booleans()),
        min_size=1,
        max_size=8,
    )
)
@settings(**_SETTINGS)
def test_dsir_matches_reference(spark, rows):
    docs = [(i, " ".join(ws), tgt) for i, (ws, tgt) in enumerate(rows)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string, tgt boolean")
    got = {
        r["doc_id"]: (r["weight_micro"], r["n_features"])
        for r in dsir_importance(
            df, target_filter=F.col("tgt"), n_buckets=16
        ).collect()
    }
    assert got == _ref_dsir(docs, n_buckets=16)
