"""Property-based tests (hypothesis) for the intricate custom operators."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.dedup import window_dedup
from mongo_iceberg_lakehouse_spark.operators.relational import as_of_join

# one small example set per case keeps Spark round-trips bounded
_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.sampled_from(["a", "b", "c"])
times = st.integers(min_value=0, max_value=30)


@given(
    left=st.lists(st.tuples(keys, times), min_size=1, max_size=12),
    right=st.lists(st.tuples(keys, times), max_size=12),
)
@settings(**_SETTINGS)
def test_as_of_join_matches_naive(spark, left, right):
    # make right rows unique on (key, time) so the expected match is
    # well-defined (ties across identical timestamps are arbitrary)
    right = list({(k, t): (k, t) for k, t in right}.values())
    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)], ["k", "t", "lid"]
    )
    rdf = spark.createDataFrame(
        [(k, t, float(t) * 10) for (k, t) in right] or [("zz", -1, 0.0)],
        ["k", "t", "payload"],
    )
    out = as_of_join(ldf, rdf, on="k", left_time="t", right_time="t")
    got = {r.lid: r.payload for r in out.collect()}
    for i, (k, t) in enumerate(left):
        candidates = [rt for (rk, rt) in right if rk == k and rt <= t]
        expected = float(max(candidates)) * 10 if candidates else None
        assert got[i] == expected, (k, t, candidates)


@given(
    rows=st.lists(
        st.tuples(keys, st.integers(0, 5), st.integers(0, 100)),
        min_size=1,
        max_size=15,
    )
)
@settings(**_SETTINGS)
def test_window_dedup_keeps_exactly_max_per_key(spark, rows):
    df = spark.createDataFrame(rows, ["k", "v", "tiebreak"])
    out = window_dedup(
        df, ["k"], [F.col("v").desc(), F.col("tiebreak").desc()]
    ).collect()
    present_keys = {k for k, _, _ in rows}
    assert len(out) == len(present_keys)  # exactly one survivor per key
    for r in out:
        best = max(
            (v, tb) for (k, v, tb) in rows if k == r.k
        )
        assert (r.v, r.tiebreak) == best


words = st.sampled_from(["aa", "bb", "cc", "dd", "ee", "ff"])


@given(
    docs=st.lists(
        st.lists(words, min_size=3, max_size=10), min_size=2, max_size=8
    )
)
@settings(**_SETTINGS)
def test_containment_join_complete_and_exact(spark, docs):
    """Prefix filtering must be COMPLETE: every pair the quadratic
    definition admits must survive candidate pruning, on arbitrary
    small corpora (incl. heavy shingle sharing)."""
    from mongo_iceberg_lakehouse_spark.operators.dedup import containment_join

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join(df, threshold=0.6, shingle_n=2).collect()
    }

    def bi(ws):
        return set(" ".join(ws[i : i + 2]) for i in range(len(ws) - 1))

    want = {}
    for ia, wa in enumerate(docs):
        for ib, wb in enumerate(docs):
            if ia == ib:
                continue
            A, B = bi(wa), bi(wb)
            c = len(A & B) / len(A)
            if c >= 0.6:
                want[(ia, ib)] = c
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@given(
    docs=st.lists(
        st.lists(words, min_size=2, max_size=10), min_size=2, max_size=8
    )
)
@settings(**_SETTINGS)
def test_jaccard_join_complete_and_exact(spark, docs):
    """Double-prefix + positional filtering must be COMPLETE for symmetric
    Jaccard: every pair the quadratic definition admits survives pruning,
    on arbitrary small corpora with heavy shingle sharing."""
    from mongo_iceberg_lakehouse_spark.operators.dedup import jaccard_join

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_join(df, threshold=0.5, shingle_n=2).collect()
    }

    def bi(ws):
        return set(" ".join(ws[i : i + 2]) for i in range(len(ws) - 1))

    want = {}
    for ia, wa in enumerate(docs):
        for ib, wb in enumerate(docs):
            if ia >= ib:
                continue
            A, B = bi(wa), bi(wb)
            j = len(A & B) / len(A | B)
            if j >= 0.5:
                want[(ia, ib)] = j
    assert set(got) == set(want)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@given(
    corpus=st.lists(
        st.tuples(st.integers(0, 2), st.lists(st.floats(-1, 1), min_size=3, max_size=3)),
        min_size=1,
        max_size=10,
    ),
    qvecs=st.lists(
        st.lists(st.floats(-1, 1), min_size=3, max_size=3), min_size=1, max_size=3
    ),
)
@settings(**_SETTINGS)
def test_maxsim_matches_naive(spark, corpus, qvecs):
    import math

    from mongo_iceberg_lakehouse_spark.operators.similarity import (
        maxsim_multivector,
    )

    cdf = spark.createDataFrame(corpus, "label int, embedding array<float>")
    qdf = spark.createDataFrame(
        [(i, v) for i, v in enumerate(qvecs)], "qid int, embedding array<float>"
    )
    got = {
        r["label"]: r["maxsim_score"]
        for r in maxsim_multivector(cdf, qdf).collect()
    }

    def cos(a, b):
        # float32 storage: quantize inputs like the engine reads them
        import struct as _s

        a = [_s.unpack("f", _s.pack("f", x))[0] for x in a]
        b = [_s.unpack("f", _s.pack("f", x))[0] for x in b]
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        if na * nb == 0.0:
            return 0.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    labels = {lbl for lbl, _ in corpus}
    for lbl in labels:
        vecs = [v for l2, v in corpus if l2 == lbl]
        want = sum(max(cos(v, q) for v in vecs) for q in qvecs)
        assert abs(got[lbl] - want) < 1e-9, lbl
