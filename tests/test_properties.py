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
