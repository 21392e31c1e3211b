"""Relational operator helpers beyond single built-in calls.

Most of the reference's operator surface maps 1:1 onto DataFrame built-ins
(SURVEY.md §2) and needs no wrapper. This module holds the composite shapes:
top-k, as-of joins, and skew-safe aggregation — each expressed so Catalyst
keeps the efficient physical plan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def top_k(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """Global top-k. ``orderBy().limit()`` adjacency makes Spark plan
    TakeOrderedAndProject — per-partition heaps + single merge, no global
    sort-shuffle (SURVEY.md §2.6)."""
    return df.orderBy(*order_by).limit(k)


def top_k_per_group(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column], k: int
) -> DataFrame:
    """Top-k within each group via ranking window; shuffles once on the group
    key. For heavily skewed groups pre-aggregate or salt first."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    direction: str = "backward",
    right_tiebreak: str | None = None,
) -> DataFrame:
    """As-of join: for each left row, attach the latest right row with
    right_time <= left_time (backward) or earliest >= (forward), per key.

    Implemented as union + window (the merge-sorted-streams formulation), not
    a range cross join: both sides shuffle once on the key, the window scans
    each key's timeline once — O(n log n) per key, no quadratic candidate set,
    which is what survives at 100 TB.

    ``right_tiebreak``: column that breaks ties among right rows sharing the
    same timestamp — the max wins for backward, the min for forward. Without
    it the pick among exact-duplicate timestamps is partition-order
    UNDETERMINED (harmless only if right times are unique per key; the sf1
    events decade produced real ts collisions and the driver oracle diverged
    run-to-run). Pass the right side's id column whenever duplicates are
    possible.
    """
    lcols = set(left.columns)
    rpayload = [c for c in right.columns if c not in (on, right_time)]
    # The right payload travels as ONE struct column so the window's
    # last(ignorenulls) picks the whole winning row atomically — filling
    # each payload column independently would let a NULL field of the
    # winning row backfill from an OLDER right row, silently stitching a
    # row that never existed (the struct itself is non-NULL even when
    # every field inside it is NULL, so ignorenulls only skips rows, not
    # fields).
    rrow_type = (
        "struct<"
        + ",".join(
            f"{c}:{right.schema[c].dataType.simpleString()}" for c in rpayload
        )
        + ">"
    )
    l2 = left.select(
        F.col(on).alias("__k"),
        F.col(left_time).alias("__t"),
        F.lit(1).alias("__is_left"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__lrow"),
        F.lit(None).cast(rrow_type).alias("__rrow"),
    )
    r2 = right.select(
        F.col(on).alias("__k"),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        F.lit(None)
        .cast(
            "struct<" + ",".join(f"{c}:{left.schema[c].dataType.simpleString()}" for c in left.columns) + ">"
        )
        .alias("__lrow"),
        F.struct(*[F.col(c) for c in rpayload]).alias("__rrow"),
    )
    merged = l2.unionByName(r2)
    # among right rows at one timestamp the LAST in window order wins
    # (last ignorenulls): tiebreak asc => max wins (backward), desc =>
    # min wins (forward). Left rows carry NULL tiebreak and are already
    # separated by __is_left, so the extra key never reorders them.
    tb = (
        [F.col(f"__rrow.{right_tiebreak}")]
        if right_tiebreak is not None
        else []
    )
    if direction == "backward":
        w = (
            Window.partitionBy("__k")
            .orderBy(
                F.col("__t").asc(),
                F.col("__is_left").asc(),
                *[c.asc_nulls_first() for c in tb],
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy("__k")
            .orderBy(
                F.col("__t").desc(),
                F.col("__is_left").asc(),
                *[c.desc_nulls_first() for c in tb],
            )
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    filled = merged.select(
        "__k",
        "__t",
        "__is_left",
        "__lrow",
        F.last(F.col("__rrow"), ignorenulls=True).over(w).alias("__rrow"),
    ).filter(F.col("__is_left") == 1)
    return filled.select(
        *[F.col(f"__lrow.{c}").alias(c) for c in left.columns],
        *[
            F.col(f"__rrow.{c}").alias(c if c not in lcols else f"right_{c}")
            for c in rpayload
        ],
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Bounded-interval join: all (l, r) with equal ``key`` and
    ``l.left_ts < r.right_ts <= l.left_ts + window_seconds``.

    Scale-first shape: Spark has no range-join optimization, and an equi-join
    on ``key`` alone degenerates when a key is hot (one task gets the whole
    key's cross product). Instead both sides also equi-join on a time *bin* of
    width ``window_seconds``: each left row is exploded into the (at most 2)
    bins its window can reach, the right row sits in exactly 1 bin, so the
    shuffle key is (key, bin) — bounded per-task work even for a single hot
    key spanning a long time range — and the exact interval predicate runs
    post-join as a cheap filter. Left rows are replicated at most 2x
    regardless of window width (bin width == window width).
    """
    bin_ = lambda c: F.floor(F.unix_timestamp(c) / F.lit(window_seconds))  # noqa: E731
    l = left.withColumn(  # noqa: E741
        "__bin", F.explode(F.array(bin_(F.col(left_ts)), bin_(F.col(left_ts)) + 1))
    )
    r = right.withColumn("__bin", bin_(F.col(right_ts)))
    lk = [F.col(f"l.{key}") == F.col(f"r.{key}"), F.col("l.__bin") == F.col("r.__bin")]
    exact = (F.col(f"r.{right_ts}") > F.col(f"l.{left_ts}")) & (
        F.col(f"r.{right_ts}")
        <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {window_seconds} SECONDS")
    )
    return (
        l.alias("l")
        .join(r.alias("r"), lk[0] & lk[1] & exact)
        .drop("__bin")
    )


def upsert_snapshot(
    base: DataFrame,
    updates: DataFrame,
    key: str,
    version_col: str,
) -> DataFrame:
    """MERGE-emulation for engines without Delta/Iceberg MERGE INTO:
    union base+updates, keep the highest-version row per key (ties prefer
    the updates side). The anti-join+union+window formulation — one shuffle
    on the key, snapshot-replace friendly (reference S4 semantics)."""
    b = base.withColumn("__src", F.lit(0))
    u = updates.withColumn("__src", F.lit(1))
    merged = b.unionByName(u)
    w = Window.partitionBy(key).orderBy(
        F.col(version_col).desc(), F.col("__src").desc()
    )
    return (
        merged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )


def scd2_from_changelog(
    df: DataFrame,
    key: str,
    attr: str,
    ts_col: str,
    tiebreak: str,
) -> DataFrame:
    """Slowly-changing-dimension type 2 from an ordered change log.

    Collapses consecutive rows per ``key`` (ordered by ``ts_col, tiebreak``)
    with the same ``attr`` value, and emits one validity interval per
    distinct run: (key, attr, valid_from, valid_to, is_current, version).
    ``valid_to`` is the next version's ``valid_from`` (NULL for the open,
    current version) — the standard CDC-to-dimension maintenance pattern
    (reference S4/S5 snapshot semantics, expressed incrementally).

    Scale: two window passes over the same (key) partitioning — Spark reuses
    one shuffle for both since the partition/order keys match. No join, no
    state beyond the window buffers; skew only if a single key has millions
    of changes (then pre-bucket by (key, month) and stitch).
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    changed = (
        df.withColumn("__prev", F.lag(attr).over(w))
        .filter(~F.col("__prev").eqNullSafe(F.col(attr)))
        .drop("__prev")
    )
    return (
        changed.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .withColumn("is_current", F.col("valid_to").isNull())
        .withColumn("version", F.row_number().over(w).cast("int"))
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    tiebreak: str,
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: rows per ``key`` ordered by (ts, tiebreak);
    a new session starts when the gap to the previous row exceeds
    ``gap_minutes``. Adds ``session_id`` (1-based per key).

    The batch analog of ``F.session_window`` when you need the session id ON
    the rows (for downstream joins/lineage) rather than collapsed window
    aggregates. One shuffle on the key; both window passes (lag + running
    sum) share it. This is also the canonical secondary-sort pattern — the
    shuffle delivers each key's rows orderable by ts without a global sort.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak)
    gap_us = gap_minutes * 60 * 1_000_000
    is_new = (
        F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
        > gap_us
    )
    flag = F.when(is_new, 1).otherwise(0)  # first row: lag NULL -> otherwise 0
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", (F.sum(flag).over(wrun) + 1).cast("int")
    )


def salted_groupby_sum(
    df: DataFrame, keys: Sequence[str], value_col: str, salt_buckets: int = 32
) -> DataFrame:
    """Two-stage skew-safe aggregation: salt the key, partial-aggregate on
    (key, salt), then final-aggregate on the key. With AQE's skew handling on
    this is rarely needed explicitly, but it is the canonical manual rewrite
    for a pathologically hot grouping key."""
    salted = df.withColumn("__salt", (F.rand(seed=7) * salt_buckets).cast("int"))
    partial = salted.groupBy(*keys, "__salt").agg(
        F.sum(value_col).alias("__partial_sum"), F.count(F.lit(1)).alias("__partial_cnt")
    )
    return partial.groupBy(*keys).agg(
        F.sum("__partial_sum").alias(f"sum_{value_col}"),
        F.sum("__partial_cnt").alias("cnt"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    *,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the (big, skewed) left side, replicate the
    right side across all salts, join on (key, salt).

    When the right side is too big to broadcast and a left key is hot, a
    plain shuffle join lands the hot key's entire row set on one task.
    Salting splits each key's left rows across ``num_salts`` reducers (salt
    = xxhash64 of the whole left row, deterministic, layout-independent)
    at the cost of a bounded ``num_salts``x replication of the right side
    — the explicit version of what AQE skew-join does at runtime, usable
    when AQE can't see the skew (e.g. the downstream op pins partitioning,
    see tests/test_skew_join.py).

    Only ``inner`` and ``left`` are supported: replication would duplicate
    right-side-preserving nulls for other join types.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    l_cols = [F.col(c) for c in left.columns]
    lhs = left.withColumn(
        "__salt", F.pmod(F.xxhash64(*l_cols), F.lit(num_salts)).cast("int")
    )
    rhs = right.withColumn(
        "__salt",
        F.explode(
            F.sequence(F.lit(0), F.lit(num_salts - 1)).cast("array<int>")
        ),
    )
    return lhs.join(rhs, [key, "__salt"], how).drop("__salt")


def skyline_2d(
    df: DataFrame,
    minimize: str,
    maximize: str,
) -> DataFrame:
    """2-D Pareto skyline: keep rows not dominated on (``minimize`` low,
    ``maximize`` high). Row q dominates p iff q is <= on the minimized
    axis, >= on the maximized one, and strictly better on at least one;
    exact duplicates dominate neither and are all kept. The
    multi-objective filter behind best-effort data curation ("cheapest
    doc at every quality level").

    Scale shape: the naive formulation is the quadratic NOT EXISTS
    self-join (that's the oracle, deliberately independent). Here the
    table collapses first to one (value, best) row per distinct
    ``minimize`` value — a map-side-combined aggregation, the only full
    pass — and the running best over strictly-cheaper values is an
    ordered window over that O(distinct-values) aggregate. A row
    survives iff it matches its value's best AND beats every cheaper
    value's best. Both lookup joins are on the tiny aggregate, so
    Catalyst broadcasts them.
    """
    g = df.groupBy(F.col(minimize).alias("__v")).agg(
        F.max(maximize).alias("__best")
    )
    w = Window.orderBy("__v").rowsBetween(
        Window.unboundedPreceding, -1
    )
    r = g.select(
        "__v", "__best", F.max("__best").over(w).alias("__best_cheaper")
    )
    out = df.join(
        F.broadcast(r), df[minimize] == r["__v"]
    ).filter(
        (F.col(maximize) == F.col("__best"))
        & (
            F.col("__best_cheaper").isNull()
            | (F.col("__best_cheaper") < F.col(maximize))
        )
    )
    return out.select(*df.columns)
