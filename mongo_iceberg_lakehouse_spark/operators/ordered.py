"""Grouped-ordered streaming consumers (the secondary-sort pattern).

``applyInPandas`` materializes each group as one pandas DataFrame — fine for
bounded groups, fatal when one key holds millions of rows. The classic
MapReduce answer is secondary sort: partition by key, sort each partition by
(key, order), and stream the partition once, carrying per-key state across
record batches. Spark-side that is::

    df.repartition(key).sortWithinPartitions(key, *order)  -> mapInPandas

``mapInPandas`` hands each partition to Python as an *iterator* of Arrow
batches, so a consumer that carries state across batches processes a key of
any size in O(batch) memory. Rows of one key never span partitions
(hash-partitioned), so per-partition carry is exact.

The concrete operator here — longest run of equal consecutive values per key
(gaps-and-islands) — is order-dependent, vectorized within each batch
(numpy boundary masks + pandas groupby, no Python row loop), and has an
exact SQL formulation for the oracle gate.

Reference parity: the reference has no ordered-stream operator (its jobs are
scan->project->agg, spark_jobs/*.ipynb); this is charter phase-F scale
infrastructure for per-entity sequence features at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cogrouped_interval_match(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """(key, n_pairs): per key, how many (left, right) pairs satisfy
    left_ts <= right_ts <= left_ts + window — computed with
    ``cogroup().applyInArrow``, the two-sided grouped-map surface.

    Inside each key both sides arrive as Arrow tables; the count uses a
    sort + two binary searches per left row (O((n+m) log m)), not an n*m
    product. Arrow (not pandas) grouped-map: with thousands of small
    per-key groups the per-group pandas DataFrame construction dominated
    the whole operator — an interleaved A/B at sf0.1 (40k rows, 1500
    keys) measured the applyInPandas form at 4.6 s with a TRIVIAL kernel
    vs 0.6 s for the identical applyInArrow form (guide §4: control how
    the batch crosses the boundary, the kernel math is unchanged).
    Unlike the mapInPandas secondary-sort consumer above, cogroup
    MATERIALIZES each key's two groups in memory — right for bounded
    per-entity histories (user timelines), wrong for unbounded keys; the
    equivalent declarative form is the watermarked stream-stream interval
    join (streaming/join.py), and the two are cross-checked in the oracle
    gate.
    """
    import numpy as np
    import pyarrow as pa

    win_us = window_seconds * 1_000_000
    empty = pa.table(
        {"key": pa.array([], pa.int64()), "n_pairs": pa.array([], pa.int64())}
    )

    def match(lt: pa.Table, rt: pa.Table) -> pa.Table:
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        # tz-aware us-precision timestamps -> int64 epoch micros (numpy
        # carries no tz; ordering and the +window shift are unchanged)
        r = np.sort(
            rt.column(right_ts)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype("int64")
        )
        lo = (
            lt.column(left_ts)
            .to_numpy(zero_copy_only=False)
            .astype("datetime64[us]")
            .astype("int64")
        )
        n = int(
            (
                np.searchsorted(r, lo + win_us, "right")
                - np.searchsorted(r, lo, "left")
            ).sum()
        )
        return pa.table(
            {
                "key": pa.array([lt.column(key)[0].as_py()], pa.int64()),
                "n_pairs": pa.array([n], pa.int64()),
            }
        )

    return (
        left.groupBy(key)
        .cogroup(right.groupBy(key))
        .applyInArrow(match, schema="key long, n_pairs long")
        .withColumnRenamed("key", key)
        .filter(F.col("n_pairs") > 0)
    )


def grouped_ordered_fold(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    cols: Sequence[str],
    *,
    init: "Callable[[], object]",
    step: "Callable[[object, pd.DataFrame], object]",
    finish: "Callable[[object], tuple]",
    out_fields: Sequence[T.StructField],
    num_partitions: int | None = None,
) -> DataFrame:
    """Generic secondary-sort consumer: fold each key's rows IN ORDER through
    a user-supplied ``step``, emitting ``finish(state)`` per key.

    The machinery owns the scale mechanics — one hash shuffle on ``key``,
    per-partition sort on (key, *order), Arrow-batch streaming, and key
    boundary detection across batches — so ``step`` only ever sees a pandas
    slice of ONE key's consecutive rows (still vectorizable) plus the state
    carried from that key's earlier slices. Memory stays O(Arrow batch) no
    matter how many rows the hottest key has, which is what makes this the
    100 TB-safe alternative to ``applyInPandas`` (which materializes whole
    groups). ``longest_run_per_key`` above predates this API and keeps its
    fused batch-at-a-time kernel; new ordered consumers should start here.

    ``out_fields`` are the non-key output columns; the result schema is
    (key, *out_fields) and ``finish`` must return a matching tuple.
    """
    schema = T.StructType(
        [T.StructField(key, df.schema[key].dataType, True), *out_fields]
    )
    out_names = [key] + [f.name for f in out_fields]

    def consume(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        have = False
        cur_key = None
        state = None
        rows: list[tuple] = []

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            k = pdf[key].to_numpy()
            # start indices of each key slice in this batch
            starts = np.flatnonzero(
                np.concatenate(([True], k[1:] != k[:-1]))
            )
            bounds = np.append(starts, n)
            for i, s in enumerate(starts):
                kk = k[s]
                if have and kk != cur_key:
                    rows.append((cur_key, *finish(state)))
                    state = init()
                elif not have:
                    state = init()
                have, cur_key = True, kk
                state = step(state, pdf.iloc[s : bounds[i + 1]])

        if have:
            rows.append((cur_key, *finish(state)))
        if rows:
            yield pd.DataFrame(rows, columns=out_names)

    part = (
        df.repartition(num_partitions, key)
        if num_partitions
        else df.repartition(key)
    )
    ordered = part.sortWithinPartitions(key, *order).select(key, *order, *cols)
    return ordered.mapInPandas(consume, schema=schema)


def record_highs_per_key(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """(key, n_records): how many times ``value`` sets a strict new maximum
    per key when scanned in ``order`` — a running-max fold expressed via
    :func:`grouped_ordered_fold`.

    Per slice the kernel is numpy ``maximum.accumulate`` shifted by the
    carried max; only comparisons, so results are exact (no float
    accumulation drift vs the SQL window-function oracle).
    """

    def init():
        return (-np.inf, 0)

    def step(state, pdf):
        cur_max, cnt = state
        v = pdf[value].to_numpy(dtype="float64")
        run = np.maximum.accumulate(v)
        prev = np.empty_like(v)
        prev[0] = cur_max
        if len(v) > 1:
            np.maximum(run[:-1], cur_max, out=prev[1:])
        return (max(cur_max, float(run[-1])), cnt + int((v > prev).sum()))

    def finish(state):
        return (state[1],)

    return grouped_ordered_fold(
        df,
        key,
        order,
        [value],
        init=init,
        step=step,
        finish=finish,
        out_fields=[T.StructField("n_records", T.LongType(), True)],
        num_partitions=num_partitions,
    )


def longest_run_per_key(
    df: DataFrame,
    key: str,
    order: Sequence[str],
    value: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """(key, streak_len, streak_val): the longest run of equal consecutive
    ``value`` per key under ``order``; ties broken by earliest run.

    One shuffle (hash on key) + per-partition sort; the consumer streams
    Arrow batches with carry state, so memory is O(batch size) regardless of
    how many events the hottest key has.
    """
    schema = T.StructType(
        [
            T.StructField(key, df.schema[key].dataType, True),
            T.StructField("streak_len", T.LongType(), True),
            T.StructField("streak_val", df.schema[value].dataType, True),
        ]
    )

    def consume(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        have = False
        cur_key = None  # key currently being scanned
        run_val = None  # value of the run in progress
        run_len = 0  # length of the run in progress
        best_len = 0  # best closed-or-open run for cur_key so far
        best_val = None

        out_keys: list = []
        out_lens: list = []
        out_vals: list = []

        def close_key() -> None:
            nonlocal best_len, best_val, run_len
            # trailing run may be the best (earliest-max wins: strict >)
            if run_len > best_len:
                out_lens.append(run_len)
                out_vals.append(run_val)
            else:
                out_lens.append(best_len)
                out_vals.append(best_val)
            out_keys.append(cur_key)

        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            k = pdf[key].to_numpy()
            v = pdf[value].to_numpy()

            new_key = np.empty(n, dtype=bool)
            new_key[0] = (not have) or k[0] != cur_key
            new_key[1:] = k[1:] != k[:-1]
            run_break = np.empty(n, dtype=bool)
            run_break[0] = new_key[0] or v[0] != run_val
            run_break[1:] = new_key[1:] | (v[1:] != v[:-1])

            # run ids; id 0 (only if run_break[0] is False) continues the
            # carried run from the previous batch
            rid = np.cumsum(run_break)
            g = pd.DataFrame({"k": k, "v": v, "rid": rid})
            runs = g.groupby("rid", sort=True).agg(
                k=("k", "first"), v=("v", "first"), ln=("v", "size")
            )
            r_k = runs["k"].to_numpy()
            r_v = runs["v"].to_numpy()
            r_ln = runs["ln"].to_numpy().astype("int64")
            if not run_break[0]:
                r_ln[0] += run_len  # extend the carried run

            for i in range(len(runs)):
                if have and r_k[i] != cur_key:
                    close_key()
                    best_len, best_val = 0, None
                elif i > 0 or run_break[0]:
                    # same key, previous run closed: fold it into best
                    if run_len > best_len:
                        best_len, best_val = run_len, run_val
                have = True
                cur_key = r_k[i]
                run_val = r_v[i]
                run_len = int(r_ln[i])

        if have:
            close_key()
        if out_keys:
            yield pd.DataFrame(
                {key: out_keys, "streak_len": out_lens, "streak_val": out_vals}
            )

    part = (
        df.repartition(num_partitions, key)
        if num_partitions
        else df.repartition(key)
    )
    ordered = part.sortWithinPartitions(key, *order).select(key, *order, value)
    return ordered.mapInPandas(consume, schema=schema)


def distributed_rank(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    n_buckets: int = 16,
    out_col: str = "__rank",
) -> DataFrame:
    """Exact global row_number over (order_col asc, tiebreak_col asc)
    WITHOUT a single-partition sort.

    Range-buckets the order column on approxQuantile boundaries (a
    bounded driver collect — n_buckets-1 doubles, the same bounded-state
    idiom as the ANN codebooks), ranks within each bucket with an
    ordinary partitioned window, and adds broadcast running bucket-count
    offsets. Bucket boundaries only steer load balance: ANY ordered
    range split yields the same exact rank, so approxQuantile's
    approximation error and run-to-run sketch variance cannot change the
    result. Skewed order values degrade balance (one value = one
    bucket), never correctness.

    This is the scalable replacement for ``Window.orderBy(...)`` ranks:
    the corpus-sized sort happens per range partition, exactly like a
    repartitionByRange + local sort, while a global window funnels the
    whole input through ONE task.
    """
    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = sorted(set(df.stat.approxQuantile(order_col, probs, 0.001)))
    v = F.col(order_col)
    bucket = F.lit(len(bounds))
    for i in reversed(range(len(bounds))):
        bucket = F.when(v <= F.lit(bounds[i]), F.lit(i)).otherwise(bucket)
    d2 = df.withColumn("__b", bucket)
    wloc = Window.partitionBy("__b").orderBy(
        F.col(order_col).asc(), F.col(tiebreak_col).asc()
    )
    local = d2.withColumn("__r", F.row_number().over(wloc))
    off = (
        d2.groupBy("__b")
        .agg(F.count(F.lit(1)).alias("__c"))
        .select(
            "__b",
            F.coalesce(
                F.sum("__c").over(
                    Window.orderBy("__b").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).alias("__off"),
        )
    )
    return (
        local.join(F.broadcast(off), "__b")
        .withColumn(out_col, (F.col("__off") + F.col("__r")).cast("long"))
        .drop("__b", "__r", "__off")
    )


def distributed_ntile(
    df: DataFrame,
    order_col: str,
    tiebreak_col: str,
    k: int,
    n_buckets: int = 16,
    out_col: str = "bin",
) -> DataFrame:
    """Exact ntile(k) OVER (ORDER BY order_col, tiebreak_col) via
    ``distributed_rank`` + ntile's integer arithmetic: with n rows,
    q = n DIV k and r = n MOD k, the first r tiles hold q+1 rows — so
    bin = ceil(rank / (q+1)) while rank <= r*(q+1), else
    r + ceil((rank - r*(q+1)) / q). Bit-identical to the SQL ntile at
    any n/k (including n < k, where q = 0 and the first branch covers
    every row), all in integer DIV — engine-portable, no float."""
    ranked = distributed_rank(df, order_col, tiebreak_col, n_buckets)
    total = ranked.agg(F.count(F.lit(1)).alias("__n"))
    return (
        ranked.crossJoin(F.broadcast(total))
        .withColumn("__q", F.expr(f"__n DIV {k}"))
        .withColumn("__rm", F.expr(f"__n % {k}"))
        .withColumn(
            out_col,
            F.when(
                F.col("__rank") <= F.col("__rm") * (F.col("__q") + 1),
                F.expr("(__rank + __q) DIV (__q + 1)"),
            )
            .otherwise(
                F.expr(
                    "__rm + (__rank - __rm * (__q + 1) + __q - 1) DIV __q"
                )
            )
            .cast("int"),
        )
        .drop("__n", "__q", "__rm", "__rank")
    )
