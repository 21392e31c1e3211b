"""Incremental view maintenance for algebraic aggregates.

The reference's gold job recomputes its report from silver on every Airflow
run (spark_jobs/gold_reporting.ipynb) — O(table) per refresh. At 100 TB the
refresh must be O(delta): keep the *state* of the view (per-group partial
aggregates), and on new data fold ``state(delta)`` into the stored state —
never rescanning history.

That works exactly for algebraic aggregates, where a mergeable state exists:
  count -> sum of counts        sum -> sum of sums
  min/max -> min/max            avg -> (sum, count), derived at read
  count distinct -> HLL sketch partial (hll_union_agg), approximate
Holistic aggregates (exact median/percentile) have no bounded mergeable
state — that's precisely why the engine carries sketch rollups
(`operators/sketches.py`) for the distinct/quantile family.

The state table is keyed by the group columns: merging shuffles
O(|state| + |delta groups|), independent of raw history size.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STATE_COLS = ("cnt", "total", "mx", "hll")


def aggregate_state(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    distinct_key: str,
    lg_config_k: int = 12,
) -> DataFrame:
    """Mergeable per-group state: count, sum, max, HLL(distinct_key)."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(value).alias("total"),
        F.max(value).alias("mx"),
        F.hll_sketch_agg(distinct_key, F.lit(lg_config_k)).alias("hll"),
    )


def merge_state(old: DataFrame, delta: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Fold a delta's state into the stored state — O(groups), no raw scan."""
    return (
        old.unionByName(delta)
        .groupBy(*keys)
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("total").alias("total"),
            F.max("mx").alias("mx"),
            F.hll_union_agg("hll").alias("hll"),
        )
    )


def gold_view(state: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Derive the user-facing view from state (avg from sum/count, distinct
    estimate from the sketch)."""
    return state.select(
        *keys,
        F.col("cnt").alias("n_rows"),
        F.col("total").alias("sum_value"),
        (F.col("total") / F.col("cnt")).alias("avg_value"),
        F.col("mx").alias("max_value"),
        F.hll_sketch_estimate("hll").alias("approx_distinct"),
    )
