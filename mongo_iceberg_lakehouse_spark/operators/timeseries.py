"""Time-series gap-fill + last-observation-carried-forward (LOCF).

The hypertable operator family (`operators/rollup.py` holds the continuous
rollup) needs a gap-fill: downstream consumers of a per-entity hourly series
expect a dense grid, but raw events are sparse. TimescaleDB calls this
``time_bucket_gapfill`` + ``locf``; Spark-first it is:

  bucket -> per-entity [min,max] bounds -> sequence()+explode densifies the
  grid (each entity generates only ITS OWN span, not a global cross join) ->
  left join actuals -> last(value, ignorenulls) over an unbounded-preceding
  frame carries observations forward.

Two shuffles total — (entity, bucket) for the densify join (partial agg
shrinks it first), entity for the fill window; the grid explode is a
narrow map off the tiny bounds aggregate. The global cross-join
formulation (calendar x entities) would materialize the full calendar for
every entity regardless of its lifespan — this one is proportional to the
observed spans only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gapfill_locf(
    df: DataFrame,
    key: str,
    ts: str,
    value: str,
    bucket: str = "hour",
    step: str = "INTERVAL 1 HOUR",
) -> DataFrame:
    """(key, bucket_ts, v_filled, is_gap): dense per-key grid between each
    key's first and last bucket; gaps carry the last observed value."""
    actual = (
        df.select(key, F.date_trunc(bucket, F.col(ts)).alias("__h"), value)
        .groupBy(key, "__h")
        .agg(F.sum(value).alias("__v"))
    )
    bounds = actual.groupBy(key).agg(
        F.min("__h").alias("__h0"), F.max("__h").alias("__h1")
    )
    # outer + null-filter: skip explode's inferred-filter re-evaluation of
    # the sequence; __h0 <= __h1 whenever the key has observations, and the
    # null-filter drops keys whose timestamps were all null (same as explode)
    grid = bounds.select(
        key,
        F.explode_outer(F.sequence("__h0", "__h1", F.expr(step))).alias(
            "__h"
        ),
    ).filter(F.col("__h").isNotNull())
    j = grid.join(actual, [key, "__h"], "left")
    w = (
        Window.partitionBy(key)
        .orderBy("__h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        key,
        F.col("__h").alias("bucket_ts"),
        F.last("__v", ignorenulls=True).over(w).alias("v_filled"),
        F.col("__v").isNull().alias("is_gap"),
    )
