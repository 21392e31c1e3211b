"""Spatial radius join via grid-cell bucketing (trig-free).

Points live in a projected planar coordinate system (the lakehouse norm:
project once at ingest, join in the plane). Radius search is an equi-join on
grid cells: each left point expands to its 3x3 neighborhood of cells of side
``radius``, the right side keeps its own cell, and the exact distance filter
runs only on same-neighborhood candidates — O(n * density) instead of the
O(n^2) cross join, and the join key is a well-distributed (cx, cy) pair.
Integer coordinates keep the oracle comparison exact (squared distances,
no sqrt/trig parity concerns across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def radius_pairs_grid(
    points: DataFrame,
    radius: int,
    id_col: str = "id",
    x_col: str = "x",
    y_col: str = "y",
) -> DataFrame:
    """Pairs (id_a < id_b, dist2 <= radius^2) via 3x3 grid-cell join."""
    p = points.select(
        F.col(id_col).alias("__pid"), F.col(x_col).alias("__x"),
        F.col(y_col).alias("__y"),
        F.floor(F.col(x_col) / radius).alias("__cx"),
        F.floor(F.col(y_col) / radius).alias("__cy"),
    )
    offsets = F.expr(
        "flatten(transform(sequence(-1, 1), dx -> "
        "transform(sequence(-1, 1), dy -> struct(dx, dy))))"
    )
    left = p.select(
        F.col("__pid").alias("id_a"), F.col("__x").alias("xa"),
        F.col("__y").alias("ya"),
        F.explode(offsets).alias("__o"),
        F.col("__cx"), F.col("__cy"),
    ).select(
        "id_a", "xa", "ya",
        (F.col("__cx") + F.col("__o.dx")).alias("jx"),
        (F.col("__cy") + F.col("__o.dy")).alias("jy"),
    )
    right = p.select(
        F.col("__pid").alias("id_b"), F.col("__x").alias("xb"),
        F.col("__y").alias("yb"),
        F.col("__cx").alias("jx"), F.col("__cy").alias("jy"),
    )
    dist2 = (
        (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb"))
        + (F.col("ya") - F.col("yb")) * (F.col("ya") - F.col("yb"))
    )
    return (
        left.join(right, ["jx", "jy"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist2.alias("dist2"))
        .filter(F.col("dist2") <= radius * radius)
    )
