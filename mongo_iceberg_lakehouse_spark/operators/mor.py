"""Merge-on-read resolution: base snapshot + delta log -> current view.

The lakehouse mutation trade-off (Iceberg v2 / Delta deletion vectors): a
copy-on-write upsert (`relational.upsert_snapshot`, reference's
create-or-replace write path, spark_jobs/mongo_to_iceberg.ipynb cell-7)
rewrites O(table) per commit; merge-on-read appends O(delta) and defers
reconciliation to the reader. At 100 TB with small mutation rates, MoR is
the only affordable write path — the cost moves to this read-side resolve,
which must stay a single key-shuffle.

Delta log contract: one row per mutation with (op in {'upsert','delete'},
seq monotonically increasing per key, key, payload...). Resolution: the
highest-seq delta per key wins; 'delete' suppresses the key; keys without
deltas keep the base row. Base rows rank below every delta (seq -1).

One shuffle on the key for the union'd window; compaction (folding the
delta log back into base) is the same function materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_on_read(
    base: DataFrame,
    deltas: DataFrame,
    key: str,
    seq: str = "seq",
    op: str = "op",
) -> DataFrame:
    """Resolve base ∪ delta-log into the current view (schema = base's).

    ``deltas`` must carry [op, seq, key, *payload] with payload columns
    matching base. Latest seq per key wins, deletes drop the key.
    """
    payload = [c for c in base.columns]
    b = base.select(
        F.lit("upsert").alias("__op"), F.lit(-1).cast("long").alias("__seq"), *payload
    )
    d = deltas.select(
        F.col(op).alias("__op"), F.col(seq).cast("long").alias("__seq"), *payload
    )
    w = Window.partitionBy(key).orderBy(F.col("__seq").desc())
    return (
        b.unionByName(d)
        .withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col("__op") != "delete"))
        .select(*payload)
    )
