"""Idempotent foreachBatch sinks.

Structured Streaming's foreachBatch gives *at-least-once* delivery to the
sink function: if the job dies after the sink writes but before the
checkpoint commits the epoch, the SAME (batch_df, batch_id) is delivered
again on restart. An append-mode sink therefore duplicates that batch's
rows. The standard fix — what transactional sinks (Delta/Iceberg) do via
the txn/batch-id — is to make the write *keyed by batch_id* and skip (or
overwrite to the same location) when that batch_id has already committed.

``batch_partitioned_writer`` implements the filesystem version: each
epoch writes to ``out/batch_id=<n>`` with dynamic partition overwrite, so
a redelivered epoch replaces its own partition byte-for-byte instead of
appending a second copy. Readers see ``out`` as one parquet table (the
``batch_id`` partition column is pruned or read like any other column).

Scale posture: the commit check is one directory rename/overwrite per
epoch — no read-back of existing data, no global dedup join at read
time, state O(1) per epoch regardless of table size.
"""

from __future__ import annotations

from typing import Callable


def batch_partitioned_writer(out_dir: str) -> Callable:
    """Return a foreachBatch function writing each epoch to its own
    ``batch_id=<n>`` partition with partition-overwrite semantics —
    redelivery of an epoch is idempotent (same partition rewritten, not
    appended)."""

    def write(batch_df, batch_id: int) -> None:
        from pyspark.sql import functions as F

        (
            batch_df.withColumn("batch_id", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("batch_id")
            .parquet(out_dir)
        )

    return write
