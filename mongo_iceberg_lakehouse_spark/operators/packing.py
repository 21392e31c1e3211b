"""Sequence packing: group documents into token-budget batches.

LLM training pipelines pack variable-length documents into fixed token
budgets (context windows) to minimize padding. Optimal bin packing is
NP-hard and inherently sequential, so the scalable form is sharded
first-fit-decreasing (FFD): a deterministic hash shards the corpus, each
shard packs independently with FFD (a Pandas-UDF stage over a grouped
shuffle), and batch ids are namespaced per shard. Shard count tracks
cluster width; each shard's state is just its open-bin table, so memory
is O(bins), not O(docs).

Determinism: shard = xxhash64(id) mod n_shards and FFD orders by
(tokens desc, id), so the packing is a pure function of the data —
independent of partition layout, cluster size, or run.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one shard packs at most this many batches before ids would collide
_SHARD_SPAN = 10_000_000


def pack_batches(
    df: DataFrame,
    id_col: str,
    tokens_col: str,
    budget: int,
    n_shards: int = 64,
) -> DataFrame:
    """Assign every row a ``batch_id`` such that each batch's token sum is
    <= ``budget`` (a single row exceeding the budget gets its own batch).

    Returns the input columns id/tokens plus ``batch_id``.
    """
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")

    src = df.select(
        F.col(id_col).alias("id").cast("bigint"),
        F.col(tokens_col).alias("tokens").cast("bigint"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards)).alias("shard"),
    )

    def pack(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (shard,) = key
        pdf = pdf.sort_values(
            ["tokens", "id"], ascending=[False, True], kind="mergesort"
        )
        bins: list[int] = []  # remaining capacity per open bin
        assign = []
        for tokens in pdf["tokens"]:
            placed = False
            # first-fit over open bins
            for i, rem in enumerate(bins):
                if tokens <= rem:
                    bins[i] = rem - tokens
                    assign.append(i)
                    placed = True
                    break
            if not placed:
                bins.append(max(budget - tokens, 0))
                assign.append(len(bins) - 1)
        pdf = pdf.assign(batch_id=[shard * _SHARD_SPAN + a for a in assign])
        return pdf[["id", "tokens", "batch_id"]]

    return src.groupBy("shard").applyInPandas(
        pack, schema="id bigint, tokens bigint, batch_id bigint"
    )


def batch_summary(packed: DataFrame, budget: int) -> DataFrame:
    """Per-batch fill statistics for a ``pack_batches`` result."""
    return (
        packed.groupBy("batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tokens").alias("n_tokens"),
        )
        .withColumn("fill", F.col("n_tokens").cast("double") / F.lit(budget))
    )
