"""Loaders for the driver-generated parquet fixtures (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events documents
embeddings, one parquet file each under ``{sf_dir}/``.

``events.parquet`` stores TIMESTAMP(NANOS) which Spark's parquet reader
rejects outright ([PARQUET_TYPE_ILLEGAL]); we read nanos as a long
(``spark.sql.legacy.parquet.nanosAsLong``) and truncate to microseconds,
matching DuckDB's ``CAST(ts AS TIMESTAMP)`` truncation — this keeps the
correctness oracle bit-identical on timestamp values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import tune

FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ``ts`` converted nanos-long -> microsecond timestamp."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    # `ts div 1000` truncates ns -> us exactly like DuckDB CAST(ts AS TIMESTAMP)
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
