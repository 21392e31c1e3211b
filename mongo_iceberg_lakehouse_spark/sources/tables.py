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
from pyspark.sql.types import LongType

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
    """events with ``ts`` normalized to a microsecond timestamp.

    Fixture generations differ: some store ``ts`` as TIMESTAMP(NANOS)
    (which Spark's reader rejects, so we read nanos-as-long and truncate),
    newer ones store TIMESTAMP(MICROS) which Spark reads natively. Both
    paths land on the exact value DuckDB's ``CAST(ts AS TIMESTAMP)`` yields.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if isinstance(df.schema["ts"].dataType, LongType):
        # `ts div 1000` truncates ns -> us exactly like DuckDB's CAST
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    tune(spark)
    if name == "events":
        return load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = FIXTURE_TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
