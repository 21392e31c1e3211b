"""Schema-inferred JSON document ingestion (reference S1 + S3 semantics).

The reference lands a JSON array of order documents into MongoDB
(airflow/dags/json_to_mongo_dag.py:17-25) and then reads it back with the
mongo-spark-connector's sampled schema inference
(spark_jobs/mongo_to_iceberg.py:118-124). Behaviorally that is a
union-of-documents inferred schema over nested JSON: documents missing a field
get null, extra fields widen the schema (drift — SURVEY.md §1.4).

``spark.read.json`` does exactly that union-based inference, so ingesting the
JSON directly reproduces the connector's observable behavior without a Mongo
round-trip. The connector itself stays available behind
``sources.connectors.read_mongodb`` for production.

Scale note: multiLine JSON cannot be split across workers per file — at real
scale land documents as JSONL (one per line, splittable) or many files.
``ingest_json`` accepts either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ingest_json(spark: SparkSession, path: str, multiline: bool = True) -> DataFrame:
    """Read JSON document(s) with union-of-documents schema inference."""
    reader = spark.read
    if multiline:
        reader = reader.option("multiLine", "true")
    return reader.json(path)


def with_object_id(df: DataFrame, business_key: str = "order_id") -> DataFrame:
    """Prepend a deterministic ``_id`` column standing in for Mongo's ObjectId
    (the reference's inferred schema has ``_id: string`` as first field,
    spark_jobs/mongo_to_iceberg.ipynb:188-206)."""
    cols = df.columns
    oid = F.substring(F.sha2(F.col(business_key).cast("string"), 256), 1, 24)
    return df.withColumn("_id", oid).select("_id", *cols)
