"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference lakehouse (Deekshitha257/mongo-iceberg-lakehouse).

The reference is a medallion-architecture pipeline (MongoDB -> Iceberg bronze ->
silver struct evolution -> gold grouped report -> Postgres); see SURVEY.md.
This package re-expresses that surface — plus the standard relational operator
set its data model implies, and LLM-data-pipeline extensions (dedup, similarity
search, text analysis, multimodal columns) — as idiomatic Spark DataFrame code
designed for 100 TB scale.

Layout:
- session:    tuned SparkSession factory (AQE, UTC, Arrow).
- catalog:    namespace DDL / snapshot-replace tables (reference S4/S8/S9).
- sources:    schema-inferred JSON ingestion, testdata table loaders,
              connector registry (mongodb / iceberg / jdbc kept pluggable).
- plans:      the medallion bronze/silver/gold pipeline (reference parity).
- operators:  dedup, similarity search, text analysis, multimodal, relational.
- functions:  vector/scalar helpers built on pyspark.sql.functions.
- streaming:  Structured Streaming over the events table.
- queries:    named query registry + DuckDB oracle SQL (driver contract).
"""

__version__ = "0.1.0"
