"""End-to-end connector round-trips, self-enabling when jars appear.

VERDICT r2 carry-over item 9: the connector code paths (reference S2/S3/S5/
S7) are jar-gated in this image — the jars are absent, so the only testable
behavior today is the gating itself (tests/test_catalog.py covers that).
These skeletons encode the FULL round-trip parity check so that the day a
future image ships iceberg-spark-runtime / mongo-spark-connector /
spark-sql-kafka / a JDBC driver, the probes light up and parity is proven
without new test code.

Each test:
1. probes the classpath (sources/connectors.py::*_available);
2. skips with an explicit reason if the jar is missing;
3. otherwise writes a small frame through the connector and reads it back,
   asserting content equality (and, for Iceberg, snapshot semantics).

External services (a Mongo/Postgres endpoint) are configured via env vars
so CI images with service containers can opt in:
  SPARK_GRAFT_MONGO_URI, SPARK_GRAFT_JDBC_URL/USER/PASSWORD.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.sources import connectors as C


def _roundtrip_frame(spark):
    return spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.25), (3, "c", 30.0)],
        "id int, tag string, amount double",
    )


def test_iceberg_createreplace_roundtrip(spark, tmp_path):
    if not C.iceberg_runtime_available(spark):
        pytest.skip("iceberg-spark-runtime jar not on classpath")
    # catalog conf mirroring the reference's Nessie-less local catalog:
    # spark_jobs/mongo_to_iceberg.py:80-86 wires catalog-impl + warehouse
    spark.conf.set(
        "spark.sql.catalog.it", "org.apache.iceberg.spark.SparkCatalog"
    )
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse", str(tmp_path / "iceberg_wh"))
    df = _roundtrip_frame(spark)
    df.writeTo("it.db.t").createOrReplace()
    back = spark.table("it.db.t")
    assert sorted(r["id"] for r in back.collect()) == [1, 2, 3]
    # snapshot-replace semantics: second createOrReplace swaps atomically
    df.withColumn("amount", F.col("amount") * 2).writeTo(
        "it.db.t"
    ).createOrReplace()
    assert spark.table("it.db.t").agg(F.sum("amount")).collect()[0][0] == 121.5


def test_mongodb_write_read_roundtrip(spark):
    if not C.mongodb_connector_available(spark):
        pytest.skip("mongo-spark-connector jar not on classpath")
    uri = os.environ.get("SPARK_GRAFT_MONGO_URI")
    if not uri:
        pytest.skip("SPARK_GRAFT_MONGO_URI not set (no Mongo endpoint)")
    df = _roundtrip_frame(spark)
    C.write_mongodb(df, uri, "sparkgraft_test", "roundtrip", mode="overwrite")
    back = C.read_mongodb(spark, uri, "sparkgraft_test", "roundtrip")
    assert back.count() == 3
    # schema inference parity (reference S3): inferred columns superset
    assert {"id", "tag", "amount"} <= set(back.columns)


def test_jdbc_overwrite_roundtrip(spark):
    url = os.environ.get("SPARK_GRAFT_JDBC_URL")
    driver = os.environ.get("SPARK_GRAFT_JDBC_DRIVER", "org.postgresql.Driver")
    if not C.jdbc_driver_available(spark, driver):
        pytest.skip(f"JDBC driver {driver} not on classpath")
    if not url:
        pytest.skip("SPARK_GRAFT_JDBC_URL not set (no database endpoint)")
    df = _roundtrip_frame(spark)
    C.write_jdbc(
        df,
        url,
        "sparkgraft_roundtrip",
        os.environ.get("SPARK_GRAFT_JDBC_USER", ""),
        os.environ.get("SPARK_GRAFT_JDBC_PASSWORD", ""),
        driver=driver,
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "sparkgraft_roundtrip")
        .option("driver", driver)
        .load()
    )
    assert back.count() == 3


def test_jdbc_roundtrip_embedded_derby(spark, tmp_path):
    """The one JDBC path that needs NO external endpoint: Derby's embedded
    driver ships inside stock Spark (the Hive-metastore database), so the
    REAL S7 wire path — dialect resolution, DDL type mapping, batched
    inserts, overwrite semantics — executes end-to-end in this image."""
    if not C.derby_embedded_available(spark):
        pytest.skip("derby embedded driver not on classpath")
    url = f"jdbc:derby:{tmp_path}/derby_e2e;create=true"
    df = _roundtrip_frame(spark)
    C.write_jdbc(df, url, "roundtrip", driver=C.DERBY_EMBEDDED_DRIVER)
    back = C.read_jdbc(spark, url, "roundtrip", driver=C.DERBY_EMBEDDED_DRIVER)
    assert sorted((r["id"], r["tag"], r["amount"]) for r in back.collect()) == [
        (1, "a", 10.5),
        (2, "b", 20.25),
        (3, "c", 30.0),
    ]
    # overwrite semantics (the reference's gold sink mode): a second
    # overwrite REPLACES, never appends
    C.write_jdbc(
        df.withColumn("amount", F.col("amount") * 2),
        url,
        "roundtrip",
        driver=C.DERBY_EMBEDDED_DRIVER,
    )
    again = C.read_jdbc(spark, url, "roundtrip", driver=C.DERBY_EMBEDDED_DRIVER)
    assert again.count() == 3
    assert again.agg(F.sum("amount")).collect()[0][0] == 121.5


def test_jdbc_partitioned_parallel_read(spark, tmp_path):
    """The 100 TB-posture JDBC SCAN: partitionColumn/bounds/numPartitions
    fan the read out over N concurrent connections (one WHERE-range per
    task) instead of funneling the table through one connection. Proven
    against embedded Derby: the partitioned read yields the requested
    task count AND the same rows as the single-connection read."""
    if not C.derby_embedded_available(spark):
        pytest.skip("derby embedded driver not on classpath")
    url = f"jdbc:derby:{tmp_path}/derby_par;create=true"
    df = spark.range(0, 1000).selectExpr(
        "CAST(id AS INT) AS id", "CAST(id % 7 AS DOUBLE) AS v"
    )
    C.write_jdbc(df, url, "wide", driver=C.DERBY_EMBEDDED_DRIVER)
    par = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "wide")
        .option("driver", C.DERBY_EMBEDDED_DRIVER)
        .option("partitionColumn", "id")
        .option("lowerBound", "0")
        .option("upperBound", "1000")
        .option("numPartitions", "4")
        .load()
    )
    assert par.rdd.getNumPartitions() == 4
    # plan-shape pin: the scan node itself must carry the fan-out (a
    # repartition AFTER a single-connection read would also show 4 RDD
    # partitions but funnel the table through one JDBC cursor)
    plan = par._jdf.queryExecution().executedPlan().toString()
    assert "numPartitions=4" in plan, plan
    # each task must have scanned ITS OWN stride-250 id range — i.e. the
    # four concurrent connections issued disjoint WHERE-range predicates,
    # not four full scans deduplicated downstream
    per_part = par.rdd.glom().map(len).collect()
    assert per_part == [250, 250, 250, 250], per_part
    single = C.read_jdbc(spark, url, "wide", driver=C.DERBY_EMBEDDED_DRIVER)
    assert par.count() == 1000
    assert par.exceptAll(single).count() == 0
    assert single.exceptAll(par).count() == 0


def test_kafka_stream_source_constructs(spark):
    if not C.kafka_connector_available(spark):
        pytest.skip("spark-sql-kafka jar not on classpath")
    servers = os.environ.get("SPARK_GRAFT_KAFKA_BOOTSTRAP")
    if not servers:
        pytest.skip("SPARK_GRAFT_KAFKA_BOOTSTRAP not set (no broker)")
    stream = C.read_kafka_stream(spark, servers, "sparkgraft-test")
    assert stream.isStreaming
    assert {"key", "value", "topic"} <= set(stream.columns)


def test_probes_return_bool(spark):
    # the probes themselves must never raise in a jar-less image
    assert isinstance(C.iceberg_runtime_available(spark), bool)
    assert isinstance(C.mongodb_connector_available(spark), bool)
    assert isinstance(C.kafka_connector_available(spark), bool)
    assert isinstance(C.jdbc_driver_available(spark), bool)
