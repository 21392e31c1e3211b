"""Source/sink format breadth: JSON (reference S1), CSV, ORC, JSONL, and the
connector registry's gating behavior."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.sources.connectors import (
    ConnectorUnavailable,
    read_mongodb,
)
from mongo_iceberg_lakehouse_spark.sources.json_source import ingest_json


def _sample(spark):
    return spark.range(50).select(
        F.col("id"),
        (F.col("id") * 2.5).alias("amount"),
        F.concat(F.lit("name_"), F.col("id")).alias("name"),
    )


@pytest.mark.parametrize("fmt", ["csv", "orc", "parquet", "json"])
def test_roundtrip_formats(spark, tmp_path, fmt):
    df = _sample(spark)
    path = str(tmp_path / f"t_{fmt}")
    writer = df.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", "true")
    getattr(writer, "format")(fmt).save(path)
    reader = spark.read
    if fmt == "csv":
        reader = reader.option("header", "true").option("inferSchema", "true")
    back = reader.format(fmt).load(path)
    assert back.count() == 50
    assert {r.name for r in back.collect()} == {f"name_{i}" for i in range(50)}


def test_jsonl_ingestion_is_splittable(spark, tmp_path):
    # JSONL (one doc per line) is the scale form of the reference's JSON
    # array ingest: no multiLine, so the file splits across workers.
    p = tmp_path / "docs.jsonl"
    p.write_text("\n".join('{"a": %d, "b": "x%d"}' % (i, i) for i in range(20)))
    df = ingest_json(spark, str(p), multiline=False)
    assert df.count() == 20
    assert set(df.columns) == {"a", "b"}


def test_mongodb_connector_gated(spark):
    with pytest.raises(ConnectorUnavailable):
        read_mongodb(spark, "mongodb://nohost:1/db", "db", "coll")


def test_kafka_connector_gated(spark):
    from mongo_iceberg_lakehouse_spark.sources.connectors import read_kafka_stream

    with pytest.raises(ConnectorUnavailable):
        read_kafka_stream(spark, "nohost:9092", "events")


def test_iceberg_runtime_probe(spark):
    """The probe reports jar presence; in this image the runtime is absent,
    so it must return False — and a present class resolves True through the
    same classloader path (sanity that the probe isn't always-False)."""
    from mongo_iceberg_lakehouse_spark.sources.connectors import (
        iceberg_runtime_available,
    )

    assert iceberg_runtime_available(spark) is False
    # same probe mechanics on a class that IS on every Spark classpath
    jvm = spark.sparkContext._jvm
    loader = jvm.java.lang.Thread.currentThread().getContextClassLoader()
    assert (
        jvm.java.lang.Class.forName(
            "org.apache.spark.sql.SparkSession", False, loader
        )
        is not None
    )


def test_binaryfile_glob_prunes_at_listing(spark):
    # binaryFile + pathGlobFilter: the decoy manifest.txt sits in the same
    # dir but must never appear — pruned during listing, not post-filtered.
    from mongo_iceberg_lakehouse_spark.sources.files import (
        read_binary_files,
        write_png_assets,
    )

    path = write_png_assets(8)
    all_files = read_binary_files(spark, path)
    pngs = read_binary_files(spark, path, glob="*.png")
    assert all_files.count() == 9  # 8 assets + 1 decoy
    assert pngs.count() == 8
    assert pngs.filter(F.col("path").endswith(".txt")).count() == 0
    # the source exposes file metadata alongside the blob
    assert {"path", "modificationTime", "length", "content"} <= set(
        all_files.columns
    )


def test_binaryfile_ingest_decodes_real_pixels(spark):
    # Content bytes must survive the write-list-read chain exactly: the
    # decoded per-channel sums match the pure-function-of-id arithmetic.
    from mongo_iceberg_lakehouse_spark.sources.files import ingest_png_assets

    out = {r["doc_id"]: r for r in ingest_png_assets(spark, 16).collect()}
    assert len(out) == 16
    for i, r in out.items():
        w, h = 4 + i % 13, 4 + (i * 7) % 11
        assert (r["width"], r["height"]) == (w, h)
        want_r = sum(
            (i * 31 + rr * 7 + cc * 3) % 256
            for rr in range(h)
            for cc in range(w)
        )
        assert r["sum_r"] == want_r and r["is_png"]


def test_text_roundtrip_lossless(spark):
    # write.text -> read.text must reproduce every (doc_id, text) pair.
    from mongo_iceberg_lakehouse_spark.sources.files import (
        read_text_corpus,
        write_text_corpus,
    )

    d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").select(
        "doc_id", "text"
    )
    path = write_text_corpus(d, "/root/testdata/sf0.001", "doc_id", "text")
    back = read_text_corpus(spark, path)
    assert back.count() == d.count()
    assert d.exceptAll(back).count() == 0
    assert back.exceptAll(d).count() == 0
