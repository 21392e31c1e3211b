"""Streaming curation funnel: batch-equivalence, including true
multi-micro-batch arrival (the availableNow single-batch case is covered
by the oracle in test_oracle_parity)."""

from mongo_iceberg_lakehouse_spark.streaming.curation import (
    quality_funnel,
    run_stream_quality_funnel,
)

from .conftest import SF_SMOKE


def test_funnel_stream_equals_batch(spark):
    batch = quality_funnel(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ).collect()[0]
    stream = run_stream_quality_funnel(spark, SF_SMOKE).collect()[0]
    assert stream.asDict() == batch.asDict()


def test_funnel_multi_batch_equals_batch(spark, tmp_path):
    # two file slices + maxFilesPerTrigger=1 => two micro-batches; the
    # complete-mode global agg must still equal the batch aggregate over
    # the union. Split on a deterministic predicate — limit() without an
    # ordering is not stable across evaluations.
    src = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    d = str(tmp_path / "docs")
    src.filter("doc_id % 2 = 0").write.parquet(f"{d}/documents.parquet/p0")
    src.filter("doc_id % 2 = 1").write.parquet(f"{d}/documents.parquet/p1")
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(f"{d}/documents.parquet")
    )
    q = (
        quality_funnel(stream)
        .writeStream.format("memory")
        .queryName("funnel_mb")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    got = spark.table("funnel_mb").collect()[0]
    want = quality_funnel(src).collect()[0]
    assert got.asDict() == want.asDict()


def test_classifier_funnel_stream_equals_batch(spark):
    from mongo_iceberg_lakehouse_spark.streaming.curation import (
        classifier_funnel,
        run_stream_classifier_funnel,
    )

    batch = classifier_funnel(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    ).collect()[0]
    stream = run_stream_classifier_funnel(spark, SF_SMOKE).collect()[0]
    assert stream.asDict() == batch.asDict()


def test_classifier_funnel_multi_batch_equals_batch(spark, tmp_path):
    from mongo_iceberg_lakehouse_spark.streaming.curation import (
        classifier_funnel,
    )

    src = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    d = str(tmp_path / "docs")
    src.filter("doc_id % 2 = 0").write.parquet(f"{d}/documents.parquet/p0")
    src.filter("doc_id % 2 = 1").write.parquet(f"{d}/documents.parquet/p1")
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(f"{d}/documents.parquet")
    )
    q = (
        classifier_funnel(stream)
        .writeStream.format("memory")
        .queryName("clf_funnel_mb")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    got = spark.table("clf_funnel_mb").collect()[0]
    want = classifier_funnel(src).collect()[0]
    assert got.asDict() == want.asDict()
