"""chop_pack (distributed prefix-sum concat-and-chop packing): layout
invariants and the plan property that no single-partition window touches
the corpus (the whole point of the two-pass form)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.packing import chop_pack

SF = "/root/testdata/sf0.001"


def _docs(spark):
    d = spark.read.parquet(f"{SF}/documents.parquet")
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    return d.select("doc_id", F.size(ws).cast("long").alias("n_tokens"))


def test_layout_is_a_permutation_with_exact_offsets(spark):
    docs = _docs(spark)
    laid = chop_pack(docs, "doc_id", "n_tokens", seq_len=512).collect()
    total = sum(r["n_tokens"] for r in laid)
    # offsets sorted ascending are exactly the exclusive prefix sums:
    # every token position is covered once, no gaps, no overlaps
    rows = sorted(laid, key=lambda r: r["global_start"])
    cum = 0
    for r in rows:
        assert r["global_start"] == cum
        assert r["window_id"] == cum // 512
        expect_cross = r["n_tokens"] > 0 and (
            (cum + r["n_tokens"] - 1) // 512 > cum // 512
        )
        assert r["crosses_boundary"] == expect_cross
        cum += r["n_tokens"]
    assert cum == total
    assert len(laid) == docs.count()


def test_layout_is_partitioning_invariant(spark):
    docs = _docs(spark)
    a = {tuple(r) for r in chop_pack(docs, "doc_id", "n_tokens", 512).collect()}
    b = {
        tuple(r)
        for r in chop_pack(
            docs.repartition(7), "doc_id", "n_tokens", 512
        ).collect()
    }
    assert a == b


def test_corpus_window_is_not_single_partition(spark):
    df = chop_pack(_docs(spark), "doc_id", "n_tokens", 512)
    s = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    # the corpus cumsum shuffles on the bucket key; the only
    # SinglePartition exchange feeds the 16-row bucket-totals window
    assert "hashpartitioning(b" in s
    assert s.count("SinglePartition") <= 1
