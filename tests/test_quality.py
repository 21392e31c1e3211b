"""Data-quality checks: planted violations measured exactly, single scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators.quality import (
    Check,
    not_null_rate,
    predicate_rate,
    referential_integrity,
    run_checks,
    unique_rate,
)


def test_planted_violations(spark):
    rows = [(1, 10.0), (2, -5.0), (2, 3.0), (None, 4.0)]  # dup key, null, neg
    df = spark.createDataFrame(rows, "k long, v double")
    rep = {
        r["check"]: (r["metric"], r["passed"])
        for r in run_checks(
            df,
            [
                Check("nn_k", not_null_rate("k"), 1.0),
                Check("uq_k", unique_rate("k"), 1.0),
                Check("pos_v", predicate_rate(F.col("v") > 0), 1.0),
            ],
        ).collect()
    }
    assert rep["nn_k"] == (0.75, False)
    # count_distinct ignores the null row: 2 distinct / 4 rows
    assert rep["uq_k"] == (0.5, False)
    assert rep["pos_v"] == (0.75, False)


def test_referential_integrity_orphans(spark):
    fact = spark.createDataFrame([(1,), (2,), (9,)], "fk long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = referential_integrity(fact, "fk", dim, "pk").collect()[0]
    assert row["passed"] is False
    assert abs(row["metric"] - 2 / 3) < 1e-12
    clean = referential_integrity(fact.filter("fk < 3"), "fk", dim, "pk")
    assert clean.collect()[0]["passed"] is True


def test_observed_checks_ride_the_action(spark, tmp_path):
    from mongo_iceberg_lakehouse_spark.operators.quality import observed_checks

    df = spark.createDataFrame(
        [(1, 5.0), (2, -1.0), (None, 2.0)], "k long, v double"
    )
    instrumented, fetch = observed_checks(
        df,
        [
            Check("nn_k", not_null_rate("k"), 1.0),
            Check("pos_v", predicate_rate(F.col("v") > 0), 1.0),
        ],
    )
    # the caller's own action (a write) triggers metric collection
    instrumented.write.mode("overwrite").parquet(str(tmp_path / "out"))
    rep = fetch()
    assert rep["nn_k"] == (2 / 3, False)
    assert rep["pos_v"] == (2 / 3, False)


def test_checks_compile_to_single_scan(spark):
    df = spark.range(100).select(F.col("id").alias("k"))
    rep = run_checks(
        df,
        [
            Check("a", not_null_rate("k"), 1.0),
            Check("b", predicate_rate(F.col("k") >= 0), 1.0),
        ],
    )
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Range (0, 100") == 1


def test_pii_scrub_counts_and_redaction(spark):
    from mongo_iceberg_lakehouse_spark.operators.text import pii_scrub

    df = spark.createDataFrame(
        [
            (1, "mail a.b-c_1@ex-ample.co.uk or x@y.io and 555-123-4567"),
            (2, "no pii here at all"),
            (3, "dots 555.000.1111 work too"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(df).collect()}
    assert (rows[1]["n_emails"], rows[1]["n_phones"]) == (2, 1)
    assert (rows[2]["n_emails"], rows[2]["n_phones"]) == (0, 0)
    assert rows[3]["n_phones"] == 1
    # replacement bytes verified via length: "no pii here at all" unchanged
    assert rows[2]["redacted_len"] == len("no pii here at all")
    assert rows[1]["redacted_len"] == len(
        "mail <EMAIL> or <EMAIL> and <PHONE>"
    )
