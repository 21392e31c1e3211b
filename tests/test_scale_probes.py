"""Round-9 scale-aware probes (queries.SCALE_PROBES additions).

Four queries' FULL oracles are linear but their sf100 verification
artifacts outgrow one box (round-8 gate log): window_running_sum /
scd2_customer_priority collect ~150M rows, dedup_span_scrub's global
dictionary + rebuild wants ~160 GB, text_collocations_lift's string-keyed
count table spilled >58 GB. Each probe dispatches on the driving table's
rowcount: below the threshold it IS the full query + full oracle, above it
both sides cut to the same deterministic md5 slice. These tests pin

1. the probes exist and the threshold constants match the proven gate
   scales (sf10 full compares in docs/SF10_GATE_r05.log);
2. the small arm is a true passthrough (probe fn == registry fn rows) so
   the sf1/sf10 gates lose nothing;
3. probe-vs-oracle value parity at smoke scale through the exact gate
   compare path;
4. the big arm of each probe (thresholds forced to 0) also matches its
   big-arm oracle — the slice logic itself, engine vs SQL.

The non-vacuous big-arm evidence lives one decade up: at sf1 the anchored
span-scrub slice contains docs with real removals (verified green in the
round-9 session), which is what catches an engine that wrongly prunes the
span DICTIONARY to anchored docs (a span duplicated between an anchored
and a non-anchored doc would vanish).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.queries import (
    _DOCS_FULL_MAX,
    _ORDERS_FULL_MAX,
    REGISTRY,
    SCALE_PROBES,
    _anchor_doc,
    _anchor_key,
)
from tests.compare import compare_spark_duckdb

SF = "/root/testdata/sf0.001"
NEW_PROBES = (
    "window_running_sum",
    "scd2_customer_priority",
    "dedup_span_scrub",
    "text_collocations_lift",
)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem "
        "events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{SF}/{t}.parquet')"
        )
    yield con
    con.close()


def test_probes_registered_with_thresholds_in_sql():
    for name in NEW_PROBES:
        assert name in SCALE_PROBES
    # sf10 orders = 15M / documents = 500k both passed FULL compares
    # (docs/SF10_GATE_r05.log) — the thresholds must keep those gates on
    # the full arm
    assert _ORDERS_FULL_MAX >= 15_000_000
    assert _DOCS_FULL_MAX >= 500_000
    # the dispatch constant must be baked into the oracle SQL itself so
    # engine fn and oracle can never disagree about which arm runs
    for name in ("window_running_sum", "scd2_customer_priority"):
        assert f"<= {_ORDERS_FULL_MAX}" in SCALE_PROBES[name].oracle
    for name in ("dedup_span_scrub", "text_collocations_lift"):
        assert f"<= {_DOCS_FULL_MAX}" in SCALE_PROBES[name].oracle


@pytest.mark.parametrize(
    "name", ["window_running_sum", "scd2_customer_priority", "dedup_span_scrub"]
)
def test_small_arm_is_full_passthrough(spark, name):
    # below the threshold the probe must return the registry query's rows
    # EXACTLY — the lower gates keep full-fidelity verification
    probe = SCALE_PROBES[name].fn(spark, SF)
    full = REGISTRY[name].fn(spark, SF)
    assert probe.columns == full.columns
    assert probe.exceptAll(full).count() == 0
    assert full.exceptAll(probe).count() == 0


@pytest.mark.parametrize("name", list(NEW_PROBES))
def test_small_arm_probe_vs_oracle(spark, duck, name):
    ok, msg = compare_spark_duckdb(
        SCALE_PROBES[name].fn(spark, SF), duck, SCALE_PROBES[name].oracle
    )
    assert ok, f"{name}: {msg}"


def _big_oracle(name: str) -> str:
    # force the anchored/bucketed arm at smoke scale
    return (
        SCALE_PROBES[name]
        .oracle.replace(f"<= {_ORDERS_FULL_MAX}", "<= 0")
        .replace(f"<= {_DOCS_FULL_MAX}", "<= 0")
    )


def test_big_arm_window_running_sum(spark, duck):
    df = REGISTRY["window_running_sum"].fn(spark, SF).filter(
        _anchor_key("o_custkey")
    )
    ok, msg = compare_spark_duckdb(df, duck, _big_oracle("window_running_sum"))
    assert ok, msg


def test_big_arm_scd2(spark, duck):
    df = REGISTRY["scd2_customer_priority"].fn(spark, SF).filter(
        _anchor_key("custkey")
    )
    ok, msg = compare_spark_duckdb(
        df, duck, _big_oracle("scd2_customer_priority")
    )
    assert ok, msg


def test_big_arm_span_scrub(spark, duck):
    df = REGISTRY["dedup_span_scrub"].fn(spark, SF).filter(
        _anchor_doc("doc_id")
    )
    ok, msg = compare_spark_duckdb(df, duck, _big_oracle("dedup_span_scrub"))
    assert ok, msg


def test_big_arm_collocations(spark, duck):
    from mongo_iceberg_lakehouse_spark.operators import text as T
    from mongo_iceberg_lakehouse_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    df = T.bigram_lift_topk_hashed(
        d, "doc_id", "text", min_count=5, k=None
    ).filter(F.substring(F.md5(F.col("bigram")), 1, 1) == "0")
    ok, msg = compare_spark_duckdb(
        df, duck, _big_oracle("text_collocations_lift")
    )
    assert ok, msg


def test_collocations_k_none_matches_topk_head(spark):
    # the probe's k=None full table, ranked the same way, must agree with
    # the production top-k cut — the probe verifies the numbers the
    # registry query merely orders
    from mongo_iceberg_lakehouse_spark.operators import text as T
    from mongo_iceberg_lakehouse_spark.sources.tables import load_table

    d = load_table(spark, SF, "documents")
    full = T.bigram_lift_topk_hashed(d, "doc_id", "text", min_count=5, k=None)
    top = T.bigram_lift_topk_hashed(d, "doc_id", "text", min_count=5, k=5)
    head = full.orderBy(F.col("lift_micros").desc(), "bigram").limit(5)
    assert [tuple(r) for r in head.collect()] == [
        tuple(r) for r in top.collect()
    ]


def test_big_arm_bigram_perplexity(spark, duck):
    df = REGISTRY["text_bigram_perplexity"].fn(spark, SF).filter(
        _anchor_doc("doc_id")
    )
    ok, msg = compare_spark_duckdb(
        df, duck, _big_oracle("text_bigram_perplexity")
    )
    assert ok, msg


def test_small_arm_bigram_perplexity(spark, duck):
    probe = SCALE_PROBES["text_bigram_perplexity"].fn(spark, SF)
    full = REGISTRY["text_bigram_perplexity"].fn(spark, SF)
    assert probe.exceptAll(full).count() == 0
    assert full.exceptAll(probe).count() == 0
    ok, msg = compare_spark_duckdb(
        probe, duck, SCALE_PROBES["text_bigram_perplexity"].oracle
    )
    assert ok, msg
