"""Simulate the driver's exact usage of __spark_entry__: a vanilla
SparkSession (no engine confs), fresh import, entry() smoke + spot queries.

Usage: python scripts/driver_sim.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from pyspark.sql import SparkSession  # noqa: E402


def main() -> int:
    import __spark_entry__ as E

    spark = (
        SparkSession.builder.master("local[8]").appName("driver-sim").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0 and len(df.columns) > 0
    print(f"entry: {len(rows)} rows, cols={df.columns}")

    qs, osql = E.queries(), E.oracle_sql()
    missing = [k for k in osql if k not in qs]
    assert not missing, f"oracle keys without queries: {missing}"
    print(f"queries: {len(qs)}, with oracle: {len(osql)}")

    # spot-run one of each flavor under driver conditions
    for name in ("window_dedup_latest", "streaming_window_counts",
                 "dedup_minhash_lsh", "multimodal_payload_stats"):
        n = qs[name](spark, "/root/testdata/sf0.001").count()
        print(f"{name}: {n} rows")
    spark.stop()
    print("driver-sim OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
