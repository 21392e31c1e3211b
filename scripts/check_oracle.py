"""Mirror of the driver's correctness gate: run every REGISTRY query against
its DuckDB oracle at a given scale factor and report matches.

Usage: python scripts/check_oracle.py [sf_dir] [name1,name2,...]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402
from mongo_iceberg_lakehouse_spark.session import get_spark  # noqa: E402
from mongo_iceberg_lakehouse_spark.sources.tables import FIXTURE_TABLES  # noqa: E402
from tests.compare import compare_spark_duckdb  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    if only and (missing := only - set(REGISTRY)):
        raise SystemExit(f"unknown queries: {sorted(missing)}")
    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = 0
    names = sorted(only) if only else sorted(REGISTRY)
    for name in names:
        q = REGISTRY[name]
        t0 = time.time()
        try:
            df = q.fn(spark, sf_dir)
            if q.oracle is None:
                n = df.count()
                print(f"ROWS-ONLY {name}: {n} rows [{time.time()-t0:.1f}s]", flush=True)
                continue
            ok, msg = compare_spark_duckdb(df, con, q.oracle)
            status = "OK" if ok else "MISMATCH"
            if not ok:
                failures += 1
            print(f"{status} {name}: {msg} [{time.time()-t0:.1f}s]", flush=True)
        except Exception as exc:  # noqa: BLE001
            failures += 1
            print(f"ERROR {name}: {str(exc)[:300]} [{time.time()-t0:.1f}s]", flush=True)
    print(f"\n{failures} failures / {len(names)} queries at {sf_dir}")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
