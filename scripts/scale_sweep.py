"""Execute EVERY registered query at a larger scale factor (default sf0.1,
10x the correctness-gate scale) — engine side only, no oracles.

The correctness gate proves semantics at sf0.01; this sweep proves every
plan still EXECUTES one decade up (no OOM, no worker crash, no
plan-scale-dependent bug — it caught a cogroup Arrow batch losing a column
that only manifested at sf0.1 partition counts).

Usage: python scripts/scale_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402
from mongo_iceberg_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-sweep")
    fails = 0
    for name in sorted(REGISTRY):
        t0 = time.time()
        try:
            n = REGISTRY[name].fn(spark, sf_dir).count()
            print(f"OK {name}: {n} rows [{time.time()-t0:.1f}s]", flush=True)
        except Exception as exc:  # noqa: BLE001
            fails += 1
            print(f"FAIL {name}: {str(exc)[:300]}", flush=True)
    print(f"\n{fails} failures / {len(REGISTRY)} queries at {sf_dir}")
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
