"""Standalone fresh-JVM min-of-N A/B for bench movers (PERF_NOTES §12
discipline): run each named query in ITS OWN SparkSession-per-process-free
context — one warm-up + N timed reps, checkpoint blocks dropped between
queries — alongside the tpch_q1 anchor so cross-session host drift can be
normalized out before calling anything a regression.

Usage: python scripts/ab_standalone.py [--sf-dir D] [--reps N] q1,q2,...
Prints one JSON line: {"anchor_sec": ..., "drift": ..., "queries": {...}}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from bench import ANCHOR, ANCHOR_BASELINE_SEC, _drop_checkpoint_blocks  # noqa: E402
from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402
from mongo_iceberg_lakehouse_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.1"
    reps = 3
    if "--sf-dir" in args:
        i = args.index("--sf-dir")
        sf_dir = args[i + 1]
        del args[i:i + 2]
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    names = [ANCHOR] + [n for n in args[0].split(",") if n != ANCHOR]

    spark = get_spark(app_name="lakehouse-ab")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}
    for name in names:
        fn = REGISTRY[name].fn
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()  # warm
        _drop_checkpoint_blocks(spark)
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            best = min(best, time.perf_counter() - t0)
        _drop_checkpoint_blocks(spark)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
    anchor_sec = timings.pop(ANCHOR)
    drift = round(anchor_sec / ANCHOR_BASELINE_SEC, 3)
    print(
        json.dumps(
            {
                "anchor_sec": anchor_sec,
                "drift": drift,
                "sf_dir": sf_dir,
                "reps": reps,
                "queries": timings,
                "normalized": {
                    n: round(v / drift, 3) for n, v in timings.items()
                },
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
