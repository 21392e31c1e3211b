"""Round-count scaling proof for the iterative graph loops (VERDICT r10
item 6): with the r10 pre-partitioned persisted edge cache, per-round cost
must be ~flat — doubling LPA's rounds should ~double only the loop term,
and CC's measured per-round times should not grow with round index.

- LPA: the sf1 handoff graph (same edge construction as the registry
  query), iterations=4 vs iterations=8, interleaved min-of-N in ONE
  session. Reported: t4, t8, per-round slope (t8-t4)/4.
- CC: per-round wall times from a timing wrapper around the same loop
  body the operator runs (the operator's own loop does one collect per
  round, so round boundaries are directly timeable via a subclassed run).

Usage: python scripts/r11_graph_rounds.py [sf_dir] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import _drop_checkpoint_blocks  # noqa: E402
from mongo_iceberg_lakehouse_spark.operators.graph import (  # noqa: E402
    label_propagation,
)
from mongo_iceberg_lakehouse_spark.session import get_spark  # noqa: E402
from mongo_iceberg_lakehouse_spark.sources.tables import load_table  # noqa: E402


def handoff_edges(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    j = o.join(c, o["o_custkey"] == c["c_custkey"]).select(
        "o_orderkey", "o_orderdate", "o_custkey", "c_nationkey", "c_mktsegment"
    )
    w_nat = Window.partitionBy("c_nationkey").orderBy("o_orderdate", "o_orderkey")
    w_seg = Window.partitionBy("c_mktsegment").orderBy("o_orderdate", "o_orderkey")
    return (
        j.select(
            F.lag("o_custkey").over(w_nat).alias("src"),
            F.col("o_custkey").alias("dst"),
        )
        .unionByName(
            j.select(
                F.lag("o_custkey").over(w_seg).alias("src"),
                F.col("o_custkey").alias("dst"),
            )
        )
        .where(F.col("src").isNotNull())
    )


def cc_round_times(spark, edges, max_iter: int = 30) -> list[float]:
    """connected_components with per-round wall timing — IDENTICAL loop
    body to operators/graph.py::connected_components (kept in lockstep
    manually; this is a measurement harness, not a second implementation
    for production use)."""
    from mongo_iceberg_lakehouse_spark.operators.graph import _symmetric_edges

    sym = _symmetric_edges(edges, part_key="dst")
    sym.count()
    p = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.min("dst").alias("mn"))
        .select("node", F.least("node", "mn").alias("component"))
    )
    times: list[float] = []
    prev_sum = None
    for _ in range(max_iter):
        t0 = time.perf_counter()
        jump = (
            p.alias("a")
            .join(p.alias("b"), F.col("a.component") == F.col("b.node"))
            .select(
                F.col("a.node").alias("node"), F.col("b.component").alias("cand")
            )
        )
        via_nbr = (
            sym.alias("e")
            .join(p.alias("q"), F.col("e.dst") == F.col("q.node"))
            .select(
                F.col("e.src").alias("node"), F.col("q.component").alias("cand")
            )
        )
        p = (
            p.select("node", F.col("component").alias("cand"))
            .unionByName(jump)
            .unionByName(via_nbr)
            .groupBy("node")
            .agg(F.min("cand").alias("component"))
            .localCheckpoint(eager=False)
        )
        s = p.agg(F.sum("component")).collect()[0][0]
        times.append(round(time.perf_counter() - t0, 3))
        if s == prev_sum:
            break
        prev_sum = s
    sym.unpersist()
    return times


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scale/sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = get_spark(app_name="r11-graph-rounds")
    spark.sparkContext.setLogLevel("ERROR")

    lpa: dict[int, float] = {}
    for _ in range(reps):
        for iters in (4, 8):
            edges = handoff_edges(spark, sf_dir)
            t0 = time.perf_counter()
            label_propagation(edges, iterations=iters, checkpoint_every=2)\
                .write.mode("overwrite").format("noop").save()
            dt = round(time.perf_counter() - t0, 3)
            lpa[iters] = min(lpa.get(iters, float("inf")), dt)
            _drop_checkpoint_blocks(spark)
            print(f"# LPA iters={iters}: {dt}s", file=sys.stderr, flush=True)

    edges = handoff_edges(spark, sf_dir)
    cc = cc_round_times(spark, edges)
    _drop_checkpoint_blocks(spark)

    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "lpa_t4": lpa[4],
                "lpa_t8": lpa[8],
                "lpa_per_round_slope": round((lpa[8] - lpa[4]) / 4, 3),
                "lpa_fixed_cost_est": round(lpa[4] - 4 * (lpa[8] - lpa[4]) / 4, 3),
                "cc_round_times": cc,
                "cc_rounds": len(cc),
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
