"""Order-dependence stress for knife-edge float outputs.

scripts/knife_edge_sweep.py flags every oracle value sitting within 1e-9
relative of a .6g rendering boundary — but a boundary value is only a
correctness risk if it is ALSO order-dependent: a raw parquet passthrough
or an exact-integer sum is bit-identical in Spark and DuckDB, so both
engines render the same string every run. This script closes the loop:

for each candidate query, run the Spark side under two different
spark.sql.shuffle.partitions settings (different partial-agg combine
orders) plus the DuckDB oracle, align rows via the .6g-normalized sort,
and compare the FULL-precision (.17g) renderings position by position.

verdict per query:
  SAFE      — all three runs bit-identical (.17g equal everywhere);
  RISK      — some knife-edge value differs at .17g across runs: the .6g
              rendering can flip with combine order -> fix the query
              (quantize to an integer grid or make the sum exact);
  BROKEN    — the .6g normalized outputs already disagree.

Usage: python scripts/float_stress.py [sf_dir] [query ...]
Defaults: sf0.01 and every oracle query that prints a knife-edge value.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402
from mongo_iceberg_lakehouse_spark.sources.tables import FIXTURE_TABLES  # noqa: E402
from scripts.knife_edge_sweep import knife_edge  # noqa: E402

PARTITIONINGS = (3, 8, 32)


def _norm_pair(columns, rows):
    """Rows sorted by their .6g normalization, carrying .17g alongside."""
    import datetime as _dt
    import math

    def n6(v):
        if v is None:
            return "NULL"
        if isinstance(v, float):
            return "NULL" if math.isnan(v) else format(v, ".6g")
        if isinstance(v, (_dt.datetime, _dt.date)):
            return v.isoformat()
        return str(v)

    def n17(v):
        if isinstance(v, float) and not math.isnan(v):
            return format(v, ".17g")
        return n6(v)

    order = sorted(range(len(columns)), key=lambda i: columns[i])
    paired = sorted(
        (tuple(n6(r[i]) for i in order), tuple(n17(r[i]) for i in order))
        for r in rows
    )
    return [p[0] for p in paired], [p[1] for p in paired]


def stress(spark, con, name: str):
    q = REGISTRY[name]
    runs = []
    for p in PARTITIONINGS:
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
        try:
            df = q.fn(spark, SF_DIR)
            runs.append((df.columns, [tuple(r) for r in df.collect()]))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    cur = con.execute(q.oracle)
    runs.append(([d[0] for d in cur.description], cur.fetchall()))

    normed = [_norm_pair(c, r) for c, r in runs]
    base6 = normed[0][0]
    if any(n6 != base6 for n6, _ in normed[1:]):
        return "BROKEN", "normalized (.6g) outputs disagree across runs"
    # rows aligned: compare full precision per position
    risky = []
    for pos, row6 in enumerate(base6):
        row17s = [n17[pos] for _, n17 in normed]
        for ci, cell6 in enumerate(row6):
            cells17 = {r17[ci] for r17 in row17s}
            if len(cells17) > 1:
                try:
                    v = float(cell6)
                except ValueError:
                    continue
                if knife_edge(v):
                    risky.append((pos, ci, cell6, sorted(cells17)))
    if risky:
        return "RISK", f"{len(risky)} knife-edge cells vary bitwise: {risky[:3]}"
    return "SAFE", "all runs bit-identical or off-boundary"


def main() -> int:
    global SF_DIR
    args = sys.argv[1:]
    SF_DIR = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a]
    if not names:
        from scripts.knife_edge_sweep import sweep

        names = sorted(
            {n for n, _, _ in sweep(SF_DIR) if not n.startswith("<")}
        )
    from mongo_iceberg_lakehouse_spark.session import get_spark

    spark = get_spark(app_name="float-stress", master="local[8]")
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    n_risk = 0
    for name in names:
        verdict, msg = stress(spark, con, name)
        print(f"STRESS {name}: {verdict} — {msg}")
        n_risk += verdict != "SAFE"
    print(f"# {len(names)} queries stressed, {n_risk} at risk")
    return 1 if n_risk else 0


if __name__ == "__main__":
    raise SystemExit(main())
