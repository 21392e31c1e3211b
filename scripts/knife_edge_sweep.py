"""Sweep every DuckDB oracle for knife-edge floats.

The round-2 attribution_linear flake class: a query's true value sits ON a
.6g rounding boundary (e.g. 1091.165 rendered at 6 significant digits), so
Spark's partial-agg combine order and DuckDB's scan order land on opposite
sides and the hash compare flips run-to-run. Waiting for the flake is
probabilistic; this detector is deterministic: a float is knife-edge iff
nudging it by +/-1e-9 RELATIVE changes its .6g rendering. Legitimate
on-grid values (round(x, 2) results etc.) are ~5e-7 relative away from the
nearest boundary and never flag; float-sum noise is ~1e-12 relative, far
inside the 1e-9 net.

Usage: python scripts/knife_edge_sweep.py [sf_dir ...]
Prints one line per flagged (query, column, value) and a summary; exit 1 if
anything flagged.
"""

from __future__ import annotations

import sys

import duckdb

sys.path.insert(0, "/root/repo")

from mongo_iceberg_lakehouse_spark.queries import REGISTRY  # noqa: E402
from mongo_iceberg_lakehouse_spark.sources.tables import FIXTURE_TABLES  # noqa: E402

REL_EPS = 1e-9
FLOAT_SIG = ".6g"


def knife_edge(v: float) -> bool:
    if v != v or v in (float("inf"), float("-inf")):
        return False
    base = format(v, FLOAT_SIG)
    hi = format(v * (1 + REL_EPS), FLOAT_SIG)
    lo = format(v * (1 - REL_EPS), FLOAT_SIG)
    return base != hi or base != lo


def sweep(sf_dir: str) -> list[tuple[str, str, float]]:
    con = duckdb.connect()
    for t in FIXTURE_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    flagged = []
    for name, q in sorted(REGISTRY.items()):
        if q.oracle is None:
            continue
        try:
            cur = con.execute(q.oracle)
            cols = [d[0] for d in cur.description]
            rows = cur.fetchall()
        except Exception as e:  # oracle itself broken -> surface loudly
            flagged.append((name, f"<oracle error: {e}>", float("nan")))
            continue
        for r in rows:
            for c, v in zip(cols, r):
                if isinstance(v, float) and knife_edge(v):
                    flagged.append((name, c, v))
    con.close()
    return flagged


def main() -> int:
    dirs = sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
    bad = 0
    for d in dirs:
        flagged = sweep(d)
        for name, col, v in flagged:
            print(f"KNIFE_EDGE {d} {name} {col} {v!r} -> {format(v, FLOAT_SIG)}")
        bad += len(flagged)
        print(f"# {d}: {len(flagged)} knife-edge values")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
