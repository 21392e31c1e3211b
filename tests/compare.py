"""Order-insensitive DataFrame-vs-oracle comparison, mirroring the driver's
check (row count + columns sorted by name + normalized values)."""

from __future__ import annotations

import datetime as _dt
import math

_FLOAT_SIG = ".6g"  # doubles normalized to 6 significant digits


def _norm(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return format(v, _FLOAT_SIG)
    if isinstance(v, _dt.datetime):
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def normalized_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare_spark_duckdb(spark_df, duck_con, oracle_sql: str) -> tuple[bool, str]:
    srows = spark_df.collect()
    scols = spark_df.columns
    cur = duck_con.execute(oracle_sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    sn = normalized_rows(scols, [tuple(r) for r in srows])
    dn = normalized_rows(dcols, drows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
