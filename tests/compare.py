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
        # the Arrow collect path yields tz-AWARE datetimes (session tz)
        # where .collect() and DuckDB yield naive ones at the same wall
        # time — strip the tz so both render identically
        if v.tzinfo is not None:
            v = v.replace(tzinfo=None)
        return v.isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    return str(v)


def normalized_rows(columns: list[str], rows: list[tuple]) -> list[tuple[str, ...]]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def _collect_tuples(spark_df) -> list[tuple]:
    """Collect as Arrow and convert to python-native tuples: row-identical
    to .collect() for every type the registry emits (ints, floats,
    strings, dates, timestamps, arrays — struct/binary outputs don't
    exist in the registry; both paths would already disagree with
    DuckDB's fetchall rendering for those), but ~10x faster to
    materialize. The round-5 sf10 gate was compare-bound on 12-15M-row
    outputs (py4j row-by-row materialization), not engine-bound."""
    try:
        batches = spark_df._collect_as_arrow()
        import pyarrow as pa

        if not batches:
            return []
        tbl = pa.Table.from_batches(batches)
        cols = [c.to_pylist() for c in tbl.columns]
        return list(zip(*cols)) if cols else []
    except Exception:  # pragma: no cover — arrow path unavailable
        return [tuple(r) for r in spark_df.collect()]


def compare_spark_duckdb(spark_df, duck_con, oracle_sql: str) -> tuple[bool, str]:
    srows = _collect_tuples(spark_df)
    scols = spark_df.columns
    cur = duck_con.execute(oracle_sql)
    dcols = [d[0] for d in cur.description]
    drows = cur.fetchall()
    if sorted(scols) != sorted(dcols):
        return False, f"column mismatch: spark={sorted(scols)} duck={sorted(dcols)}"
    if len(srows) != len(drows):
        return False, f"row count mismatch: spark={len(srows)} duck={len(drows)}"
    sn = normalized_rows(scols, srows)
    dn = normalized_rows(dcols, drows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, "ok"
