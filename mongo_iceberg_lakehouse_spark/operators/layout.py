"""Multi-dimensional data layout clustering (Z-order), min/max-stat aware.

Why this exists: at 100 TB the dominant cost of a selective query is how many
parquet row groups the scan can SKIP via footer min/max statistics. A table
sorted on one column prunes perfectly on that column and not at all on any
other; Z-ordering interleaves the bits of several columns' ranks into one
sort key, so row groups become tight hyper-rectangles in all clustered
dimensions at once — the same layout trick Delta OPTIMIZE ZORDER BY and
Iceberg's sort-order rewrite apply (public feature; implemented here from
first principles with Spark expressions only).

Everything is JVM-side: the per-column [min, max] bounds are one tiny agg
(collected once, folded in as literals), the bit interleave is a Python-built
expression tree of shifts/masks (codegen'd, no UDF), and the physical
clustering is ``repartitionByRange`` on the key + ``sortWithinPartitions`` —
range partitioning gives non-overlapping key ranges per output file, which is
what makes the footer stats tight.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _scaled_rank(col: Column, lo: float, hi: float, bits: int) -> Column:
    """Map a numeric column into [0, 2^bits) by min/max normalization.
    Degenerate (constant) columns map to 0."""
    if hi <= lo:
        return F.lit(0).cast("long")
    span = float(hi - lo)
    top = (1 << bits) - 1
    return F.least(
        F.lit(top).cast("long"),
        F.greatest(
            F.lit(0).cast("long"),
            ((col.cast("double") - F.lit(float(lo))) / F.lit(span) * top).cast(
                "long"
            ),
        ),
    )


def zorder_key(
    scaled: Sequence[Column], bits: int = 16
) -> Column:
    """Interleave the low ``bits`` bits of each pre-scaled column into one
    long Morton key: output bit (i*ncols + j) = bit i of column j. Built as a
    plain expression sum (shift/mask per bit — Python ints for the shift
    amounts, per Spark's shiftright signature), so the whole key stays inside
    whole-stage codegen."""
    ncols = len(scaled)
    parts = []
    for j, c in enumerate(scaled):
        for i in range(bits):
            src = F.shiftright(c, i).bitwiseAND(F.lit(1))
            parts.append(F.shiftleft(src, i * ncols + j))
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def with_zorder_key(
    df: DataFrame,
    cols: Sequence[str],
    bits: int = 16,
    key_col: str = "__zkey",
) -> DataFrame:
    """Attach the Morton key for ``cols``. Bounds come from one global
    min/max agg (a cheap metadata-ish scan; on parquet the min/max can come
    from footer stats)."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__lo_{c}"), F.max(c).alias(f"__hi_{c}")]
    b = df.agg(*aggs).collect()[0]
    scaled = [
        _scaled_rank(
            F.col(c), float(b[f"__lo_{c}"]), float(b[f"__hi_{c}"]), bits
        )
        for c in cols
    ]
    return df.withColumn(key_col, zorder_key(scaled, bits))


def cluster_by_zorder(
    df: DataFrame,
    cols: Sequence[str],
    num_files: int,
    path: str,
    bits: int = 16,
) -> None:
    """Write ``df`` as ``num_files`` parquet files clustered on the Z-key:
    range-repartition (non-overlapping key ranges per file) + sort within.
    The key column itself is dropped from the output — it's layout, not
    data."""
    keyed = with_zorder_key(df, cols, bits)
    (
        keyed.repartitionByRange(num_files, F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def rowgroups_overlapping(
    path: str, predicates: dict[str, tuple[float, float]]
) -> tuple[int, int]:
    """(overlapping, total) parquet row groups whose footer min/max stats
    intersect every [lo, hi] predicate — i.e. the row groups a stats-pruning
    scan must actually read. Pure pyarrow footer inspection; no data pages
    are touched, exactly like a real scan planner."""
    import pyarrow.parquet as pq

    total = 0
    hit = 0
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        names = {c: i for i, c in enumerate(frag.physical_schema.names)}
        for rg in range(md.num_row_groups):
            total += 1
            ok = True
            for col, (lo, hi) in predicates.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue  # unknown stats => cannot prune
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            hit += ok
    return hit, total


def rowgroups_box_rows(
    path: str, predicates: dict[str, tuple[float, float]]
) -> int:
    """Rows satisfying every [lo, hi] predicate when scanning ONLY the
    row groups whose footer stats overlap the box — i.e. what a
    stats-pruning scan actually returns. Comparing this against the
    full-scan count proves the pruning has no false negatives (a wrong
    min/max comparison would silently drop rows; the contract query
    turns that into a hashed boolean)."""
    import pyarrow.parquet as pq

    n = 0
    ds = pq.ParquetDataset(path)
    for frag in ds.fragments:
        md = frag.metadata
        names = {c: i for i, c in enumerate(frag.physical_schema.names)}
        pf = pq.ParquetFile(frag.path)
        for rg in range(md.num_row_groups):
            ok = True
            for col, (lo, hi) in predicates.items():
                st = md.row_group(rg).column(names[col]).statistics
                if st is None or not st.has_min_max:
                    continue
                if st.min > hi or st.max < lo:
                    ok = False
                    break
            if not ok:
                continue
            t = pf.read_row_group(rg, columns=list(predicates))
            mask = None
            for col, (lo, hi) in predicates.items():
                arr = t[col].to_numpy()
                m = (arr >= lo) & (arr <= hi)
                mask = m if mask is None else (mask & m)
            n += int(mask.sum())
    return n
