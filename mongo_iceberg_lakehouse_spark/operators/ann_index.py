"""Persistable ANN index artifacts + strategy auto-dispatch (round-5
verdict item 2).

A real 100 TB retrieval pipeline trains its quantizers ONCE and reuses
them incrementally — re-fitting k-means / PQ codebooks inside every query
both wastes the training cost and breaks result stability across runs
(Lloyd iterations are partitioning-dependent). This module makes the
trained artifacts first-class catalog state:

- centroid matrices and PQ codebooks persist as versioned snapshot tables
  (``sources/snapshots.py`` — the same manifest-commit protocol the
  lakehouse tables use, so retraining is snapshot-replace: writers commit
  a new version, readers keep resolving the latest or pin one);
- artifacts are BOUNDED (n_centroids ~ sqrt(n) rows; m*k rows for PQ), so
  the load is a driver collect of a few hundred rows regardless of corpus
  size, and doubles round-trip parquet EXACTLY — a loaded quantizer
  reproduces the in-memory one's results bit-for-bit (the
  ``ann_ivf_pretrained`` query's oracle pins that equivalence);
- ``ann_topk(strategy="auto")`` dispatches brute / int8 / IVF / PQ from
  the corpus-size statistic (``sources.tables.table_rowcount`` — no count
  job) and a stated recall target, so callers write ONE call site and the
  engine picks the plan that survives the next scale decade.

Reference scope note: the reference engine (Deekshitha257/
mongo-iceberg-lakehouse) has no vector surface at all; this extends the
LLM-pipeline charter (SURVEY.md §2.11) with the artifact/versioning
discipline its lakehouse side (Iceberg snapshot-replace) applies to data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.snapshots import read_snapshot, write_snapshot

# ---------------------------------------------------------------------------
# Artifact persistence (versioned snapshot tables)
# ---------------------------------------------------------------------------


def save_centroids(
    spark: SparkSession,
    base: str,
    table: str,
    centroids: list[list[float]],
) -> int:
    """Persist a centroid matrix as the next snapshot version of
    ``table`` under ``base``; returns the committed version. Rows are
    (centroid_id, centroid) with float64 components — parquet stores
    doubles losslessly, so load_centroids reproduces the exact matrix."""
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    df = spark.createDataFrame(
        rows, "centroid_id int, centroid array<double>"
    )
    # one bounded artifact -> one file: keeps the manifest/data dir tiny
    return write_snapshot(df.coalesce(1), base, table)


def load_centroids(
    spark: SparkSession,
    base: str,
    table: str,
    version: int | None = None,
) -> list[list[float]]:
    """Load a persisted centroid matrix (latest version by default).
    Bounded collect: n_centroids rows."""
    rows = (
        read_snapshot(spark, base, table, version=version)
        .orderBy("centroid_id")
        .collect()
    )
    return [[float(x) for x in r["centroid"]] for r in rows]


def save_pq_codebooks(
    spark: SparkSession,
    base: str,
    table: str,
    codebooks: list[list[list[float]]],
) -> int:
    """Persist PQ codebooks (m subspaces x k centroids) as the next
    snapshot version; rows are (subspace, centroid_id, centroid)."""
    rows = [
        (s, i, [float(x) for x in c])
        for s, book in enumerate(codebooks)
        for i, c in enumerate(book)
    ]
    df = spark.createDataFrame(
        rows, "subspace int, centroid_id int, centroid array<double>"
    )
    return write_snapshot(df.coalesce(1), base, table)


def load_pq_codebooks(
    spark: SparkSession,
    base: str,
    table: str,
    version: int | None = None,
) -> list[list[list[float]]]:
    """Load persisted PQ codebooks (latest version by default). Bounded
    collect: m*k rows."""
    rows = (
        read_snapshot(spark, base, table, version=version)
        .orderBy("subspace", "centroid_id")
        .collect()
    )
    books: dict[int, list[list[float]]] = {}
    for r in rows:
        books.setdefault(r["subspace"], []).append(
            [float(x) for x in r["centroid"]]
        )
    return [books[s] for s in sorted(books)]


# ---------------------------------------------------------------------------
# Strategy auto-dispatch
# ---------------------------------------------------------------------------

# Size thresholds (corpus rows). Rationale, 64-dim float vectors:
# - <= BRUTE_MAX: the whole-corpus exact scan is one narrow map of
#   n * n_queries codegen'd dot products — cheaper than any index build.
# - <= INT8_MAX: still exact (two-stage int8 candidates + float rerank),
#   but stage 1 reads 4x-compressed codes, the difference between an
#   in-cache scan and a spilling one.
# - <= IVF_MAX: exact scans now touch every vector per query; IVF probes
#   n_probe/sqrt(n/2) of the corpus instead (n^0.5 per query).
# - above: PQ-ADC — candidate state is 8 bytes/vector, the only
#   representation that keeps a >10M-vector scan memory-resident.
BRUTE_MAX = 1 << 17  # 131_072
INT8_MAX = 1 << 21  # 2_097_152
IVF_MAX = 1 << 24  # 16_777_216

# recall targets at or above this force an exact strategy
EXACT_RECALL = 0.999


def choose_ann_strategy(n: int, recall_target: float | None = None) -> str:
    """Pick the top-k strategy for a corpus of ``n`` vectors and an
    optional recall target (None = exact preferred, approximate allowed
    past the exact tiers). Pure function — unit-pinned thresholds."""
    if recall_target is not None and recall_target >= EXACT_RECALL:
        return "brute" if n <= BRUTE_MAX else "int8"
    if n <= BRUTE_MAX:
        return "brute"
    if n <= INT8_MAX:
        return "int8"
    if n <= IVF_MAX:
        return "ivf"
    return "pq"


def ann_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    strategy: str = "auto",
    recall_target: float | None = None,
    n_rows: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    codebooks: list[list[list[float]]] | None = None,
) -> DataFrame:
    """One call site for approximate/exact top-k: dispatches to the
    brute / int8 / IVF / PQ implementations.

    ``strategy="auto"`` picks via ``choose_ann_strategy`` from the corpus
    size (``n_rows`` — pass the table statistic to avoid a count job) and
    ``recall_target``. Pretrained artifacts (``centroids`` for IVF,
    ``codebooks`` for PQ — e.g. from ``load_centroids`` /
    ``load_pq_codebooks``) are used when given; otherwise the strategy's
    own deterministic sampling trains inline.

    Output schema is uniform: (query_id, neighbor_id, rank).
    """
    from . import similarity as S

    if strategy == "auto":
        n = n_rows if n_rows is not None else embeddings.count()
        strategy = choose_ann_strategy(n, recall_target)
    common = dict(id_col=id_col, vec_col=vec_col)
    if strategy == "brute":
        out = S.ann_topk_bruteforce(
            embeddings, queries, k=k, include_sim=False, **common
        )
    elif strategy == "blocked":
        out = S.ann_topk_blocked(embeddings, queries, k=k, **common)
    elif strategy == "int8":
        out = S.ann_topk_int8(embeddings, queries, k=k, **common)
    elif strategy == "ivf":
        out = S.ann_topk_ivf(
            embeddings, queries, k=k, centroids=centroids, **common
        )
    elif strategy == "pq":
        out = S.ann_topk_pq(
            embeddings, queries, k=k, codebooks=codebooks, **common
        )
    elif strategy == "lsh":
        out = S.ann_topk_lsh(embeddings, queries, k=k, **common)
    else:
        raise ValueError(
            f"unknown ANN strategy {strategy!r}; expected auto/brute/"
            "blocked/int8/ivf/pq/lsh"
        )
    return out.select("query_id", "neighbor_id", "rank")
