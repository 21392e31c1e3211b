"""Similarity search over embedding columns (``array<float>``).

Charter extension (SURVEY.md §2.11). Two tiers:

- ``ann_topk_bruteforce``: exact cosine top-k. The query side is broadcast
  (queries are few), so the plan is a single pass over the embeddings table —
  a BroadcastNestedLoopJoin with no shuffle of the big side except the final
  per-query top-k, which shuffles only (query_id, sim, id) triples, not
  vectors. This is the correctness baseline and is also the right plan at
  100 TB when |queries| is small.
- ``lsh_bucket_candidates`` / ``ann_topk_lsh``: random-hyperplane LSH. Each
  vector gets a b-bit signature (signs of dot products with fixed
  pseudo-random planes); candidates share a signature bucket. Bucketing turns
  the all-pairs problem into an equi-join on the bucket key — the scale path
  for neighbor search over the full corpus.

All dot products/norms run JVM-side via higher-order functions
(functions.vectors); the LSH planes are folded in as literal arrays so
signature computation also stays in codegen — no Python in the hot path.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine_similarity


def ann_topk_bruteforce(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    include_sim: bool = True,
) -> DataFrame:
    """Exact cosine top-k neighbors for each query vector.

    Deterministic: ties broken by ascending neighbor id. Self-matches (same
    id) are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__q_vec")
    )
    scored = (
        embeddings.crossJoin(F.broadcast(q))
        .filter(F.col(id_col) != F.col("query_id"))
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            cosine_similarity(vec_col, "__q_vec").alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
    cols = ["query_id", "neighbor_id", "rank"] + (["sim"] if include_sim else [])
    return out.select(*cols)


def cosine_neardup_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine similarity >= threshold.

    Brute-force form (O(n^2) candidate space) — correct baseline; use
    ``ann_topk_lsh``/bucketed variants when n is large. The join condition
    ``id_a < id_b`` halves the work and dedups symmetrically.
    """
    a = embeddings.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("__va")
    )
    b = embeddings.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("__vb")
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("sim", cosine_similarity("__va", "__vb"))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b")
    )


def _hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (Box-Muller over a simple
    LCG keyed by seed/bit/dim — stable across runs and platforms without
    numpy's RNG state)."""
    planes: list[list[float]] = []
    for b in range(bits):
        row = []
        for d in range(0, dim, 2):
            # splitmix-ish integer mix -> two uniforms -> one gaussian pair
            x = (seed * 0x9E3779B97F4A7C15 + b * 0xBF58476D1CE4E5B9 + d + 1) % (2**64)
            x ^= x >> 30
            x = (x * 0xBF58476D1CE4E5B9) % (2**64)
            x ^= x >> 27
            u1 = ((x >> 11) & ((1 << 26) - 1)) / float(1 << 26) or 1e-9
            u2 = ((x >> 37) & ((1 << 26) - 1)) / float(1 << 26)
            r = math.sqrt(-2.0 * math.log(u1))
            row.append(r * math.cos(2 * math.pi * u2))
            if d + 1 < dim:
                row.append(r * math.sin(2 * math.pi * u2))
        planes.append(row[:dim])
    return planes


def lsh_signature(vec_col: Column | str, dim: int, bits: int = 16, seed: int = 42) -> Column:
    """Random-hyperplane signature as a bit-string column (JVM-side: the
    planes are literal arrays, the dot products are zip_with/aggregate)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    vd = F.transform(v, lambda x: x.cast("double"))
    planes = _hyperplanes(dim, bits, seed)
    bit_cols = []
    for plane in planes:
        p = F.array(*[F.lit(w) for w in plane])
        d = F.aggregate(
            F.zip_with(vd, p, lambda x, y: x * y), F.lit(0.0), lambda a, x: a + x
        )
        bit_cols.append(F.when(d >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bit_cols)


def ann_topk_lsh(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    bits: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates are corpus vectors sharing the query's
    LSH bucket; exact cosine rank within candidates.

    Scale shape: bucket assignment is a narrow map; the candidate join is an
    equi-join on the signature — no cross join. Recall is tuned by ``bits``
    (fewer bits -> bigger buckets -> higher recall, more work).
    """
    sig = lambda df, idn: df.select(  # noqa: E731
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(f"__v_{idn}"),
        lsh_signature(vec_col, dim, bits).alias("__sig"),
    )
    e = sig(embeddings, "neighbor_id")
    q = sig(queries, "query_id")
    cand = e.join(F.broadcast(q), on="__sig").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity("__v_neighbor_id", "__v_query_id").alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "sim")
    )
