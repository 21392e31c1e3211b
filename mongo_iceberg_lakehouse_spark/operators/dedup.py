"""Deduplication operators: exact, window-ranked, and near-duplicate.

The reference's only dedup is window-ranked keep-first by business key
(.ipynb_checkpoints/iceberg_bronze_to_silver-checkpoint.py:134-141) with a
degenerate ``orderBy(partition_key)`` — ties broken arbitrarily (SURVEY.md
§2.5). ``window_dedup`` generalizes it with an explicit, deterministic
tiebreaker, which is what a reproducible pipeline needs.

Near-duplicate operators (MinHash-LSH, SimHash, n-gram Jaccard) target the
LLM-data-pipeline charter. All of them are built from JVM-side higher-order
functions + shuffles on bounded keys:

- MinHash-LSH: shingle -> per-seed min of xxhash64 -> band -> bucket-join.
  The candidate join is an equi-join on (band_id, band_hash), so at 100 TB it
  is an ordinary shuffle join on a high-cardinality key — no cross join ever
  materializes. Band count trades recall vs candidate volume.
- SimHash: 64-bit signature via sign-aggregated token-hash bits; candidates
  via banded signature chunks (hamming-adjacent docs collide on some chunk).
- Exact: groupBy on content (or sha2(content)) keeping the minimum id —
  deterministic, map-side-combinable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def window_dedup(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Keep exactly one row per ``keys``, the first under ``order_by``.

    Generalizes reference W1 (row_number over partitionBy(key) -> rn == 1 ->
    drop rn) with a caller-supplied deterministic ordering.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(
    df: DataFrame,
    content_cols: Sequence[str],
    id_col: str | None = None,
) -> DataFrame:
    """Exact dedup on ``content_cols``.

    Without ``id_col``: distributed ``dropDuplicates`` (nondeterministic
    survivor, cheapest). With ``id_col``: deterministic keep-min-id via
    window, returning all original columns.
    """
    if id_col is None:
        return df.dropDuplicates(list(content_cols))
    return window_dedup(df, content_cols, [F.col(id_col).asc()])


def shingles(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token array, JVM-side.

    sequence(0, size-n) -> transform(i -> concat_ws(' ', slice(tokens, i+1, n)))
    """
    count = F.greatest(F.size(tokens) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    return F.when(count == 0, F.array()).otherwise(
        F.array_distinct(
            F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))
        )
    )


def _tokenize(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), r"\s+"), lambda t: t != "")


def minhash_signature(sh: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: per seed i, min over shingles of xxhash64(shingle, i).

    All JVM built-ins — one transform over seeds of an array_min over a
    transform over shingles. Empty shingle sets get a sentinel signature.
    """
    seeds = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.transform(
        seeds,
        lambda i: F.coalesce(
            F.array_min(F.transform(sh, lambda s: F.xxhash64(s, i))),
            F.lit(2**63 - 1),
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs (id_a < id_b, exact shingle-Jaccard >= threshold).

    Plan shape (scale-first): signature computation is a narrow map; candidate
    generation explodes ``bands`` rows per doc and equi-joins on
    (band, band_hash) — a shuffle join on a well-distributed key; the final
    exact-Jaccard verification runs only on candidates via
    array_intersect/array_union sizes. No cross join at any stage.
    """
    rows_per_band = num_hashes // bands
    base = df.select(
        F.col(id_col).alias("id"),
        shingles(_tokenize(F.col(text_col)), shingle_n).alias("sh"),
    ).withColumn("sig", minhash_signature(F.col("sh"), num_hashes))

    band_idx = F.sequence(F.lit(0), F.lit(bands - 1))
    banded = base.select(
        "id",
        "sh",
        F.explode(
            F.transform(
                band_idx,
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.concat_ws(
                            ",",
                            F.transform(
                                F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band),
                                lambda v: v.cast("string"),
                            ),
                        )
                    ).alias("bh"),
                ),
            )
        ).alias("bk"),
    ).select("id", "sh", F.col("bk.band").alias("band"), F.col("bk.bh").alias("bh"))

    left = banded.alias("a")
    right = banded.alias("b")
    cand = (
        left.join(
            right,
            on=[
                F.col("a.band") == F.col("b.band"),
                F.col("a.bh") == F.col("b.bh"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sh").alias("sh_a"),
            F.col("b.sh").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )

    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(union == 0, F.lit(0.0)).otherwise(inter.cast("double") / union)
    return (
        cand.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_signature(text: Column, bits: int = 64) -> Column:
    """SimHash: sum per-bit +/-1 contributions of token hashes, take signs.

    Expressed with JVM higher-order functions: for each bit position, count
    tokens whose hash has that bit set vs unset. Returns array<int> of 0/1 of
    length ``bits`` (sign vector), cheap to band for candidate search.
    """
    tokens = _tokenize(text)
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def bit_sign(b: int) -> Column:
        # b is a Python int (shiftright needs a literal shift amount)
        ones = F.size(
            F.filter(hashes, lambda h: F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1)
        )
        zeros = F.size(hashes) - ones
        return F.when(ones >= zeros, F.lit(1)).otherwise(F.lit(0))

    return F.array(*[bit_sign(b) for b in range(bits)])


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 64,
    chunks: int = 8,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the signature into ``chunks`` pieces,
    candidates collide on >=1 piece (guaranteed to catch hamming distance
    < chunks), then verify exact hamming distance <= max_hamming."""
    base = df.select(
        F.col(id_col).alias("id"),
        simhash_signature(F.col(text_col), bits).alias("sig"),
    )
    per = bits // chunks
    chunk_idx = F.sequence(F.lit(0), F.lit(chunks - 1))
    banded = base.select(
        "id",
        "sig",
        F.explode(
            F.transform(
                chunk_idx,
                lambda c: F.struct(
                    c.alias("chunk"),
                    F.concat_ws(
                        ",",
                        F.transform(
                            F.slice(F.col("sig"), c * per + 1, per),
                            lambda v: v.cast("string"),
                        ),
                    ).alias("ch"),
                ),
            )
        ).alias("ck"),
    ).select("id", "sig", F.col("ck.chunk").alias("chunk"), F.col("ck.ch").alias("ch"))

    cand = (
        banded.alias("a")
        .join(
            banded.alias("b"),
            on=[
                F.col("a.chunk") == F.col("b.chunk"),
                F.col("a.ch") == F.col("b.ch"),
                F.col("a.id") < F.col("b.id"),
            ],
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    hamming = F.aggregate(
        F.zip_with("sig_a", "sig_b", lambda x, y: F.when(x != y, 1).otherwise(0)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    jaccard_threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 32,
) -> DataFrame:
    """Exact n-gram Jaccard pairs, using aggressive LSH banding (high recall)
    for candidate generation then exact verification — the scalable form of
    the all-pairs n-gram Jaccard join."""
    return minhash_lsh_pairs(
        df,
        id_col,
        text_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_n=shingle_n,
        jaccard_threshold=jaccard_threshold,
    )
