"""Composable document-curation pipeline with per-document lineage.

The training-data shape that ties the text operators together: every raw
document flows quality-filter -> language-filter -> exact-dedup ->
near-dedup -> token-packing, and the pipeline's output is not just the kept
set but a **decision log** — one row per input document with the stage that
dropped it (or 'kept'). The lineage column is what makes a 100 TB curation
run auditable (why did doc X disappear?) and resumable (each stage's drop
set is a checkpoint).

Plan shape: stages 1-2 are narrow maps over the text (one pass computes
quality features, language votes, and the content fingerprint together — a
single projection, no repeated tokenization of the corpus); stage 3 is one
shuffle on the fingerprint; stage 4 runs MinHash-LSH only on the survivors
(the expensive stage sees the smallest input); packing shuffles only
(doc_id, n_tokens). Drop priority is fixed (quality > lang > exact > near)
so the log is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..operators.dedup import minhash_lsh_pairs
from ..operators.text import (
    DEFAULT_STOPWORDS,
    LANG_STOPWORDS,
    tokens,
)

STATUS_ORDER = ["drop_quality", "drop_lang", "drop_exact_dup", "drop_near_dup", "kept"]


def stage12_decisions(
    docs: DataFrame,
    min_tokens: int = 10,
    max_stop_ratio: float = 0.5,
    langs: tuple[str, ...] = ("en",),
) -> DataFrame:
    """(doc_id, fingerprint, early) — early is drop_quality / drop_lang /
    NULL, computed in ONE projection (tokenize once, reuse for quality,
    votes, and fingerprint)."""
    tk = tokens(F.col("text"))
    base = docs.select("doc_id", tk.alias("tk"))
    n_tok = F.size(F.col("tk"))
    stop_cnt = F.size(F.filter(F.col("tk"), lambda x: x.isin(*DEFAULT_STOPWORDS)))
    stop_ratio = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        stop_cnt.cast("double") / n_tok.cast("double")
    )
    is_q = (n_tok >= min_tokens) & (stop_ratio < max_stop_ratio)

    def _vote(words: tuple[str, ...]):
        # closure (NOT a lambda default arg — pyspark would treat it as a
        # second lambda variable)
        return F.size(F.filter(F.col("tk"), lambda x: x.isin(*words)))

    votes = {lang: _vote(words) for lang, words in LANG_STOPWORDS.items()}
    lang_names = list(LANG_STOPWORDS)
    best = F.greatest(*[votes[lang] for lang in lang_names])
    pred = F.when(best == 0, F.lit("und"))
    for lang in lang_names:
        pred = pred.when(votes[lang] == best, F.lit(lang))

    return base.select(
        "doc_id",
        F.md5(F.concat_ws(" ", F.col("tk"))).alias("fingerprint"),
        F.size(F.col("tk")).alias("n_tokens"),
        F.when(~is_q, F.lit("drop_quality"))
        .when(~pred.isin(*langs), F.lit("drop_lang"))
        .alias("early"),
    )


def stage3_exact_dedup(staged: DataFrame) -> DataFrame:
    """Adds the stage-3 decision: among early-survivors, min doc_id per
    fingerprint is kept; the rest are drop_exact_dup. One shuffle."""
    surv = staged.filter(F.col("early").isNull())
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    rk = surv.select(
        "doc_id", F.row_number().over(w).alias("__rn")
    )
    return (
        staged.join(rk, on="doc_id", how="left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce(
                F.col("early"),
                F.when(F.col("__rn") == 1, F.lit("kept")).otherwise(
                    F.lit("drop_exact_dup")
                ),
            ).alias("status"),
        )
    )


def curate_documents(
    docs: DataFrame,
    min_tokens: int = 10,
    max_stop_ratio: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    jaccard_threshold: float = 0.2,
    shingle_n: int = 2,
) -> DataFrame:
    """Full pipeline decision log: (doc_id, n_tokens, status) with status in
    STATUS_ORDER. Near-dup (stage 4) runs MinHash-LSH only on stage-3
    survivors; within a near-dup pair the smaller doc_id is kept."""
    # st12 feeds stage3's two branches (survivor window + the log join)
    # and st3 feeds two consumers (survivor pool + the final label join);
    # without cuts the tokenizer projection executes up to 4x per action
    # (PERF_NOTES §7 — the same fix as plans/webpipeline.py). Both stored
    # frames are a few slim columns per doc.
    st3 = stage3_exact_dedup(
        stage12_decisions(docs, min_tokens, max_stop_ratio, langs)
        .localCheckpoint(eager=False)
    ).localCheckpoint(eager=False)
    survivors = docs.join(
        st3.filter(F.col("status") == "kept").select("doc_id"), on="doc_id"
    )
    near_drops = (
        minhash_lsh_pairs(
            survivors, "doc_id", "text",
            shingle_n=shingle_n, jaccard_threshold=jaccard_threshold,
        )
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
        .withColumn("__near", F.lit(True))
    )
    return st3.join(near_drops, on="doc_id", how="left").select(
        "doc_id",
        "n_tokens",
        F.when(
            (F.col("status") == "kept") & F.col("__near"), F.lit("drop_near_dup")
        )
        .otherwise(F.col("status"))
        .alias("status"),
    )
