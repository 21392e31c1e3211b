"""BPE training: the distributed merge loop must reproduce the reference
algorithm (Sennrich et al. 2016) exactly — same merges, same order, same
counts — on the real sf0.001 corpus."""

from __future__ import annotations

import duckdb

from pyspark.sql import functions as F

from mongo_iceberg_lakehouse_spark.operators import bpe

from .conftest import SF_SMOKE

END = bpe.END_OF_WORD


# the reference implementation now lives next to the operator (it also
# anchors the tokenizer_bpe_train_merges contract query)
_reference_bpe = bpe.reference_bpe


def _corpus_vocab() -> dict[str, int]:
    rows = duckdb.sql(
        f"""
        SELECT w, count(*) AS cnt FROM (
          SELECT unnest(list_filter(string_split(lower(text), ' '),
                                    t -> t <> '')) AS w
          FROM read_parquet('{SF_SMOKE}/documents.parquet'))
        GROUP BY w
        """
    ).fetchall()
    return dict(rows)


def test_bpe_train_matches_reference(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = [
        (r["rank"], r["left"], r["right"], r["pair_cnt"])
        for r in bpe.bpe_train(spark, d, n_merges=8).collect()
    ]
    want = _reference_bpe(_corpus_vocab(), n_merges=8)
    assert got == want


def test_encode_stats_matches_reference(spark):
    d = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    got = {
        r["source"]: (r["docs"], r["words"], r["subword_tokens"])
        for r in bpe.encode_token_stats(spark, d, n_merges=6).collect()
    }
    vocab = _corpus_vocab()
    merges = _reference_bpe(vocab, n_merges=6)
    syms = {w: [*w, END] for w in vocab}
    for _, a, b, _cnt in merges:
        for w in vocab:
            s, out = syms[w], []
            for x in s:
                if out and out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            syms[w] = out
    rows = duckdb.sql(
        f"""
        SELECT source, doc_id,
               list_filter(string_split(lower(text), ' '), t -> t <> '') AS ws
        FROM read_parquet('{SF_SMOKE}/documents.parquet')
        """
    ).fetchall()
    want: dict = {}
    for source, doc_id, ws in rows:
        docs, words, subs = want.setdefault(source, [set(), 0, 0])
        docs.add(doc_id)
        want[source][1] += len(ws)
        want[source][2] += sum(len(syms[w]) for w in ws)
    want = {s: (len(d_), w_, t_) for s, (d_, w_, t_) in want.items()}
    assert got == want


def test_merge_pair_greedy_nonoverlapping(spark):
    # "aaa" under merge (a, a) -> ["aa", "a"]: leftmost-first, the freshly
    # merged token does not re-pair with the next symbol in the same pass.
    row = (
        spark.range(1)
        .select(
            bpe.merge_pair(
                F.array(F.lit("a"), F.lit("a"), F.lit("a")), "a", "a"
            ).alias("m")
        )
        .collect()[0]
    )
    assert row["m"] == ["aa", "a"]
