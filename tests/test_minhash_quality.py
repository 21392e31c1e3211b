"""MinHash-LSH quality harness: recall/precision against exact Jaccard
ground truth on a controlled-overlap corpus.

Corpus construction: pairs of documents sharing a controlled fraction of
their token stream, spanning the Jaccard spectrum from ~0.05 to 1.0, plus
unrelated filler. Ground truth is exact bigram-shingle Jaccard computed in
plain Python with the same tokenization.

Asserted properties (64 hashes, 16 bands of 4):
- precision is exact: every reported pair's Jaccard matches ground truth
  (the operator verifies candidates exactly, so false positives are
  impossible by construction);
- recall >= 0.9 for pairs comfortably above threshold (j >= 0.5 at
  threshold 0.3) — the S-curve for r=4, b=16 gives P(candidate) ~= 1-(1-j^4)^16,
  i.e. ~0.65 at j=0.5 per band-set... measured empirically instead of
  asserted from theory; the planted near-identical pairs (j >= 0.8) must all
  be found (P > 0.999).
"""

from __future__ import annotations

import pytest

from mongo_iceberg_lakehouse_spark.operators.dedup import minhash_lsh_pairs


def _doc_tokens(seed: int, n: int = 60, vocab: int = 400) -> list[str]:
    x = seed * 2654435761 % (2**32)
    out = []
    for _ in range(n):
        x = (x * 1103515245 + 12345) % (2**31)
        out.append(f"w{x % vocab}")
    return out


def _mutate(tokens: list[str], frac: float, seed: int) -> list[str]:
    out = list(tokens)
    x = seed * 40503 % (2**31)
    n_mut = int(len(tokens) * frac)
    for i in range(n_mut):
        x = (x * 1103515245 + 12345) % (2**31)
        out[x % len(out)] = f"m{x % 1000}"
    return out


def _bigram_jaccard(a: list[str], b: list[str]) -> float:
    sa = {(a[i], a[i + 1]) for i in range(len(a) - 1)}
    sb = {(b[i], b[i + 1]) for i in range(len(b) - 1)}
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


@pytest.fixture(scope="module")
def corpus():
    docs = {}
    fracs = [0.0, 0.02, 0.05, 0.1, 0.2, 0.3, 0.5, 0.8]
    did = 0
    pair_ids = []
    for i, frac in enumerate(fracs * 4):  # 32 controlled pairs
        base = _doc_tokens(seed=1000 + i)
        docs[did] = base
        docs[did + 1] = _mutate(base, frac, seed=i)
        pair_ids.append((did, did + 1))
        did += 2
    for j in range(40):  # unrelated filler
        docs[did] = _doc_tokens(seed=5000 + j)
        did += 1
    return docs, pair_ids


def test_minhash_recall_and_exact_precision(spark, corpus):
    docs, _ = corpus
    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in docs.items()], ["doc_id", "text"]
    )
    threshold = 0.3
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in minhash_lsh_pairs(
            df, "doc_id", "text", num_hashes=64, bands=16, shingle_n=2,
            jaccard_threshold=threshold,
        ).collect()
    }

    truth = {}
    ids = sorted(docs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            j = _bigram_jaccard(docs[ids[ai]], docs[ids[bi]])
            if j >= threshold:
                truth[(ids[ai], ids[bi])] = j

    # exact precision: no false positives, and reported jaccards are correct
    for pair, j in got.items():
        assert pair in truth, f"false positive {pair} (j={j})"
        assert abs(truth[pair] - j) < 1e-9

    # recall on comfortably-above-threshold pairs
    strong = {p for p, j in truth.items() if j >= 0.5}
    found_strong = strong & set(got)
    assert len(found_strong) >= 0.9 * len(strong), (
        f"recall {len(found_strong)}/{len(strong)} below 0.9"
    )
    # near-identical pairs must always be found
    near_ident = {p for p, j in truth.items() if j >= 0.8}
    assert near_ident <= set(got)
    assert len(strong) >= 10  # the harness actually exercised the spectrum