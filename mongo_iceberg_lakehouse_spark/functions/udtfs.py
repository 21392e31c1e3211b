"""Python user-defined table functions (UDTFs) — the row->rows extension
surface (Spark 4's ``@udtf`` + SQL ``LATERAL`` calls).

This covers the *API class*, not the hot path: a UDTF runs Python per
input row (Arrow-batched transfer with ``useArrow=True``, but the eval
loop is still Python), so anything expressible with built-in
higher-order functions should use those instead — ``docs_chunk_overlap``
is the zero-shuffle HOF equivalent of this module's splitter. Reach for
a UDTF only when the row-expansion logic genuinely needs Python (an
external tokenizer, a parser library, branching state per row).

Determinism contract: ``eval`` must be a pure function of its arguments
(no RNG, no wall clock) so re-executed tasks — speculative or recovered —
emit identical rows; Spark may re-run UDTF partitions at any time.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sent_idx int, sentence string, n_chars int", useArrow=True)
class SentenceSplit:
    """Split ``text`` on '. ' into (index, sentence, char-count) rows.

    Mirrors DuckDB ``string_split(text, '. ')`` exactly (literal split,
    trailing empties kept) so the lateral expansion is oracle-checkable
    value-for-value.
    """

    def eval(self, text):
        for i, s in enumerate((text or "").split(". ")):
            yield i, s, len(s)


def register_udtfs(spark) -> None:
    """Idempotently register this module's UDTFs for SQL LATERAL use."""
    spark.udtf.register("sentence_split", SentenceSplit)
