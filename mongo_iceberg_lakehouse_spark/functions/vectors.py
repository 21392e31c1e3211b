"""Vector math over ``array<float|double>`` columns, JVM-side.

Built entirely from pyspark.sql higher-order functions (``zip_with``,
``aggregate``) so the hot path stays inside whole-stage codegen — no Python
boundary. Inputs are cast to double element-wise first: the embeddings fixture
stores float32, and doing the arithmetic in float64 keeps results aligned with
any double-precision oracle (and avoids catastrophic cancellation on long
vectors).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column | str) -> Column:
    v = F.col(v) if isinstance(v, str) else v
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Dot product of two array columns (double precision)."""
    prods = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    ad = _as_double(a)
    sq = F.aggregate(ad, F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either vector has zero norm."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)
