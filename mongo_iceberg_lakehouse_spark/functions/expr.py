"""Expression-level utilities.

``let_`` is the load-bearing one: Catalyst has no common-subexpression
elimination inside interpreted higher-order-function trees, so a Column
expression referenced k times inside a lambda is *evaluated* k times per
element — an O(L) subexpression referenced per element of an O(L) array
silently becomes O(L^2) per row (measured 7.4 s -> 0.37 s on the sf1
shingling stage).

Scope: this matters ONLY for references inside lambda bodies. Repeated
subtrees at the top level of a single projection ARE deduplicated by
whole-stage codegen's subexpression elimination (measured: a projection
with ~7 repeated ``tokens(text)`` references costs the same as a bound
one), so plain multi-use of an expression across output columns does not
need let_. Materializing the subexpression as its own projection
column fixes it, but forces an API that returns DataFrames instead of
composable Columns. ``let_`` keeps the Column shape: a ``transform``
lambda VARIABLE is bound to its evaluated value, so wrapping the value in
a one-element array and reading it back through the lambda gives every
inner reference the already-computed result — a let-binding built from
public Spark primitives.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_(value: Column, body: Callable[[Column], Column]) -> Column:
    """Evaluate ``value`` once and pass the bound result to ``body``.

    Equivalent to ``body(value)`` except ``value`` is computed a single
    time per row even when ``body`` references it many times (including
    inside nested lambdas). Cost: one single-element array allocation.
    """
    return F.get(F.transform(F.array(value), body), 0)
