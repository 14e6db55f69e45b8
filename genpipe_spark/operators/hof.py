"""Higher-order-function evaluation helpers.

Spark evaluates HOF lambdas per element, and any *free* subexpression
inside the lambda body is re-evaluated on every element (and
CollapseProject can inline a projected alias back into each use site).
``bind`` forces single evaluation by passing the expression through a
one-element ``transform``, making it a lambda *variable* — lambda vars
are bound once. Measured effect on the shingle pipeline: 66 s → 0.9 s at
sf0.1 (see SCALE.md "Known costs")."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def bind(expr: Column, fn: Callable[[Column], Column]) -> Column:
    """Evaluate ``expr`` once, then apply ``fn`` to the bound value."""
    return F.element_at(F.transform(F.array(expr), fn), 1)
