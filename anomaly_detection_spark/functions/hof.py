"""Higher-order-function helpers.

``bind_once``: Spark evaluates a lambda-bound variable once per row,
but a plain Column expression referenced inside a higher-order
function's lambda is RE-EVALUATED per element — e.g. windowed n-grams
written as ``transform(sequence(...), i -> slice(tokens_expr, i, n))``
re-run the whole tokenize chain (regex split + filter) for every
window.  Wrapping the expensive expression as
``transform(array(expr), x -> body(x))[0]`` binds it to a lambda
variable, forcing one evaluation per row; measured ~10-30× on
n-gram shingling over the documents table (the result is
bit-identical — locked by tests).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["bind_once"]


def bind_once(expr: Column, body: Callable[[Column], Column]) -> Column:
    """``body(expr)`` with ``expr`` evaluated exactly once per row."""
    return F.element_at(F.transform(F.array(expr), body), 1)
