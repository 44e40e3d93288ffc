"""Higher-order-function let-binding.

A Catalyst lambda body re-evaluates its FREE subexpressions on every
invocation — ``transform(sequence(1, n), i -> slice(split(text), i, k))``
splits the text n times (O(n²) work per row; a 10× corpus probe of the
winnowing operator burned 199 CPU-minutes before this was caught, and
the word-shingle family measured 25× slower on 8×-long documents).
``let_bound`` evaluates a column ONCE per row and hands the value to the
body as a bound lambda variable:

    shingles = let_bound(F.split(text, " "), lambda words: F.transform(...))

Implementation: ``zip_with`` over two one-element arrays — the arrays
are lambda ARGUMENTS (evaluated once), the body runs once with the
value bound, ``element_at(…, 1)`` unwraps. No zero-value typing is
needed (unlike the ``aggregate``-based form), so it works for any
result type Catalyst can infer.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let_bound(value: Column, body: Callable[[Column], Column]) -> Column:
    """``let value in body(value)``: evaluate ``value`` once per row and
    substitute the RESULT (not the expression tree) into ``body``."""
    return F.element_at(
        F.zip_with(F.array(value), F.array(F.lit(0)), lambda v, _: body(v)),
        1,
    )
