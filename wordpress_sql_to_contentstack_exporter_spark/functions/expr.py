"""Expression-level combinators shared across operator modules.

Home for plumbing that is about Spark's EXPRESSION evaluation model
rather than any one operator family (the round-11 review asked for a
neutral module after ``classify``/``manifest`` started importing a
dedup-private helper).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(bound: Column, body) -> Column:
    """Let-binding for Column expressions: evaluate ``bound`` ONCE per
    row and hand the value to ``body`` as a lambda variable.

    Spark evaluates every non-lambda-variable subexpression inside a
    higher-order-function lambda PER ELEMENT — a computed string or
    array referenced in a ``transform`` body is recomputed for every
    index, turning an O(n) shingle pass into O(n^2) normalize/tokenize
    work (measured 15.1 s -> 2.8 s on the sf0.1 char-shingle explode;
    the round-11 winnow-fingerprint find, packaged). There is no native
    ``let`` in Spark's expression language, so this wraps the value in
    a single-element array and binds it through a one-iteration
    ``transform``: references to the lambda variable are cheap bound
    attributes, and NULL propagates exactly as the raw expression would
    (``array(x)[0]`` is ``x``).
    """
    return F.transform(F.array(bound), body)[0]
