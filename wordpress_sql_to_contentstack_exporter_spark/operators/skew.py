"""Skew-aware aggregation: two-stage (salted) combine.

AQE's skew-join splitting covers joins, but a single mega-hot group in a
``groupBy`` can still pin one reducer. Salting splits each group into
``salt`` subgroups for the partial aggregate, then combines — at the cost
of a second (tiny) shuffle. Only worth it when the key histogram is
pathological; for most aggregates Spark's map-side partial aggregation
already absorbs skew, so the plain path stays the default.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregation with a salt column.

    ``aggs`` maps output name -> (combine_fn_name, partial Column), where
    the partial Column is aggregated per (keys, salt) and the combine
    function merges partials per keys. Decomposable aggregates only:
    count -> sum, sum -> sum, min -> min, max -> max.

    Example::

        salted_agg(orders, ["o_custkey"],
                   {"order_count": ("sum", F.count(F.lit(1))),
                    "total_spend": ("sum", F.sum("o_totalprice"))})
    """
    salted = df.withColumn("__salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt)))
    partial = salted.groupBy(*keys, "__salt").agg(
        *[col.alias(f"__p_{name}") for name, (_fn, col) in aggs.items()]
    )
    final = partial.groupBy(*keys).agg(
        *[
            getattr(F, fn)(F.col(f"__p_{name}")).alias(name)
            for name, (fn, _col) in aggs.items()
        ]
    )
    return final
