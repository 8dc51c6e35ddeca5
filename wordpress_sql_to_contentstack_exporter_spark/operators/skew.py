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


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    n_salts: int = 16,
    hot_keys: DataFrame | None = None,
    hot_threshold: int = 1_000_000,
    how: str = "inner",
) -> DataFrame:
    """Skew-aware equi-join: the join counterpart to ``salted_agg``.

    A shuffle join partitions both sides by the key, so one mega-hot key
    (the null user, the default org, the viral document) pins its entire
    fan-in on ONE reducer no matter how many executors exist. AQE's
    skew-join split helps only when the skewed side's partitions are
    splittable post-shuffle; it cannot split a single key's hash bucket
    across reducers for a sort-merge join of two large tables. The
    classical fix, made an operator:

    - fact side: rows whose key is hot get a salt in ``[0, n_salts)``
      from the whole-row ``xxhash64`` XOR a per-row ordinal (the
      ordinal spreads fully-duplicate rows, which a content hash alone
      would pile onto one salt); cold rows get salt 0. The ordinal is
      run-dependent, but the OUTPUT stays deterministic: any salt joins
      the same replicated dim rows, so the result multiset is identical
      whichever salt a copy draws.
    - dim side: hot-key rows are REPLICATED once per salt (an
      ``explode(sequence(...))`` of exactly ``n_salts`` copies, only
      for hot keys — the replication cost is |hot keys| x n_salts rows,
      not |dim| x n_salts); cold rows keep salt 0.
    - join on (key, salt): every output pair appears exactly once, so
      the result is row-for-row IDENTICAL to the plain join (the oracle
      contract), but a hot key's fan-in now spreads over ``n_salts``
      reducers.

    ``hot_keys`` is a 1-column DataFrame of keys to salt — pass the
    output of ``relational.join_blowup_profile`` (the pre-flight that
    measures exactly this hazard) or any catalog-known list; it is
    broadcast, so keep it small (hot keys are few by definition). When
    None, it is computed from the fact side with one count-aggregate
    (keys with >= ``hot_threshold`` rows) — a scan that at 100 TB you
    fold into the profiling pass instead.

    ``how`` supports "inner" and "left" (fact-preserving: an unmatched
    fact row carries salt but no dim partner on ANY salt, so left
    semantics survive salting unchanged). Right/full would need the
    dim side fact-preserved across replicas — out of scope.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    if n_salts < 2:
        raise ValueError("n_salts >= 2 required")
    if hot_keys is None:
        hot_keys = (
            fact.groupBy(key)
            .agg(F.count(F.lit(1)).alias("__c"))
            .filter(F.col("__c") >= hot_threshold)
            .select(key)
        )
    hot = hot_keys.select(F.col(key)).distinct().withColumn(
        "__is_hot", F.lit(True)
    )

    # the broadcast hint is applied AT each join (hints can be dropped by
    # intervening transformations)
    f = fact.join(F.broadcast(hot), key, "left")
    # the ordinal term spreads FULLY-DUPLICATE hot rows (a whole-row
    # hash alone sends every identical copy to one salt, re-creating
    # the hot spot — round-6 code-review finding). Output determinism
    # survives the ordinal's run-dependence: ANY salt in [0, n) joins
    # the same replicated dim rows, so the result multiset is identical
    # whichever salt each copy draws.
    f_salt = F.when(
        F.col("__is_hot").isNotNull(),
        F.pmod(
            F.xxhash64(*[F.col(c) for c in fact.columns]).bitwiseXOR(
                F.monotonically_increasing_id()  # XOR, not +: addition of two full-range longs can overflow under ANSI
            ),
            F.lit(n_salts),
        ),
    ).otherwise(F.lit(0).cast("long"))
    f = f.withColumn("__salt", f_salt).drop("__is_hot")

    d = dim.join(F.broadcast(hot), key, "left")
    d_salts = F.when(
        F.col("__is_hot").isNotNull(),
        F.sequence(F.lit(0).cast("long"), F.lit(n_salts - 1).cast("long")),
    ).otherwise(F.array(F.lit(0).cast("long")))
    d = (
        d.withColumn("__salt", F.explode(d_salts))
        .drop("__is_hot")
    )

    out = f.join(d, [key, "__salt"], how)
    return out.drop("__salt")
