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



def hashable_salt_cols(df: DataFrame) -> list[str]:
    """Columns ``xxhash64`` can consume: any column whose type contains
    no MAP anywhere (top-level or nested in arrays/structs — xxhash64
    rejects both, and map iteration order could not give a stable hash
    anyway). Shared by the salted operators and the layout sink so the
    hashability rule cannot drift between call sites (round-8 review)."""
    return [c for c, t in df.dtypes if "map<" not in t]


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    *,
    salt: int = 16,
    unique_cols: list[str] | None = None,
) -> DataFrame:
    """Two-stage aggregation with a salt column.

    ``aggs`` maps output name -> (combine_fn_name, partial Column), where
    the partial Column is aggregated per (keys, salt) and the combine
    function merges partials per keys. Decomposable aggregates only:
    count -> sum, sum -> sum, min -> min, max -> max.

    The salt is a DETERMINISTIC content hash — ``xxhash64`` over
    ``unique_cols`` when given, else over the whole row. Determinism is
    a hard requirement, not a style point: the salt becomes the stage-1
    SHUFFLE KEY, and Spark's fault tolerance recomputes map tasks after
    a fetch failure or executor loss. A run-dependent salt (an earlier
    draft used ``pmod(spark_partition_id() + monotonically_increasing_id(),
    salt)``) lets a recomputed row draw a DIFFERENT salt than the one
    some reducers already consumed — its partial count/sum is then
    duplicated or dropped, precisely in the large-cluster failure regime
    this operator exists for. Failure-free runs are multiset-identical
    either way, which is why a local oracle can never catch the bug.

    The caveat the determinism buys: rows that are FULLY duplicate hash
    to the same salt, so a hot group made of exact duplicate rows is not
    spread. Pass ``unique_cols`` naming a distinguishing column (a row
    id, an event id) when the table has one; a table whose hot rows are
    exact duplicates should get a synthetic id upstream (spreading them
    any other way needs a nondeterministic ordinal — the hazard above).

    Example::

        salted_agg(orders, ["o_custkey"],
                   {"order_count": ("sum", F.count(F.lit(1))),
                    "total_spend": ("sum", F.sum("o_totalprice"))},
                   unique_cols=["o_orderkey"])
    """
    if unique_cols is not None:
        missing = [c for c in unique_cols if c not in df.columns]
        if missing:
            raise ValueError(f"unique_cols not in df: {missing}")
        salt_cols = unique_cols
    else:
        # see hashable_salt_cols: maps (incl. nested) cannot feed the
        # salt hash. A frame of ONLY maps+keys must name unique_cols.
        salt_cols = hashable_salt_cols(df)
        if not salt_cols:
            raise ValueError(
                "salted_agg: no hashable (non-map) columns to derive the "
                "deterministic salt from — pass unique_cols"
            )
    # DETERMINISTIC salt only — it becomes a shuffle key, and a task
    # recompute must re-derive the identical salt (see docstring).
    salted = df.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(salt)),
    )
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
    unique_cols: list[str] | None = None,
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
      from a DETERMINISTIC content hash — ``xxhash64`` over
      ``unique_cols`` when given, else over the whole row; cold rows
      get salt 0. Determinism here is a hard requirement, not a style
      point: the salt is a SHUFFLE KEY, and Spark's fault tolerance
      recomputes map tasks after a fetch failure or executor loss. A
      run-dependent salt (an earlier draft XORed in
      ``monotonically_increasing_id``) lets a recomputed row draw a
      DIFFERENT salt than the one some reducers already consumed — the
      row is then duplicated or dropped, precisely in the
      large-cluster regime this operator targets. A multiset-identity
      argument over the outputs holds only for failure-free runs.
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

    ``unique_cols`` names columns that distinguish fact rows (a row id,
    an event id). Pass it when hot rows can be FULLY duplicate: the
    whole-row hash piles identical copies onto one salt, re-creating
    the hot spot (spreading them any other way would need a
    nondeterministic ordinal — the correctness hazard above — or a
    pre-shuffled stable ordinal, costing the very exchange this
    operator avoids; a table whose hot rows are exact duplicates
    should get a synthetic id upstream).

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

    if unique_cols is not None:
        missing = [c for c in unique_cols if c not in fact.columns]
        if missing:
            raise ValueError(f"unique_cols not in fact: {missing}")
        salt_cols = unique_cols
    else:
        # same map exclusion as salted_agg (shared helper) — a map
        # column in the fact frame would otherwise fail xxhash64 at
        # plan time (round-8 review finding)
        salt_cols = hashable_salt_cols(fact)
        if not salt_cols:
            raise ValueError(
                "salted_join: no hashable (map-free) columns to derive "
                "the deterministic salt from — pass unique_cols"
            )

    # the broadcast hint is applied AT each join (hints can be dropped by
    # intervening transformations)
    f = fact.join(F.broadcast(hot), key, "left")
    # DETERMINISTIC salt only — it becomes a shuffle key, and a task
    # recompute must re-derive the identical salt (see docstring).
    f_salt = F.when(
        F.col("__is_hot").isNotNull(),
        F.pmod(F.xxhash64(*[F.col(c) for c in salt_cols]), F.lit(n_salts)),
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


def skew_diagnostics(
    df: DataFrame,
    key_col: str,
    *,
    top: int = 20,
    target_rows_per_task: int = 1_000_000,
) -> DataFrame:
    """Pre-join/pre-agg skew report: the top-N hottest keys with their
    row counts, corpus share (exact integer per-mille), and the salt
    factor that would level each onto ``target_rows_per_task``-row
    tasks — the number `salted_join`/`salted_agg` take as ``n_salts``.

    The operational loop this serves at 100 TB: a shuffle stage
    straggles → run the diagnostic on the join key → read off the hot
    keys and the recommended salt → apply the salted operator (or AQE
    skew thresholds) with a measured number instead of a guess.

    One map-combinable count per key + a TakeOrdered top-N (no global
    sort, no window); share is integer cross-multiplied per-mille so
    the report is engine-exact. NULL keys are counted as a key (NULLs
    concentrate in one shuffle partition too — the classic invisible
    hot key, surfaced here rather than dropped).
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows")
    )
    total = df.select(F.count(F.lit(1)).cast("long").alias("__total"))
    return (
        counts.join(F.broadcast(total))
        .select(
            F.col("key").cast("string").alias("key"),
            "n_rows",
            # exact integer per-mille of corpus rows
            F.expr("(n_rows * 1000) div __total").alias("share_permille"),
            # ceil(n_rows / target) without floats
            F.expr(
                f"(n_rows + {int(target_rows_per_task)} - 1) "
                f"div {int(target_rows_per_task)}"
            )
            .cast("long")
            .alias("recommended_salts"),
        )
        # NULLS LAST explicitly: Spark's bare ASC is NULLS FIRST while
        # ANSI engines default NULLS LAST, so a NULL hot key tying at
        # the LIMIT boundary would otherwise make the top-N membership
        # engine-dependent
        .orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
        .limit(top)
    )
