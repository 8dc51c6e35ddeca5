"""Sampling and sequence-packing operators for training-data pipelines.

- Stratified sampling / deterministic splits: the data-curation staples
  (per-language quotas, train/val/test). Both are hash-based, not
  ``rand()``-based, so results are reproducible across runs, executors,
  and retries — a property ``sample()`` does not give under task retry.
- Sequence packing: greedily pack documents into fixed token budgets
  (LLM pretraining batch shaping). Expressed as a running-sum window per
  shard — one shuffle, no driver loops; packs are local to a shard so
  the operation stays embarrassingly parallel at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _unit_hash(col: Column, seed: int) -> Column:
    """Deterministic uniform [0,1) from a key column (xxhash64-based)."""
    h = F.xxhash64(col, F.lit(seed))
    # map signed 64-bit to [0,1): shift to unsigned range via /2 trick
    return (F.abs(h) % F.lit(1_000_000_007)) / F.lit(1_000_000_007.0)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    *,
    key_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum sampling with reproducible hash-based selection.

    ``fractions`` maps stratum value -> keep fraction (missing strata are
    dropped, like ``sampleBy``). Selection depends only on (key, seed):
    re-running, adding executors, or retrying tasks yields the same
    sample — unlike rand()-based sampling.
    """
    frac = None
    for value, p in fractions.items():
        branch = F.when(F.col(strata_col) == value, F.lit(float(p)))
        frac = branch if frac is None else frac.when(F.col(strata_col) == value, F.lit(float(p)))
    frac = frac.otherwise(F.lit(0.0)) if frac is not None else F.lit(0.0)
    return df.filter(_unit_hash(F.col(key_col), seed) < frac)


def deterministic_split(
    df: DataFrame,
    weights: dict[str, float],
    *,
    key_col: str,
    seed: int = 42,
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to exactly one named split by hash bucket
    (train/val/test). Weights are normalized; assignment is stable under
    reprocessing, which keeps eval contamination impossible across runs."""
    total = sum(weights.values())
    u = _unit_hash(F.col(key_col), seed)
    expr = None
    acc = 0.0
    items = list(weights.items())
    for name, w in items[:-1]:
        acc += w / total
        branch = (u < F.lit(acc), F.lit(name))
        expr = F.when(*branch) if expr is None else expr.when(*branch)
    last = F.lit(items[-1][0])
    assigned = last if expr is None else expr.otherwise(last)
    return df.withColumn(out_col, assigned)


def pack_sequences(
    df: DataFrame,
    *,
    token_col: str,
    max_tokens: int,
    key_col: str,
    n_shards: int = 32,
    out_pack_col: str = "pack_id",
    shard_expr: Column | None = None,
) -> DataFrame:
    """Greedy next-fit sequence packing: assign docs to packs whose token
    sum stays <= max_tokens (docs longer than the budget get their own
    pack).

    Shard by key hash, order deterministically within shard, then a
    running-sum window computes the pack boundary: pack = number of
    budget overflows seen so far (next-fit discipline, the standard
    streaming-packing approximation of bin packing). One shuffle;
    ``n_shards`` bounds window-partition size so state never exceeds a
    shard. Pack ids are globally unique: (shard, local pack index).
    """
    if shard_expr is None:
        shard_expr = F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards))
    sharded = df.withColumn("__shard", shard_expr)
    w = Window.partitionBy("__shard").orderBy(F.col(key_col))
    capped = F.least(F.col(token_col), F.lit(max_tokens))
    # next-fit: running sum resets are equivalent to floor boundaries over
    # the sequence of cumulative sums with overflow carries; computed via
    # an aggregate over the collected per-shard prefix is not scalable, so
    # we use the standard approximation: pack index = floor of the
    # *exclusive* running sum / budget. This can split at most one doc's
    # worth of slack per boundary vs true next-fit.
    running_before = F.coalesce(
        F.sum(capped).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0.0),
    )
    local_pack = F.floor(running_before / F.lit(max_tokens))
    return sharded.withColumn(
        out_pack_col,
        F.concat_ws("-", F.col("__shard").cast("string"), local_pack.cast("string")),
    ).drop("__shard")
