"""Distributed Bloom-filter build + probe-side join pruning.

The 100 TB shape this exists for: a fact table too big to move joins
against a filtered dimension whose key set is too big to broadcast AS
KEYS but whose one-bit-per-key summary fits in kilobytes. Building a
Bloom filter over the build-side keys and testing every probe row
BEFORE the shuffle turns a full fact-table exchange into an exchange of
only the (tiny) matching fraction plus a bounded false-positive tail —
the same idea behind Spark's own runtime row-group Bloom pruning and
Parquet bloom filters, here as an explicit, measurable operator.

Mechanics (all JVM-side codegen; no UDF, no collect):

- :func:`bloom_build`: each distinct build key sets ``k`` bit
  positions ``pmod(xxhash64(key, seed), m_bits)``. The filter is
  materialized as a DataFrame of ``(word_idx, bits)`` — ``m_bits/64``
  rows of packed longs via ``bit_or`` aggregation (a 2^17-bit filter is
  2048 rows ≈ 32 KB). xxhash64 is deterministic across runs/executors,
  so the filter is stable under task retry (no nondeterministic-
  shuffle-key hazard).
- :func:`bloom_prune`: ``k`` chained BROADCAST hash joins, one per
  seed — each join looks up the probe row's word and keeps the row only
  if its bit is set (``bits & mask != 0`` in the join condition; a
  missing word row means an all-zero word and the inner join drops the
  row). Map-side only: zero shuffles are added to the probe plan, and
  rows failing an early seed short-circuit out of the later joins.
- No false negatives by construction (every inserted key sets exactly
  the bits later tested), so pruned-join == plain-join EXACTLY — which
  is what the oracle gate checks. False positives only cost wasted
  shuffle rows, measured at
  ``fp ≈ (1 - exp(-k * n_keys / m_bits)) ** k``; size ``m_bits`` at
  ~10-16 bits per expected build key and keep ``k`` in 3-5.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_prune", "bloom_prune_join"]


def _positions(key, m_bits: int, k: int):
    """The k deterministic bit positions for a key."""
    return [F.pmod(F.xxhash64(key, F.lit(s)), F.lit(int(m_bits))) for s in range(k)]


def bloom_build(
    build: DataFrame, key_col: str, *, m_bits: int = 1 << 17, k: int = 4
) -> DataFrame:
    """Aggregate the build side's distinct keys into a packed-long Bloom
    filter: ``(word_idx LONG, bits LONG)``, at most ``m_bits/64`` rows.
    One small shuffle of the build keys; the result is broadcastable at
    any realistic ``m_bits``."""
    if m_bits % 64 != 0:
        raise ValueError("m_bits must be a multiple of 64")
    keys = build.select(F.col(key_col).alias("__bk")).distinct()
    pos = keys.select(
        F.explode(F.array(*_positions(F.col("__bk"), m_bits, k))).alias("__pos")
    )
    return (
        pos.select(
            F.expr("__pos div 64").alias("word_idx"),
            F.expr("shiftleft(cast(1 as bigint), cast(__pos % 64 as int))").alias(
                "__mask"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("__mask").alias("bits"))
    )


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bloom: DataFrame,
    *,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Keep only probe rows whose key passes the Bloom filter — ``k``
    broadcast joins, purely map-side, no shuffle added. Sound (never
    drops a true match); complete up to the filter's false-positive
    rate, which the downstream real join resolves."""
    out = probe
    for s, pos in enumerate(_positions(F.col(key_col), m_bits, k)):
        bf = bloom.select(
            F.col("word_idx").alias(f"__bw{s}"), F.col("bits").alias(f"__bb{s}")
        )
        out = (
            out.withColumn(f"__p{s}", pos)
            .join(
                F.broadcast(bf),
                F.expr(f"__p{s} div 64") == F.col(f"__bw{s}"),
                "inner",
            )
            .filter(
                F.expr(
                    f"(__bb{s} & shiftleft(cast(1 as bigint), "
                    f"cast(__p{s} % 64 as int))) != 0"
                )
            )
            .drop(f"__p{s}", f"__bw{s}", f"__bb{s}")
        )
    return out


def bloom_prune_join(
    probe: DataFrame,
    build: DataFrame,
    *,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> DataFrame:
    """Inner equi-join with Bloom pre-pruning of the probe side: build
    the filter from the build side's keys, prune the probe map-side,
    then run the real join on the surviving fraction. Result is exactly
    the plain inner join (no false negatives); the shuffle carries only
    matches + the fp tail instead of the whole probe table."""
    # xxhash64 is TYPE-sensitive: hash(1 as int) != hash(1 as bigint),
    # so a probe/build key dtype mismatch would silently produce false
    # negatives — the one failure mode this operator must never have.
    # Reject it loudly instead of guessing a coercion.
    p_type = dict(probe.dtypes)[probe_key]
    b_type = dict(build.dtypes)[build_key]
    if p_type != b_type:
        raise ValueError(
            f"bloom_prune_join key dtype mismatch: probe {probe_key}:{p_type} "
            f"vs build {build_key}:{b_type} — cast both sides to one type "
            "(xxhash64 hashes typed values; a mismatch drops true matches)"
        )
    bloom = bloom_build(build, build_key, m_bits=m_bits, k=k)
    pruned = bloom_prune(probe, probe_key, bloom, m_bits=m_bits, k=k)
    # String aliases, not DataFrame-attribute references: pruned's plan
    # already CONTAINS build's attributes (the Bloom frame is derived
    # from build), so build[c] after the join is ambiguous the way any
    # self-join reference is. The build-side key is then projected OUT
    # so the output schema is unambiguous when probe_key == build_key
    # (both sides' columns survive a non-USING join, and a duplicate
    # name makes downstream F.col references ambiguous) — the
    # probe-side key carries the identical value.
    p = pruned.alias("__bp_probe")
    b = build.alias("__bp_build")
    joined = p.join(
        b,
        F.col(f"__bp_probe.{probe_key}") == F.col(f"__bp_build.{build_key}"),
        "inner",
    )
    # ... but ONLY when the names actually collide: distinct-named keys
    # keep the build column, preserving the pre-existing output contract
    # for callers that select it (round-8 review finding).
    drop_build_key = probe_key == build_key
    keep = [F.col(f"__bp_probe.{c}") for c in pruned.columns] + [
        F.col(f"__bp_build.{c}")
        for c in build.columns
        if not (drop_build_key and c == build_key)
    ]
    return joined.select(*keep)
