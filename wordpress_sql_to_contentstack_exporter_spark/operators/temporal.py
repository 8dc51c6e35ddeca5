"""Temporal join operators Spark lacks natively: as-of join and
key-bounded range join.

As-of join (the "most recent matching row at or before t" join of
time-series/feature-store workloads) has no built-in DataFrame form. The
naive translation — per-left-row correlated subquery, or join + filter +
row_number — shuffles the full pair blow-up. The implementation here is
the single-shuffle union trick:

    union(tag left rows, tag right rows)
      -> window over (keys, ORDER BY ts, right-before-left at ties)
      -> last(right payload, ignorenulls) carried forward
      -> keep left rows

One shuffle on the join keys, no pair explosion, O(n log n) within each
key partition — the same shape Flink/kdb as-of joins use. Skewed keys are
handled by AQE; a per-key hot tail can additionally be range-bucketed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _micros(c: Column) -> Column:
    """Epoch micros for TIMESTAMP and TIMESTAMP_NTZ alike.

    Parquet written without a timezone (``timestamp[us]``) arrives as
    TIMESTAMP_NTZ, which ``unix_micros`` rejects. The session pins
    ``spark.sql.session.timeZone=UTC`` (session.py:46), so the NTZ->LTZ
    cast is offset-free and the *difference* of two casts is exact in any
    fixed-offset zone.
    """
    return F.unix_micros(c.cast("timestamp"))


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: str,
    right_ts: str,
    payload: list[str],
    tolerance_seconds: int | None = None,
    strict: bool = False,
) -> DataFrame:
    """For each left row, attach the latest right row with
    ``right_ts <= left_ts`` (or ``<`` when ``strict``) on the same keys.

    Output: all left columns + ``asof_<payload-col>`` columns (NULL when
    no prior right row exists, or the match is older than
    ``tolerance_seconds``). ``right_ts`` must be in ``payload`` callers
    want returned; it is always carried internally for tolerance checks.
    """
    lcols = left.columns
    tagged_left = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(
            right.select(F.struct(F.col(right_ts).alias("__rts"), *payload).alias("s"))
            .schema["s"]
            .dataType.simpleString()
        ).alias("__payload"),
    )
    tagged_right = right.select(
        # Join keys must survive tagging (they drive the window partition);
        # every other left column rides along as NULL.
        *[
            (F.col(c).alias(c) if c in keys else F.lit(None).cast(dict(left.dtypes)[c]).alias(c))
            for c in lcols
        ],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(F.col(right_ts).alias("__rts"), *payload).alias("__payload"),
    )
    unioned = tagged_left.unionByName(tagged_right)

    # Ties: with strict=False the right row at the same ts must be visible
    # to the left row -> right sorts first (__is_left asc). With strict=True
    # the left row sorts first and cannot see the simultaneous right row.
    order = [F.col("__ts").asc()] + (
        [F.col("__is_left").asc()] if not strict else [F.col("__is_left").desc()]
    )
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1 if strict else 0)
    )
    carried = unioned.withColumn(
        "__match",
        F.last(F.when(F.col("__is_left") == 0, F.col("__payload")), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        out = out.withColumn(
            "__match",
            F.when(
                _micros(F.col("__ts")) - _micros(F.col("__match.__rts"))
                <= tolerance_seconds * 1_000_000,
                F.col("__match"),
            ),
        )
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"__match.{p}").alias(f"asof_{p}") for p in payload],
    )


def gapfill_buckets(
    df: DataFrame,
    *,
    keys: list[str],
    ts_col: str,
    bucket_seconds: int,
    aggs: dict[str, Column],
    locf_cols: list[str] | None = None,
    interp_cols: list[str] | None = None,
) -> DataFrame:
    """Regular time-bucket spine per key with gap rows present — the
    hypertable ``time_bucket_gapfill`` shape (TimescaleDB) Spark lacks.

    Rows are bucketed to ``bucket_seconds`` and aggregated per
    (keys, bucket); every key then gets a dense bucket spine from its
    first to its last observed bucket (``sequence`` + ``explode``,
    JVM-side), gap buckets carrying NULL aggregates. Columns named in
    ``locf_cols`` (must be agg aliases) additionally get a
    ``<col>_locf`` last-observation-carried-forward variant via a
    NULL-skipping window. Columns in ``interp_cols`` get a
    ``<col>_interp`` LINEAR interpolation between the surrounding
    non-null observations (TimescaleDB ``interpolate()``): observed
    buckets keep their value; gap buckets get
    ``prev + (next − prev) · (idx − prev_idx)/(next_idx − prev_idx)``;
    buckets with no observation on one side stay NULL. The arithmetic
    is one fixed-order expression over per-row values — no cross-row
    float accumulation — so when the interpolated column is an exact
    integer aggregate the result is bit-identical cross-engine (each
    IEEE op is correctly rounded on identical operands; contrast the
    engine-private interpolation inside quantile_cont, documented at
    q_percentiles). The four NULL-skipping windows ride the same
    (keys, idx) sort the LOCF window uses — no extra exchange.

    Scale shape: one shuffle to aggregate (partial agg map-side), after
    which everything operates on AGGREGATED rows — the spine is
    |keys| x |buckets| regardless of input row count, so a 100 TB event
    stream gap-fills over the same few-million-row spine as a 1 GB one.
    The spine join broadcasts when small; the LOCF window rides the same
    (keys, bucket) partitioning AQE already produced.
    """
    locf_cols = list(locf_cols or [])
    interp_cols = list(interp_cols or [])
    # Internal/output name collision guard (ADVICE r4): a caller whose
    # keys or agg aliases include the plan's internal columns (or the
    # bucket_epoch output, or a generated <col>_locf name) would get a
    # silent overwrite or an ambiguous-column error mid-plan — fail fast
    # instead, matching the NULL-ts defensive style below.
    reserved = {"__idx", "__mn", "__mx", "bucket_epoch"}
    names = set(keys) | set(aggs)
    clashes = sorted(names & reserved)
    locf_out = {f"{c}_locf" for c in locf_cols} | {
        f"{c}_interp" for c in interp_cols
    }
    clashes += sorted(names & locf_out)
    if clashes:
        raise ValueError(
            f"gapfill_buckets: reserved/generated column name collision: {clashes} "
            f"(reserved: {sorted(reserved)}; generated: {sorted(locf_out)})"
        )
    missing = [c for c in locf_cols if c not in aggs] + [
        c for c in interp_cols if c not in aggs
    ]
    if missing:
        raise ValueError(
            f"gapfill_buckets: locf_cols/interp_cols not in aggs: {missing}"
        )
    idx = F.floor(_micros(F.col(ts_col)) / F.lit(bucket_seconds * 1_000_000)).cast("long")
    # NULL-timestamp rows cannot be bucketed; drop them explicitly (they
    # would otherwise form a NULL bucket that silently falls out of the
    # spine join) — callers wanting them routed elsewhere filter first.
    bucketed = (
        df.filter(F.col(ts_col).isNotNull())
        .withColumn("__idx", idx)
        .groupBy(*keys, "__idx")
        .agg(*[c.alias(a) for a, c in aggs.items()])
    )
    spine = (
        bucketed.groupBy(*keys)
        .agg(F.min("__idx").alias("__mn"), F.max("__idx").alias("__mx"))
        .select(*keys, F.explode(F.sequence("__mn", "__mx")).alias("__idx"))
    )
    filled = spine.join(bucketed, [*keys, "__idx"], "left")
    for c in locf_cols:
        w = (
            Window.partitionBy(*keys)
            .orderBy("__idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        filled = filled.withColumn(f"{c}_locf", F.last(F.col(c), ignorenulls=True).over(w))
    for c in interp_cols:
        wp = (
            Window.partitionBy(*keys)
            .orderBy("__idx")
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        wn = (
            Window.partitionBy(*keys)
            .orderBy("__idx")
            .rowsBetween(0, Window.unboundedFollowing)
        )
        val = F.col(c).cast("double")
        pv = F.last(val, ignorenulls=True).over(wp)
        pi = F.last(
            F.when(val.isNotNull(), F.col("__idx")), ignorenulls=True
        ).over(wp)
        nv = F.first(val, ignorenulls=True).over(wn)
        ni = F.first(
            F.when(val.isNotNull(), F.col("__idx")), ignorenulls=True
        ).over(wn)
        frac = (F.col("__idx") - pi).cast("double") / (ni - pi).cast("double")
        filled = filled.withColumn(
            f"{c}_interp",
            F.when(val.isNotNull(), val).otherwise(
                F.when(pv.isNotNull() & nv.isNotNull(), pv + (nv - pv) * frac)
            ),
        )
    return filled.withColumn(
        "bucket_epoch", F.col("__idx") * F.lit(bucket_seconds).cast("long")
    ).drop("__idx")


def merge_intervals(
    df: DataFrame,
    *,
    keys: list[str],
    start_col: str,
    end_col: str,
    count_alias: str = "n_rows",
) -> DataFrame:
    """Merge transitively overlapping-or-touching intervals per key into
    maximal intervals — the gaps-and-islands coalescing every temporal
    schema eventually needs (uptime stitching, session coverage, validity
    windows after a merge of sources).

    ``start_col``/``end_col`` are epoch-micros longs (callers with
    timestamps convert via ``unix_micros``; half-open ``[start, end)``
    semantics, with touching intervals ``[a,b) + [b,c)`` merged). The
    classic shape:

        running_max_end = max(end) over (keys ORDER BY start, end,
                                         ROWS UNBOUNDED PRECEDING .. 1 PRECEDING)
        new_island      = start > running_max_end (or first row)
        island_id       = running sum of new_island
        group by (keys, island_id) -> min(start), max(end), count

    Scale shape: ONE shuffle on the keys — both windows sort once on
    (keys, start, end), and the final groupBy on (keys, island) is
    satisfied by the keys hash partitioning (a hash on a subset of the
    grouping columns co-locates every island), so Catalyst plans no
    second exchange. All arithmetic is long micros: the island decision
    is an integer comparison, so two engines can never disagree on a
    merge by a float last bit. Ties on identical (start, end) rows are
    order-insensitive: whichever duplicate sorts first yields the same
    island boundaries.
    """
    w_prev = (
        Window.partitionBy(*keys)
        .orderBy(F.col(start_col).asc(), F.col(end_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy(*keys)
        .orderBy(F.col(start_col).asc(), F.col(end_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn("__pmax", F.max(F.col(end_col)).over(w_prev)).withColumn(
        "__new",
        F.when(
            F.col("__pmax").isNull() | (F.col(start_col) > F.col("__pmax")), F.lit(1)
        ).otherwise(F.lit(0)),
    )
    islands = flagged.withColumn("__island", F.sum("__new").over(w_run))
    return (
        islands.groupBy(*keys, "__island")
        .agg(
            F.min(start_col).alias("interval_start"),
            F.max(end_col).alias("interval_end"),
            F.count(F.lit(1)).alias(count_alias),
        )
        .drop("__island")
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_ts: Column,
    right_ts: Column,
    lower: Column,
    upper: Column,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """Per left row: count of right rows on the same keys with
    ``lower <= right_ts - left_ts < upper`` (both Columns in seconds
    converted by the caller). Equi-keys bound the join fan-out; the range
    predicate is applied post-join, which is the right plan when keys are
    selective. For key-free or hot-key range joins, bucketize time into
    the key instead.
    """
    _reject_reserved(left, ("__mult", "__chunk", "__i"), "left")
    _reject_reserved(right, ("__mult", "__chunk", "__i"), "right")
    l = left.alias("l")
    r = right.alias("r")
    key_cond = None
    for k in keys:
        c = F.col(f"l.{k}") == F.col(f"r.{k}")
        key_cond = c if key_cond is None else key_cond & c
    delta = _micros(right_ts) - _micros(left_ts)
    # long arithmetic: int32 seconds * 1e6 overflows ANSI int beyond +/-2147s
    us = F.lit(1_000_000).cast("long")
    cond = (
        key_cond
        & (delta >= lower.cast("long") * us)
        & (delta < upper.cast("long") * us)
    )
    # Duplicate-left handling must be DETERMINISTIC: fully-duplicate left
    # rows have identical keys/ts and therefore identical counts, so we
    # collapse them before the join (carrying an exact multiplicity) and
    # re-expand after. An earlier draft tagged rows with
    # monotonically_increasing_id and grouped by that id — but the id is
    # a downstream SHUFFLE KEY, and a map-task recompute after a fetch
    # failure can re-draw DIFFERENT ids (shuffle-read order is not
    # deterministic), splitting or merging groups mid-aggregation.
    # Content-derived grouping is recompute-stable; GROUP BY's null-safe
    # equality also handles NULL-bearing left rows exactly.
    ldist = left.groupBy(*left.columns).agg(
        F.count(F.lit(1)).cast("long").alias("__mult")
    )
    l = ldist.alias("l")
    joined = l.join(r, cond, "left")
    group_cols = [F.col(f"l.{c}") for c in left.columns] + [F.col("l.__mult")]
    counted = joined.groupBy(*group_cols).agg(
        F.count(F.col(f"r.{keys[0]}")).alias(count_alias)
    )
    return _expand_multiplicity(counted)


#: chunk width for multiplicity re-expansion: bounds the materialized
#: sequence() array to 64 Ki longs (512 KiB) per generated row batch.
_MULT_CHUNK = 1 << 16


def _reject_reserved(df: DataFrame, reserved: tuple[str, ...], side: str) -> None:
    """Fail LOUDLY if an input frame already carries one of the
    operator's internal working columns (``__mult`` etc.) — a caller
    column named ``__mult`` would silently corrupt the multiplicity
    expansion instead of erroring (ADVICE r8). Consistent with the
    operators' other loud-failure validations (e.g.
    ``interval_overlap_join``'s column-collision check)."""
    clash = [c for c in df.columns if c in reserved]
    if clash:
        raise ValueError(
            f"{side} frame carries reserved internal column(s) {clash}; "
            "rename them before calling (reserved: " + ", ".join(reserved) + ")"
        )


def _expand_multiplicity(counted: DataFrame) -> DataFrame:
    """Re-expand a collapsed-duplicates frame (``__mult`` copies of each
    row) back to one output row per original input row.

    Two-level explode, not ``explode(sequence(1, __mult))``: a single
    sequence materializes an 8-byte-per-element array sized to the
    multiplicity IN ONE TASK — a hot fully-duplicate row with 100M
    copies would allocate ~800 MB (and sequence() hard-fails past 2^31
    elements), exactly in the skew regime these operators target. The
    outer explode walks ``ceil(mult / 2^16)`` chunk ids and the inner
    explode generates at most 2^16 elements per chunk, so peak array
    memory is 512 KiB regardless of multiplicity. The expansion still
    runs inside the one task that owns the collapsed row (no shuffle is
    added to spread it — output-row COUNT is inherent to the semantics;
    only the allocation hazard is removed).
    """
    chunk = F.lit(_MULT_CHUNK).cast("long")
    n_chunks = F.expr(f"(__mult + {_MULT_CHUNK} - 1) div {_MULT_CHUNK}")
    out = (
        counted.withColumn(
            "__chunk",
            F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)),
        )
        .withColumn(
            "__i",
            F.explode(
                F.sequence(
                    F.lit(1).cast("long"),
                    F.least(chunk, F.col("__mult") - F.col("__chunk") * chunk),
                )
            ),
        )
    )
    return out.drop("__mult", "__chunk", "__i")


def bucketed_range_join_count(
    left: DataFrame,
    right: DataFrame,
    *,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    bucket_seconds: int | None = None,
    count_alias: str = "n_in_range",
) -> DataFrame:
    """KEY-FREE range join via time-bucket blocking — the scale path
    ``range_join_count``'s docstring names for hot-key/no-key cases,
    made real: per left row, count right rows with
    ``lower <= right_ts - left_ts < upper`` (seconds) with NO equi-key.

    A naive key-free inequality join is a cartesian product (Spark plans
    BroadcastNestedLoopJoin — quadratic work however it executes). The
    blocking trick turns it into an equi-join: right rows hash into
    ``bucket_seconds``-wide time buckets; each left row explodes to the
    2-3 bucket ids its window [ts+lower, ts+upper) can overlap
    (``sequence`` over bucket bounds — JVM-side); the join is then a
    plain integer-key shuffle join, and the exact range predicate prunes
    within the bucket pairs. Work scales with TRUE pair density x
    window/bucket ratio, never |L| x |R|.

    ``bucket_seconds`` defaults to the window span, so each left row
    explodes to at most 2 buckets (window spans two adjacent buckets at
    most) — the fan-out/selectivity sweet spot unless the span is huge.
    All arithmetic is micros-in-long (the ANSI int32 hazard) and counts
    are exact integers, so the cross-engine oracle contract is ULP-free.
    """
    if upper_seconds <= lower_seconds:
        raise ValueError("need lower_seconds < upper_seconds")
    _reject_reserved(
        left, ("__mult", "__chunk", "__i", "__lus", "__rus", "__b"), "left"
    )
    _reject_reserved(
        right, ("__mult", "__chunk", "__i", "__lus", "__rus", "__b"), "right"
    )
    span = upper_seconds - lower_seconds
    w = int(bucket_seconds) if bucket_seconds is not None else span
    if w <= 0:
        raise ValueError("bucket_seconds must be positive")
    us = F.lit(1_000_000).cast("long")
    w_us = F.lit(w).cast("long") * us
    lo_us = F.lit(lower_seconds).cast("long") * us
    up_us = F.lit(upper_seconds).cast("long") * us

    # Deterministic duplicate-left handling (see range_join_count): exact
    # duplicate left rows have identical counts, so collapse them before
    # the join with a multiplicity and re-expand after — never a
    # monotonically_increasing_id group key, which is a nondeterministic
    # shuffle key (recompute hazard).
    ldist = left.groupBy(*left.columns).agg(
        F.count(F.lit(1)).cast("long").alias("__mult")
    )
    l = ldist.withColumn("__lus", _micros(F.col(left_ts)))
    # window [lus+lo, lus+up): overlapped buckets, floor-div in long
    first_b = F.floor((F.col("__lus") + lo_us) / w_us).cast("long")
    last_b = F.floor((F.col("__lus") + up_us - 1) / w_us).cast("long")
    # NULL left_ts: sequence(NULL, NULL) is NULL and explode would DROP
    # the row entirely — but the contract (and the keyed
    # range_join_count, and the SQL correlated-subquery oracle shape)
    # keeps such rows with count 0. A single NULL bucket preserves the
    # row through the explode; a NULL join key then matches nothing
    # (SQL equality), so the left join yields exactly one null-partner
    # row that counts 0.
    buckets = F.when(
        F.col("__lus").isNull(), F.array(F.lit(None).cast("long"))
    ).otherwise(F.sequence(first_b, last_b))
    l_exp = l.withColumn("__b", F.explode(buckets))
    r = right.select(
        _micros(F.col(right_ts)).alias("__rus")
    ).withColumn("__b", F.floor(F.col("__rus") / w_us).cast("long"))

    delta = F.col("__rus") - F.col("__lus")
    # LEFT join per bucket so a zero-match left row still reaches the
    # aggregate (no id-keyed join-back needed); the range predicate moves
    # into a conditional count so bucket-matched-but-out-of-range rows
    # count as 0 instead of deleting the left row.
    joined = l_exp.join(r, "__b", "left")
    in_range = F.when(
        F.col("__rus").isNotNull() & (delta >= lo_us) & (delta < up_us), 1
    ).otherwise(0)
    counted = joined.groupBy(*left.columns, "__mult").agg(
        F.sum(in_range).cast("long").alias(count_alias)
    )
    return _expand_multiplicity(counted)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    *,
    keys: list[str],
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Interval-x-interval OVERLAP join (half-open semantics): all
    (left, right) pairs on the same keys whose INTERSECTION is
    non-empty — ``max(starts) < min(ends)``, i.e. ``overlap_us >= 1``
    always holds in the output — plus the exact ``overlap_us`` length:
    the primitive behind ad attribution windows, outage-overlap
    analysis, and concurrent-session audits. Empty intervals
    (``end <= start``) are dropped: ``[t, t)`` is the empty set and
    intersects nothing under half-open semantics (the naive
    ``l.start < r.end AND r.start < l.end`` predicate wrongly admits
    pairs where an empty interval sits strictly inside the other;
    the oracle mirrors the max/min form).

    The naive form is a non-equi theta join (nested loop per key at
    best). Scale shape here: each interval EXPLODES to the fixed-width
    time buckets it covers (``sequence`` of bucket ids — pure codegen),
    candidates come from the (keys, bucket) EQUI-join, and each pair is
    emitted in exactly ONE bucket — the FIRST bucket both sides share,
    ``greatest(b0_left, b0_right)`` — so multi-bucket pairs need no
    ``distinct`` (which would both add a full-width shuffle and
    collapse genuinely duplicate input rows into set semantics; this
    operator preserves BAG semantics, duplicates in = duplicate pairs
    out, exactly like the theta-join spec). Same bucket-join
    discipline as ``range_join_count`` extended to interval pairs.

    Left and right must not share non-key column names (the four
    boundary columns included) — validated, since post-join references
    would be ambiguous; pre-rename one side.

    ``bucket_us`` tunes the explode-vs-collision trade-off: buckets
    near the median interval length keep both the per-interval fan-out
    (``len/bucket + 1`` rows) and the per-bucket collision volume
    small. A pathologically long interval costs its bucket count in
    exploded rows — cap interval lengths upstream or raise
    ``bucket_us`` for long-interval workloads.

    Timestamps are integer MICROSECOND columns (callers convert with
    ``unix_micros``; the registry gate does) — integer bucket math is
    exact and engine-portable, per the portable doctrine's ban on
    raw-timestamp arithmetic.
    """
    shared = (set(left.columns) & set(right.columns)) - set(keys)
    if shared:
        raise ValueError(
            f"left/right share non-key columns {sorted(shared)}; rename one "
            "side (post-join references would be ambiguous)"
        )

    def bucketed(df: DataFrame, start: str, end: str, side: str) -> DataFrame:
        b0 = F.floor(F.col(start) / F.lit(int(bucket_us))).cast("long")
        # half-open end: an interval ending exactly on a bucket edge
        # does not occupy the next bucket
        b1 = F.floor((F.col(end) - 1) / F.lit(int(bucket_us))).cast("long")
        # empty/negative intervals are DROPPED before the explode:
        # b1 < b0 would otherwise make sequence() count DOWNWARD and
        # fabricate buckets for an interval that covers nothing
        return (
            df.filter(F.col(end) > F.col(start))
            .withColumn(f"__{side}b0", b0)
            .withColumn(f"__{side}bkt", F.explode(F.sequence(b0, b1)))
        )

    lb = bucketed(left, left_start, left_end, "l")
    rb = bucketed(right, right_start, right_end, "r")
    cond = [lb[k] == rb[k] for k in keys] + [lb["__lbkt"] == rb["__rbkt"]]
    overlap = F.least(F.col(left_end), F.col(right_end)) - F.greatest(
        F.col(left_start), F.col(right_start)
    )
    # emit each pair in its FIRST shared bucket only — overlapping
    # intervals both cover the bucket of max(starts), whose id is
    # greatest(b0_l, b0_r), so the equality keeps exactly one copy per
    # pair with no distinct; the max(starts) < min(ends) filter IS
    # "intersection non-empty" (overlap_us >= 1 on every output row)
    return (
        lb.join(rb, cond)
        .filter(F.col("__lbkt") == F.greatest(F.col("__lb0"), F.col("__rb0")))
        .filter(overlap > 0)
        .drop("__lbkt", "__rbkt", "__lb0", "__rb0")
        .drop(*[rb[k] for k in keys])
        .withColumn("overlap_us", overlap.cast("long"))
    )
