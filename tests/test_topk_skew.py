"""grouped_topk_skew: exact per-group top-k on the dominant-group
bucket decomposition (round 15) — identity with the naive partitioned
window, NULL contract, candidate bound, sharded-sort plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators.relational import grouped_topk_skew


def _naive(df, keys, value_col, tiebreak, k):
    order = [F.col(value_col).desc()] + [F.col(c).asc() for c in tiebreak]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.filter(F.col(value_col).isNotNull())
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
    )


def test_matches_naive_window_on_dominant_group_fixture(spark):
    df = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise((F.col("id") % 10).cast("string"))
        .alias("k"),
        F.col("id").alias("event_id"),
        ((F.col("id") * 2654435761 % 1000003) / 7.0).alias("value"),
    )
    a = sorted(
        tuple(r)
        for r in _naive(df, ["k"], "value", ["event_id"], 7)
        .select("k", "event_id", "value", "rk")
        .collect()
    )
    b = sorted(
        tuple(r)
        for r in grouped_topk_skew(
            df, keys=["k"], value_col="value", tiebreak=["event_id"], k=7
        )
        .select("k", "event_id", "value", "rk")
        .collect()
    )
    assert a == b and len(a) == 2 * 7


def test_ties_and_nulls(spark):
    # equal values resolved by tiebreak; NULL values never ranked
    rows = [
        ("g", 1, 5.0), ("g", 2, 5.0), ("g", 3, 5.0), ("g", 4, None),
        ("g", 5, 9.0), ("z", 6, None),
    ]
    df = spark.createDataFrame(rows, "k string, event_id int, value double")
    out = grouped_topk_skew(
        df, keys=["k"], value_col="value", tiebreak=["event_id"], k=3
    )
    got = sorted((r["k"], r["event_id"], r["rk"]) for r in out.collect())
    # group g order: 9.0 (id 5), then the 5.0 ties by id asc (1, 2)
    assert got == [("g", 1, 2), ("g", 2, 3), ("g", 5, 1)]


def test_k_larger_than_group(spark):
    rows = [("g", 1, 1.0), ("g", 2, 2.0)]
    df = spark.createDataFrame(rows, "k string, event_id int, value double")
    out = grouped_topk_skew(
        df, keys=["k"], value_col="value", tiebreak=["event_id"], k=10
    )
    assert out.count() == 2


def test_build_time_validation():
    with pytest.raises(ValueError, match="grouping key"):
        grouped_topk_skew(None, keys=[], value_col="v", tiebreak=[], k=1)
    with pytest.raises(ValueError, match="k >= 1"):
        grouped_topk_skew(None, keys=["a"], value_col="v", tiebreak=[], k=0)
    with pytest.raises(ValueError, match="n_buckets"):
        grouped_topk_skew(
            None, keys=["a"], value_col="v", tiebreak=[], k=1, n_buckets=1
        )


def test_corpus_scale_sort_carries_bucket(spark):
    """Both windows exist, but only the candidate one touches corpus
    rows — assert the FIRST row_number window (bottom of the plan) is
    partitioned by (keys, bucket). The final window runs over <= B*k
    rows per group by construction (local-rank filter precedes it)."""
    df = spark.range(1000).select(
        F.when(F.col("id") % 100 < 99, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("event_id"),
        (F.col("id") * 13 % 101).cast("double").alias("value"),
    )
    plan = (
        grouped_topk_skew(df, keys=["k"], value_col="value", tiebreak=["event_id"], k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    rn = [
        ln
        for ln in plan.splitlines()
        if "row_number()" in ln and "windowspecdefinition" in ln
    ]
    assert len(rn) == 2
    # plan prints top-down: the LAST row_number window line is the
    # deepest (corpus-scale local window) — it must carry the bucket
    assert "__bkt" in rn[-1], rn[-1]
    # the final window ranks the bounded candidates by keys alone
    assert "__bkt" not in rn[0], rn[0]
    # Spark 3.5 rewrites both rank<=k filters into WindowGroupLimit
    # (bounded per-partition top-k heaps, no full sort) — keep that
    # optimization pinned; losing it silently re-inflates the shuffle
    assert plan.count("WindowGroupLimit") >= 2, plan.count("WindowGroupLimit")
    assert "__lr" in plan


def test_null_group_key_is_a_group(spark):
    """Round-15 review fix: row_number() OVER (PARTITION BY k) ranks
    NULL-key rows as their own partition; the bucket decomposition's
    bounds join must be null-safe to match."""
    rows = [(None, 1, 1.0), (None, 2, 2.0), ("a", 3, 5.0)]
    df = spark.createDataFrame(rows, "k string, event_id int, value double")
    a = sorted(
        (
            (r["k"], r["event_id"], r["rk"])
            for r in _naive(df, ["k"], "value", ["event_id"], 2)
            .select("k", "event_id", "rk")
            .collect()
        ),
        key=str,
    )
    b = sorted(
        (
            (r["k"], r["event_id"], r["rk"])
            for r in grouped_topk_skew(
                df, keys=["k"], value_col="value", tiebreak=["event_id"], k=2
            ).collect()
        ),
        key=str,
    )
    assert a == b and len(b) == 3


def test_nan_and_infinity_match_naive_window(spark):
    """Round-15 review fix: NaN/Inf clamp into the extreme buckets
    instead of raising CAST_OVERFLOW; ranking is by the raw value, so
    NaN ranks first under DESC (Spark's double order: NaN > +Inf)."""
    rows = [
        ("g", 1, float("nan")), ("g", 2, float("inf")),
        ("g", 3, float("-inf")), ("g", 4, 1.0), ("g", 5, 2.0),
    ]
    df = spark.createDataFrame(rows, "k string, event_id int, value double")
    a = sorted(
        (r["k"], r["event_id"], r["rk"])
        for r in _naive(df, ["k"], "value", ["event_id"], 3)
        .select("k", "event_id", "rk")
        .collect()
    )
    b = sorted(
        (r["k"], r["event_id"], r["rk"])
        for r in grouped_topk_skew(
            df, keys=["k"], value_col="value", tiebreak=["event_id"], k=3
        ).collect()
    )
    assert a == b
    assert ("g", 1, 1) in b  # NaN outranks +Inf under DESC
