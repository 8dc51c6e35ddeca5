"""grouped_quantiles_scalable: the exact rank-select quantile path
(round 14) — identical results to the collect_list form on every
corpus, one-exchange plan, discrete lower-rank contract by hand."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
    grouped_quantiles_scalable,
)
from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES


def test_matches_collect_list_gate_on_fixture(spark):
    sf = "/root/testdata/sf0.001"
    a = sorted(
        tuple(r) for r in SPARK_QUERIES["percentiles"](spark, sf).collect()
    )
    b = sorted(
        tuple(r)
        for r in SPARK_QUERIES["percentiles_scalable"](spark, sf).collect()
    )
    assert len(a) == len(b) > 0
    assert a == b


def test_handworked_lower_rank_and_ties(spark):
    # group g: values 1..10 -> ranks p25=(9)//4=2 -> 3, p50=4 -> 5,
    # p75=27//4=6 -> 7, p90=81//10=8 -> 9
    rows = [("g", float(v)) for v in range(1, 11)]
    # group h: all-equal values (ties) — every quantile is 7.0
    rows += [("h", 7.0)] * 5
    # group s: singleton — every rank is 0
    rows += [("s", 42.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    out = {
        r["k"]: r
        for r in grouped_quantiles_scalable(df, ["k"], "value").collect()
    }
    g = out["g"]
    assert (g["n"], g["p25"], g["p50"], g["p75"], g["p90"]) == (10, 3.0, 5.0, 7.0, 9.0)
    h = out["h"]
    assert (h["n"], h["p25"], h["p50"], h["p75"], h["p90"]) == (5, 7.0, 7.0, 7.0, 7.0)
    s = out["s"]
    assert (s["n"], s["p25"], s["p50"], s["p75"], s["p90"]) == (1, 42.0, 42.0, 42.0, 42.0)


def test_null_values_excluded_and_all_null_group_vanishes(spark):
    # review r14a #2: collect_list drops NULLs, row_number ranked them,
    # DuckDB list() keeps them — the contract now EXCLUDES null values
    # explicitly: n counts non-null only, ranks run over non-null only,
    # an all-NULL group disappears.
    rows = [("g", None), ("g", 10.0), ("g", 20.0), ("g", 30.0), ("z", None)]
    df = spark.createDataFrame(rows, "k string, value double")
    out = {
        r["k"]: r
        for r in grouped_quantiles_scalable(df, ["k"], "value").collect()
    }
    assert "z" not in out
    g = out["g"]
    # ranks over [10, 20, 30]: p25 -> (2*1) div 4 = 0, p50 -> 1,
    # p75 -> (2*3) div 4 = 1, p90 -> (2*9) div 10 = 1
    assert (g["n"], g["p25"], g["p50"], g["p75"], g["p90"]) == (3, 10.0, 20.0, 20.0, 20.0)


def test_single_exchange_plan(spark):
    df = spark.range(1000).select(
        (F.col("id") % 7).cast("string").alias("k"),
        (F.col("id") * 13 % 101).cast("double").alias("value"),
    )
    plan = grouped_quantiles_scalable(
        df, ["k"], "value"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1
    assert "collect_list" not in plan


def test_build_time_validation_of_quantile_spec():
    # ADVICE r14 #2: empty quantiles left the rank filter None
    # (opaque filter(None) error) and den<1 div-by-zeroed inside the
    # SQL expr at run time — both now fail at build time, pre-Spark
    # (df=None proves no session is touched).
    import pytest

    with pytest.raises(ValueError, match="at least one"):
        grouped_quantiles_scalable(None, ["k"], "value", quantiles=())
    with pytest.raises(ValueError, match="denominators"):
        grouped_quantiles_scalable(
            None, ["k"], "value", quantiles=((1, 0, "p0"),)
        )


def test_skew_variant_matches_on_dominant_group_fixture(spark):
    """VERDICT r14 #2's done-condition: result identity between the
    skew decomposition and the sibling (which shares SQL_PERCENTILES)
    on a fixture where one group holds 90% of the rows."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        grouped_quantiles_skewed,
    )

    df = spark.range(50_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise((F.col("id") % 10).cast("string"))
        .alias("k"),
        ((F.col("id") * 2654435761 % 1000003) / 7.0).alias("value"),
    )
    a = sorted(tuple(r) for r in grouped_quantiles_scalable(df, ["k"], "value").collect())
    b = sorted(tuple(r) for r in grouped_quantiles_skewed(df, ["k"], "value").collect())
    assert a == b
    assert len(a) == 2  # 'hot' (90%) + '9'


def test_skew_variant_nulls_and_gate_parity(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        grouped_quantiles_skewed,
    )

    rows = [("g", None), ("g", 10.0), ("g", 20.0), ("g", 30.0), ("z", None)]
    df = spark.createDataFrame(rows, "k string, value double")
    out = {r["k"]: r for r in grouped_quantiles_skewed(df, ["k"], "value").collect()}
    assert "z" not in out
    g = out["g"]
    assert (g["n"], g["p25"], g["p50"], g["p75"], g["p90"]) == (3, 10.0, 20.0, 20.0, 20.0)
    # gate parity on the real fixture: third plan, same rows
    sf = "/root/testdata/sf0.001"
    a = sorted(tuple(r) for r in SPARK_QUERIES["percentiles"](spark, sf).collect())
    c = sorted(tuple(r) for r in SPARK_QUERIES["percentiles_skew"](spark, sf).collect())
    assert a == c


def test_skew_variant_hot_sort_is_partitioned(spark):
    """The point of the variant: the dominant group's window sort must
    be PARTITIONED by (keys, bucket), never by keys alone — a
    keys-only sort partition is exactly the serialization the plan
    exists to remove. The offset window runs over the tiny per-bucket
    count relation, so its keys-only partitioning is fine; assert the
    row_number window (the corpus-scale one) carries the bucket."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        grouped_quantiles_skewed,
    )

    df = spark.range(1000).select(
        F.lit("hot").alias("k"),
        (F.col("id") * 13 % 101).cast("double").alias("value"),
    )
    plan = (
        grouped_quantiles_skewed(df, ["k"], "value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re

    rn_windows = [
        ln for ln in plan.splitlines() if "row_number()" in ln
    ]
    assert rn_windows and all("__bkt" in ln for ln in rn_windows), rn_windows


def test_skew_variant_keeps_null_group_keys(spark):
    """Round-15 review fix: a NULL grouping key is a real group —
    PARTITION BY (both engines) and groupBy treat it as one; the skew
    variant's bounds/offsets joins must be null-safe or the group
    silently vanishes."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        grouped_quantiles_skewed,
    )

    rows = [(None, 1.0), (None, 2.0), (None, 3.0), ("a", 5.0)]
    df = spark.createDataFrame(rows, "k string, value double")
    a = sorted(
        (tuple(r) for r in grouped_quantiles_scalable(df, ["k"], "value").collect()),
        key=str,
    )
    b = sorted(
        (tuple(r) for r in grouped_quantiles_skewed(df, ["k"], "value").collect()),
        key=str,
    )
    assert a == b
    assert len(a) == 2 and any(r[0] is None for r in a)


def test_skew_variant_survives_nan_and_infinity(spark):
    """Round-15 review fix: one NaN anywhere used to kill the whole
    job with ANSI CAST_OVERFLOW (round(v*scale).cast('long')); the
    clamped bucket key keeps NaN/Inf monotone at the extremes and the
    raw-value ranking matches the sibling."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        grouped_quantiles_skewed,
    )

    rows = [
        ("g", float("nan")), ("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0),
        ("h", float("inf")), ("h", float("-inf")), ("h", 0.0),
    ]
    df = spark.createDataFrame(rows, "k string, value double")
    a = sorted(
        str(tuple(r))
        for r in grouped_quantiles_scalable(df, ["k"], "value").collect()
    )
    b = sorted(
        str(tuple(r))
        for r in grouped_quantiles_skewed(df, ["k"], "value").collect()
    )
    assert a == b
