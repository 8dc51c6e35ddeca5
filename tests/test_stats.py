"""Integer-exact distribution/outlier statistics operators."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
    equi_width_histogram,
    rolling_anomaly,
)

T = dt.datetime


def test_rolling_anomaly_flags_planted_outlier(spark):
    # 40 calm points at ~10.0 then one spike at 100.0: the spike must
    # flag; calm points must not; nothing flags before min_points.
    base = T(2024, 1, 1)
    rows = [(i, "k", base + dt.timedelta(seconds=i), 10.0 + (i % 5) * 0.1)
            for i in range(40)]
    rows.append((40, "k", base + dt.timedelta(seconds=40), 100.0))
    rows += [(41 + i, "k", base + dt.timedelta(seconds=41 + i), 10.2)
             for i in range(5)]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp, value double")
    out = rolling_anomaly(
        df, keys=["k"], order_by=["ts", "event_id"], value_col="value",
        window_rows=100, min_points=30, n_sigma=3,
    )
    flagged = [r["event_id"] for r in out.filter(F.col("is_anomaly")).collect()]
    assert flagged == [40]
    # early rows (window < min_points) never flag even if deviant
    early = out.filter(F.col("w_n") < 30).filter(F.col("is_anomaly")).count()
    assert early == 0
    # integer evidence is exact: w_sum of the first row == its own value
    first = out.orderBy("event_id").first()
    assert first["w_n"] == 1 and first["w_sum"] == 10000

    with pytest.raises(ValueError):
        rolling_anomaly(df, keys=["k"], order_by=["ts"], value_col="value",
                        min_points=1)


def test_rolling_anomaly_constant_series_never_flags(spark):
    # zero variance: var term is 0, deviation is 0 -> 0 > 0 false.
    rows = [(i, "k", T(2024, 1, 1) + dt.timedelta(seconds=i), 5.0) for i in range(50)]
    df = spark.createDataFrame(rows, "event_id long, k string, ts timestamp, value double")
    out = rolling_anomaly(df, keys=["k"], order_by=["ts", "event_id"],
                          value_col="value")
    assert out.filter(F.col("is_anomaly")).count() == 0


def test_histogram_bins_cover_range_and_count(spark):
    df = spark.createDataFrame([(float(i),) for i in range(100)], "v double")
    out = equi_width_histogram(df, value_col="v", n_bins=10).collect()
    assert len(out) == 10
    assert sum(r["n"] for r in out) == 100
    assert [r["n"] for r in out] == [10] * 10
    # bounds tile the scaled range exactly: lo of bin 0 == min, hi of
    # bin 9 == max, no gaps between consecutive bins
    assert out[0]["lo"] == 0 and out[-1]["hi"] == 9900
    for a, b in zip(out, out[1:]):
        assert b["lo"] == a["hi"] + 1

    # a value exactly on every bin edge cannot double-count or vanish
    edge = equi_width_histogram(
        spark.createDataFrame([(0.0,), (5.0,), (10.0,)], "v double"),
        value_col="v", n_bins=2,
    ).collect()
    assert sum(r["n"] for r in edge) == 3

    single = equi_width_histogram(
        spark.createDataFrame([(7.0,), (7.0,)], "v double"), value_col="v", n_bins=5
    ).collect()
    assert len(single) == 1 and single[0]["n"] == 2

    with pytest.raises(ValueError):
        equi_width_histogram(df, value_col="v", n_bins=0)


def test_fd_profile_detects_violations(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import fd_profile

    t = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 10), (2, "b", 20), (2, "c", 20), (3, "a", 30)],
        "k long, v string, z long",
    )
    out = fd_profile([
        ("t.k->v", t, "k", "v"),      # k=2 maps to b AND c -> one violation
        ("t.k->z", t, "k", "z"),      # holds
    ])
    rows = {r["relation"]: (r["n_lhs"], r["n_violating_lhs"], r["max_rhs_per_lhs"]) for r in out.collect()}
    assert rows["t.k->v"] == (3, 1, 2)
    assert rows["t.k->z"] == (3, 0, 1)


def test_fd_profile_null_rhs_counts_as_value(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import fd_profile

    t = spark.createDataFrame(
        [(1, "a"), (1, None), (2, None), (2, None)], "k long, v string"
    )
    out = fd_profile([("t.k->v", t, "k", "v")])
    r = out.collect()[0]
    # NULL is one distinct rhs: k=1 -> {a, NULL} violates; k=2 -> {NULL} holds
    assert (r["n_lhs"], r["n_violating_lhs"], r["max_rhs_per_lhs"]) == (2, 1, 2)
