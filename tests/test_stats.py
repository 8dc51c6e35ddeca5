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
    # floored at the power-of-two scale (10.0 * 1024)
    first = out.orderBy("event_id").first()
    assert first["w_n"] == 1 and first["w_sum"] == 10240

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


def test_rolling_anomaly_chunked_equals_exact_on_dense_data(spark):
    import datetime as dt

    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        rolling_anomaly,
        rolling_anomaly_chunked,
    )

    # 400 events per key over 4 days; window 20 << ~100 rows/day-chunk
    rows = []
    for k in ("a", "b"):
        for i in range(400):
            ts = dt.datetime(2024, 1, 1) + dt.timedelta(minutes=14 * i)
            val = 100.0 + (i % 7) + (500.0 if i in (123, 300) else 0.0)
            rows.append((k, i, ts, val))
    df = spark.createDataFrame(rows, "k string, i long, ts timestamp, value double")
    kw = dict(value_col="value", window_rows=20, min_points=10, n_sigma=3)
    exact = rolling_anomaly(df, keys=["k"], order_by=["ts", "i"], **kw)
    chunked = rolling_anomaly_chunked(
        df, keys=["k"], ts_col="ts", tiebreak=["i"], chunk_seconds=86400, **kw
    )
    cols = ["k", "i", "w_n", "w_sum", "w_sumsq", "is_anomaly"]
    a = sorted(tuple(r[c] for c in cols) for r in exact.select(cols).collect())
    b = sorted(tuple(r[c] for c in cols) for r in chunked.select(cols).collect())
    assert a == b  # dense chunks -> bit-identical decisions
    assert any(t[-1] for t in a)  # the planted outliers are flagged


def test_rolling_anomaly_chunked_sparse_chunk_shortens_window_only(spark):
    import datetime as dt

    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        rolling_anomaly_chunked,
    )

    # day-1 has 2 rows (< window 5): day-2's early rows see a SHORTER
    # history (2 carried rows), never wrong sums
    rows = [("a", 0, dt.datetime(2024, 1, 1, 1), 1.0), ("a", 1, dt.datetime(2024, 1, 1, 2), 2.0)]
    rows += [("a", 10 + i, dt.datetime(2024, 1, 2, i + 1), 3.0 + i) for i in range(4)]
    df = spark.createDataFrame(rows, "k string, i long, ts timestamp, value double")
    out = rolling_anomaly_chunked(
        df, keys=["k"], ts_col="ts", tiebreak=["i"], value_col="value",
        window_rows=5, min_points=2, n_sigma=3, chunk_seconds=86400,
    )
    got = {r["i"]: (r["w_n"], r["w_sum"]) for r in out.collect()}
    # first day-2 row: 2 carried + itself = 3 rows, floor-scaled at the
    # power-of-two default (1024*1 + 1024*2 + 1024*3)
    assert got[10] == (3, 6 * 1024)
    # window caps at 5 as rows accumulate
    assert got[13] == (5, (2 + 3 + 4 + 5 + 6) * 1024)


def test_event_pattern_match_semantics(spark):
    import datetime as dt

    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import tempfile, os

    T = dt.datetime
    rows = [
        # user 1: v c p clean -> match
        (1, T(2024, 1, 1, 1), 1, "view", 0.0, "{}"),
        (2, T(2024, 1, 1, 2), 1, "click", 0.0, "{}"),
        (3, T(2024, 1, 1, 3), 1, "purchase", 0.0, "{}"),
        # user 2: error between click and purchase -> no match
        (4, T(2024, 1, 1, 1), 2, "view", 0.0, "{}"),
        (5, T(2024, 1, 1, 2), 2, "click", 0.0, "{}"),
        (6, T(2024, 1, 1, 3), 2, "error", 0.0, "{}"),
        (7, T(2024, 1, 1, 4), 2, "purchase", 0.0, "{}"),
        # user 3: purchase next day -> day cut separates, no match
        (8, T(2024, 1, 1, 23), 3, "view", 0.0, "{}"),
        (9, T(2024, 1, 1, 23, 30), 3, "click", 0.0, "{}"),
        (10, T(2024, 1, 2, 1), 3, "purchase", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = SPARK_QUERIES["event_pattern"](spark, d)
        got = {(r["user_id"], r["day"]): (r["matched"], r["first_match"]) for r in out.collect()}
    assert got[(1, 19723)] == (True, "vcp")
    assert got[(2, 19723)][0] is False
    assert got[(3, 19723)][0] is False  # purchase fell into the next day
    assert got[(3, 19724)][0] is False


def test_winsorize_clip_semantics(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import tempfile, os

    # 20 orders in one segment, values 1..19 plus an extreme 1000:
    # p05 = sorted[(19)//20]=sorted[0]=1 (0-idx) -> lo = 100 cents... use cents
    vals = list(range(1, 20)) + [1000]
    orders = spark.createDataFrame(
        [(i, i % 3, "O", float(v), None, "P") for i, v in enumerate(vals)],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    cust = spark.createDataFrame(
        [(0, "C0", 0, 0.0, "SEG"), (1, "C1", 0, 0.0, "SEG"), (2, "C2", 0, 0.0, "SEG")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    with tempfile.TemporaryDirectory() as d:
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        cust.write.parquet(os.path.join(d, "customer.parquet"))
        out = SPARK_QUERIES["winsorize"](spark, d).collect()
    assert len(out) == 1
    r = out[0]
    # rank formulas: lo = sorted[(20-1)//20] = sorted[0] = 100 cents;
    # hi = sorted[(19*19)//20] = sorted[18] = 1900 cents
    assert (r["p05_cents"], r["p95_cents"]) == (100, 1900)
    assert r["n"] == 20 and r["n_clipped_low"] == 0 and r["n_clipped_high"] == 1
    # the 1000.00 order contributes 1900 cents after clipping
    assert r["sum_winsorized_cents"] == sum(v * 100 for v in range(1, 20)) + 1900


def test_time_rollup_granularity_consistency(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import datetime as dt
    import tempfile, os

    T = dt.datetime
    rows = [
        (1, T(2024, 1, 1, 0, 10), 1, "view", 1.5, "{}"),
        (2, T(2024, 1, 1, 0, 50), 1, "view", 2.5, "{}"),
        (3, T(2024, 1, 1, 5, 0), 1, "view", 3.0, "{}"),
        (4, T(2024, 1, 2, 0, 0), 1, "view", 4.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = SPARK_QUERIES["time_rollup"](spark, d).collect()
    by = {}
    for r in out:
        by.setdefault(r["gran"], []).append(r)
    # hour buckets: (0:00 -> 2 events), (5:00 -> 1), (next day 0:00 -> 1)
    assert sorted(r["n_events"] for r in by["hour"]) == [1, 1, 2]
    # day buckets: day1 -> 3 events, day2 -> 1
    assert sorted(r["n_events"] for r in by["day"]) == [1, 3]
    # every granularity conserves total count and milli sum
    for g in ("hour", "day", "week"):
        assert sum(r["n_events"] for r in by[g]) == 4
        assert sum(r["sum_value_milli"] for r in by[g]) == 11000


def test_histogram_drift_integer_rule(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import datetime as dt
    import tempfile, os

    T = dt.datetime
    early, late = T(1994, 6, 1), T(1996, 6, 1)
    # snapshot b (early) is uniform over low values; the full table adds
    # a concentrated high-value mass -> the top bin must drift
    rows = [(i, 0, "O", 10.0 + i % 50, early, "P") for i in range(200)]
    rows += [(1000 + i, 0, "O", 500.0, late, "P") for i in range(100)]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "orders.parquet"))
        out = SPARK_QUERIES["histogram_drift"](spark, d).collect()
    by_bin = {r["bin"]: r for r in out}
    top = by_bin[max(by_bin)]
    # the 500.00 spike exists only in the full snapshot
    assert top["n_a"] == 100 and top["n_b"] == 0 and top["drifted"]
    # counts conserve
    assert sum(r["n_a"] for r in out) == 300
    assert sum(r["n_b"] for r in out) == 200


def test_grouped_mode_tie_break_and_corr_stats_exactness(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import tempfile, os

    cust = spark.createDataFrame(
        # nation 0: AUTO x2, FOOD x2 (tie -> AUTO); nation 1: FOOD x2 wins
        [(0, "C", 0, 10.0, "AUTO"), (1, "C", 0, 20.0, "AUTO"),
         (2, "C", 0, 30.0, "FOOD"), (3, "C", 0, 40.0, "FOOD"),
         (4, "C", 1, 50.0, "FOOD"), (5, "C", 1, 60.0, "FOOD"), (6, "C", 1, 70.0, "AUTO")],
        "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    )
    nation = spark.createDataFrame(
        [(0, "ALPHA", 0), (1, "BETA", 0)], "n_nationkey int, n_name string, n_regionkey int"
    )
    orders = spark.createDataFrame(
        [(1, 0, "O", 100.0, None, "P"), (2, 0, "O", 200.0, None, "P"),
         (3, 4, "O", 300.0, None, "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    with tempfile.TemporaryDirectory() as d:
        cust.write.parquet(os.path.join(d, "customer.parquet"))
        nation.write.parquet(os.path.join(d, "nation.parquet"))
        orders.write.parquet(os.path.join(d, "orders.parquet"))
        mode = {r["n_name"]: (r["modal_segment"], r["n"]) for r in SPARK_QUERIES["grouped_mode"](spark, d).collect()}
        corr = {r["c_mktsegment"]: r for r in SPARK_QUERIES["corr_stats"](spark, d).collect()}
    assert mode["ALPHA"] == ("AUTO", 2)   # tie resolved lexicographically
    assert mode["BETA"] == ("FOOD", 2)
    a = corr["AUTO"]  # custkey 0: two orders (100, 200), balance 10
    assert (a["n"], a["sum_x"], a["sum_y"]) == (2, 30000, 2000)
    # product sums are STRINGS since r7 (Σx² overflows int64 at sf0.1;
    # plain-integer stringification is the portable >64-bit rendering)
    assert a["sum_xy"] == str(10000 * 1000 + 20000 * 1000)
    assert a["sum_xx"] == str(10000**2 + 20000**2)


def test_basket_pairs_lift_and_bounds(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import tempfile, os

    # 4 orders: parts (1,2) always together; part 3 floats alone
    rows = [
        (1, 1), (1, 2),
        (2, 1), (2, 2),
        (3, 1), (3, 2), (3, 3),
        (4, 3),
    ]
    li = spark.createDataFrame(
        [(o, p, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for o, p in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(os.path.join(d, "lineitem.parquet"))
        out = {(r["pa"], r["pb"]): r for r in SPARK_QUERIES["basket_pairs"](spark, d).collect()}
    p12 = out[(1, 2)]
    assert p12["pair_orders"] == 3 and p12["c_a"] == 3 and p12["c_b"] == 3
    # lift = 3 * 4 / (3 * 3)
    assert p12["lift"] == 3 * 4 / 9
    # (1,3) co-occur once; lift below the always-together pair
    assert out[(1, 3)]["pair_orders"] == 1
    assert out[(1, 3)]["lift"] < p12["lift"]


def test_embedding_norms_monotone_contract(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import tempfile, os

    rows = [
        (1, [0.5, 0.0], 0), (2, [1.0, 0.0], 0), (3, [0.0, 0.25], 0),
        (4, [1.0, 1.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "embeddings.parquet"))
        out = {r["label"]: r for r in SPARK_QUERIES["embedding_norms"](spark, d).collect()}
    s = 1 << 20
    l0 = out[0]
    assert l0["min_nsq"] == (s // 4) ** 2          # 0.25^2 scaled
    assert l0["p50_nsq"] == (s // 2) ** 2          # 0.5^2 scaled
    assert l0["max_nsq"] == s * s                  # 1.0^2 scaled
    assert out[1]["max_nsq"] == 2 * s * s          # [1,1] -> 2


def test_ewma_dyadic_fold_is_bit_exact(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import datetime as dt
    import tempfile, os

    T = dt.datetime
    vals = [10.0, 20.0, 15.0, 17.5, 3.25]
    rows = [
        (i, T(2024, 1, 1, 0, i), 1, "view", v, "{}") for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = SPARK_QUERIES["ewma"](spark, d).collect()[0]
    # python reference fold over integer-milli doubles: bit-identical
    acc = float(round(vals[0] * 1000))
    for v in vals[1:]:
        acc = 0.5 * float(round(v * 1000)) + 0.5 * acc
    assert out["ewma_milli"] == acc  # ==, not approx: dyadic ops are exact
    assert out["n"] == 5


def test_max_concurrency_sweep_semantics(spark):
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    import datetime as dt
    import tempfile, os

    T = dt.datetime
    rows = [
        # three overlapping 5-min intervals starting a minute apart
        (1, T(2024, 1, 1, 10, 0), 1, "view", 0.0, "{}"),
        (2, T(2024, 1, 1, 10, 1), 1, "view", 0.0, "{}"),
        (3, T(2024, 1, 1, 10, 2), 1, "view", 0.0, "{}"),
        # back-to-back (end == next start): never concurrent
        (4, T(2024, 1, 1, 12, 0), 1, "click", 0.0, "{}"),
        (5, T(2024, 1, 1, 12, 5), 1, "click", 0.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(os.path.join(d, "events.parquet"))
        out = {r["event_type"]: r for r in SPARK_QUERIES["max_concurrency"](spark, d).collect()}
    v = out["view"]
    assert v["peak_concurrency"] == 3
    # peak first reached when the third interval opens (10:02)
    assert v["first_peak_us"] == int(T(2024, 1, 1, 10, 2).timestamp()) * 1_000_000
    # half-open rule: the click pair never overlaps
    assert out["click"]["peak_concurrency"] == 1


def test_choose_rolling_variant_rules():
    """The dispatch rule (VERDICT r5 #4), pinned at its measured
    boundary points: 5 keys on 32 cores goes plain at 1M rows (200k
    rows/key — bench r5 measured plain faster) and chunked at 10M rows
    (2M rows/key — bench r6 measured chunked faster)."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import choose_rolling_variant

    assert choose_rolling_variant(1_000_000, 5, 32) == ("plain", None)
    variant, chunks = choose_rolling_variant(10_000_000, 5, 32)
    assert variant == "chunked" and chunks >= 2
    # keys saturate the cluster -> plain no matter the size
    assert choose_rolling_variant(10_000_000, 64, 32) == ("plain", None)
    # huge per-key series but chunks would be tiny -> plain
    assert choose_rolling_variant(600_000, 1, 32, chunk_target_rows=10**9) == (
        "plain",
        None,
    )


def test_rolling_anomaly_auto_dispatch_and_equivalence(spark):
    """auto with forced-low cores must reproduce the chunked variant's
    rows exactly; with plentiful keys it must match plain. Both checked
    against the exact form on dense data."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        rolling_anomaly,
        rolling_anomaly_auto,
    )

    n = 4000  # 4000 rows/key: 64 auto-chosen chunks stay dense vs window 20
    rows = [
        ("a", i, 1_700_000_000 + i * 60, float((i * 37) % 100)) for i in range(n)
    ] + [("b", i, 1_700_000_000 + i * 60, float((i * 61) % 100)) for i in range(n)]
    df = spark.createDataFrame(rows, "k string, i long, ts long, value double").select(
        "k", "i", F.timestamp_seconds("ts").alias("ts"), "value"
    )
    kw = dict(value_col="value", window_rows=20, min_points=10, n_sigma=3)
    exact = rolling_anomaly(df, keys=["k"], order_by=["ts", "i"], **kw)

    # stats force the chunked path: 2 keys, huge claimed volume, real span
    lo, hi = df.agg(
        F.min(F.unix_micros("ts")), F.max(F.unix_micros("ts"))
    ).first()
    auto_chunked = rolling_anomaly_auto(
        df, keys=["k"], ts_col="ts", tiebreak=["i"], cores=32,
        stats=(2_000_000_000, 2, lo, hi), **kw
    )
    # stats force the plain path (keys saturate the claimed cores)
    auto_plain = rolling_anomaly_auto(
        df, keys=["k"], ts_col="ts", tiebreak=["i"], cores=2,
        stats=(2_000_000_000, 2, lo, hi), **kw
    )

    cols = ["k", "i", "w_n", "w_sum", "w_sumsq", "is_anomaly"]
    want = sorted(tuple(r) for r in exact.select(*cols).collect())
    got_c = sorted(tuple(r) for r in auto_chunked.select(*cols).collect())
    got_p = sorted(tuple(r) for r in auto_plain.select(*cols).collect())
    assert got_p == want
    assert got_c == want  # dense chunks -> bit-identical to exact


def test_mad_outliers_hampel_rule(spark):
    """Robust flags: a spike among constants is flagged, constants are
    not; MAD's breakdown advantage — a mean/std rule inflated by its
    own outliers misses planted spikes that Hampel catches."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import mad_outliers

    rows = [("a", i, 100.0 + (i % 3)) for i in range(60)] + [
        ("a", 100, 5000.0),
        ("a", 101, 4000.0),
        ("b", 0, 7.0),
        ("b", 1, None),  # null values excluded, not poisoned
    ]
    df = spark.createDataFrame(rows, "k string, i long, v double")
    out = {
        (r["k"], r["i"]): r
        for r in mad_outliers(df, keys=["k"], value_col="v", k=5).collect()
    }
    assert out[("a", 100)]["is_outlier"] and out[("a", 101)]["is_outlier"]
    flagged = [ki for ki, r in out.items() if r["is_outlier"]]
    assert sorted(flagged) == [("a", 100), ("a", 101)]
    assert ("b", 1) not in out  # null dropped
    # integer contract: med/mad are scaled longs of actual data values
    assert out[("a", 0)]["med"] in (100000, 101000, 102000)
    # constant-ish group: mad small, spike dev huge
    assert out[("a", 100)]["mad"] <= 1000


def test_quantile_buckets_source_fairness(spark, tmp_path):
    """Per-source calibration: a source whose raw scores are uniformly
    10x lower still keeps exactly its own top-20% — the property a
    global threshold destroys. Buckets are near-uniform within source."""
    import shutil

    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES

    rows = [(i, f"t{i}", "en", "rich", 10_000 + i) for i in range(100)]
    rows += [(1000 + i, f"u{i}", "en", "poor", 100 + i) for i in range(50)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    d = tmp_path / "sf"
    docs.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = SPARK_QUERIES["quantile_buckets"](spark, str(d)).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["source"], []).append(r)
    n_rich = sum(1 for r in kept["rich"] if r["keep_top20"])
    n_poor = sum(1 for r in kept["poor"] if r["keep_top20"])
    # each source keeps ~20% of ITS OWN docs despite the 10x score gap
    assert n_rich == 20 and n_poor == 10
    # kept docs are each source's own largest scores
    poor_kept_min = min(r["n_chars"] for r in kept["poor"] if r["keep_top20"])
    poor_drop_max = max(r["n_chars"] for r in kept["poor"] if not r["keep_top20"])
    assert poor_kept_min > poor_drop_max
    shutil.rmtree(d, ignore_errors=True)


def test_sliding_hll_distinct_matches_exact_windows(spark):
    """Controlled 5-bucket stream, 3-bucket windows: estimates at tiny
    cardinality are exact, so the whole confusion surface is checkable
    by hand — per-window membership union, complete-windows-only, and
    the exclusive-end labeling."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        sliding_hll_distinct,
    )

    T = dt.datetime
    # bucket_seconds=60; buckets 0..4 relative to epoch minute of day 0
    def ts(minute, second=0):
        return T(1970, 1, 1, 0, minute, second)

    rows = [
        ("a", 1, ts(0)), ("a", 2, ts(0, 30)),       # bucket 0: {1,2}
        ("a", 2, ts(1)),                             # bucket 1: {2}
        ("a", 3, ts(2)),                             # bucket 2: {3}
        ("a", 1, ts(3)),                             # bucket 3: {1}
        ("a", 4, ts(4)),                             # bucket 4: {4}
    ]
    df = spark.createDataFrame(rows, "k string, user long, ts timestamp")
    out = sliding_hll_distinct(
        df, ts_col="ts", value_col="user",
        bucket_seconds=60, window_buckets=3, keys=["k"],
    ).collect()
    got = {r["window_end_epoch"]: r["est_distinct"] for r in out}
    # complete windows end after buckets 2,3,4 -> exclusive ends
    # 180/240/300; memberships: buckets 0-2 {1,2,3}, 1-3 {2,3,1},
    # 2-4 {3,1,4} — three distinct users each
    assert got == {180: 3, 240: 3, 300: 3}


def test_sliding_hll_distinct_requires_complete_windows(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.stats import (
        sliding_hll_distinct,
    )

    T = dt.datetime
    df = spark.createDataFrame(
        [("a", 1, T(1970, 1, 1, 0, 0))], "k string, user long, ts timestamp"
    )
    # one bucket of data, window of 3 -> no complete window, no output
    out = sliding_hll_distinct(
        df, ts_col="ts", value_col="user",
        bucket_seconds=60, window_buckets=3, keys=["k"],
    )
    assert out.count() == 0
    # window of 1 -> every bucket is complete
    out1 = sliding_hll_distinct(
        df, ts_col="ts", value_col="user",
        bucket_seconds=60, window_buckets=1, keys=["k"],
    ).collect()
    assert len(out1) == 1 and out1[0]["est_distinct"] == 1
