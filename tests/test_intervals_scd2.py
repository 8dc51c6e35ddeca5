"""merge_intervals (gaps-and-islands) and scd2_history operators."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators.relational import scd2_history
from wordpress_sql_to_contentstack_exporter_spark.operators.temporal import merge_intervals


def _iv(spark, rows):
    return spark.createDataFrame(rows, "k string, s long, e long")


def test_merge_intervals_overlap_touch_gap(spark):
    df = _iv(
        spark,
        [
            ("a", 0, 10),    # overlaps next
            ("a", 5, 20),    # touches next at 20 -> merges (half-open)
            ("a", 20, 30),
            ("a", 40, 50),   # gap -> new island
            ("b", 0, 5),     # other key unaffected
        ],
    )
    out = merge_intervals(df, keys=["k"], start_col="s", end_col="e")
    got = {
        (r["k"], r["interval_start"], r["interval_end"]): r["n_rows"]
        for r in out.collect()
    }
    assert got == {("a", 0, 30): 3, ("a", 40, 50): 1, ("b", 0, 5): 1}


def test_merge_intervals_contained_and_duplicate_rows(spark):
    df = _iv(
        spark,
        [
            ("a", 0, 100),  # swallows everything below
            ("a", 10, 20),
            ("a", 10, 20),  # exact duplicate row
            ("a", 90, 95),
        ],
    )
    out = merge_intervals(df, keys=["k"], start_col="s", end_col="e").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["interval_start"], r["interval_end"], r["n_rows"]) == (0, 100, 4)


def test_merge_intervals_single_shuffle(spark):
    df = _iv(spark, [("a", 0, 10), ("a", 5, 20)])
    plan = merge_intervals(df, keys=["k"], start_col="s", end_col="e")._jdf.queryExecution().executedPlan().toString()
    # windows + final groupBy share the keys hash partitioning: exactly
    # one exchange in the whole plan
    assert plan.count("Exchange") == 1, plan


def test_scd2_collapses_noop_updates_and_builds_intervals(spark):
    log = spark.createDataFrame(
        [
            (1, 10, 100, "bronze"),
            (1, 11, 200, "bronze"),   # no-op -> collapsed
            (1, 12, 300, "gold"),
            (1, 13, 400, "gold"),     # no-op -> collapsed
            (1, 14, 500, "bronze"),   # back to an old value = a real change
            (2, 20, 100, "silver"),
        ],
        "k long, id long, t long, tier string",
    )
    out = scd2_history(log, keys=["k"], ts_col="t", attrs=["tier"], tiebreak=["id"])
    rows = sorted(
        (r["k"], r["tier"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out.collect()
    )
    assert rows == [
        (1, "bronze", 100, 300, False),
        (1, "bronze", 500, None, True),
        (1, "gold", 300, 500, False),
        (2, "silver", 100, None, True),
    ]


def test_scd2_null_attribute_transitions(spark):
    log = spark.createDataFrame(
        [(1, 10, 100, None), (1, 11, 200, None), (1, 12, 300, "x"), (1, 13, 400, None)],
        "k long, id long, t long, attr string",
    )
    out = scd2_history(log, keys=["k"], ts_col="t", attrs=["attr"], tiebreak=["id"])
    rows = sorted(
        ((r["attr"], r["valid_from"], r["valid_to"]) for r in out.collect()),
        key=lambda t: t[1],
    )
    # NULL->NULL is a no-op; NULL->x and x->NULL are changes
    assert rows == [(None, 100, 300), ("x", 300, 400), (None, 400, None)]


def test_scd2_same_timestamp_tiebreak(spark):
    log = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 11, 100, "b"), (1, 12, 100, "c")],
        "k long, id long, t long, attr string",
    )
    out = scd2_history(log, keys=["k"], ts_col="t", attrs=["attr"], tiebreak=["id"])
    rows = sorted((r["attr"], r["is_current"]) for r in out.collect())
    # all three survive (all changes) ordered by the id tiebreak; only
    # the id-max version is current
    assert rows == [("a", False), ("b", False), ("c", True)]


def test_scd2_single_shuffle(spark):
    log = spark.createDataFrame(
        [(1, 10, 100, "a"), (1, 11, 200, "b")], "k long, id long, t long, attr string"
    )
    plan = scd2_history(
        log, keys=["k"], ts_col="t", attrs=["attr"], tiebreak=["id"]
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_interval_overlap_join_handworked(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.temporal import (
        interval_overlap_join,
    )

    M = 1_000_000
    left = spark.createDataFrame(
        [
            (1, 100, 0 * M, 10 * M),    # overlaps r1 (partial), r2 (touch: no)
            (1, 101, 20 * M, 30 * M),   # overlaps r3 (contained)
            (2, 102, 0 * M, 10 * M),    # other key: no pair
            (1, 103, 50 * M, 50 * M),   # empty: dropped
        ],
        "user_id long, view_id long, v_start long, v_end long",
    )
    right = spark.createDataFrame(
        [
            (1, 200, 5 * M, 15 * M),    # overlaps l100 by 5s
            (1, 201, 10 * M, 20 * M),   # touches l100 at 10s: NOT a pair
            (1, 202, 22 * M, 25 * M),   # inside l101: overlap 3s
            (3, 203, 0 * M, 100 * M),
        ],
        "user_id long, click_id long, c_start long, c_end long",
    )
    out = {
        (r["view_id"], r["click_id"]): r["overlap_us"]
        for r in interval_overlap_join(
            left, right, keys=["user_id"],
            left_start="v_start", left_end="v_end",
            right_start="c_start", right_end="c_end",
            bucket_us=4 * M,  # small buckets: pairs share several -> dedupe
        ).collect()
    }
    assert out == {(100, 200): 5 * M, (101, 202): 3 * M}


def test_interval_overlap_long_interval_found_once(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 1, 0, 1_000_000)], "k long, lid long, ls long, le long"
    )
    right = spark.createDataFrame(
        [(1, 2, 999_999, 1_000_001)], "k long, rid long, rs long, re long"
    )
    rows = interval_overlap_join(
        left, right, keys=["k"],
        left_start="ls", left_end="le", right_start="rs", right_end="re",
        bucket_us=1000,  # left spans 1000 buckets; the pair shares one
    ).collect()
    assert len(rows) == 1
    assert rows[0]["overlap_us"] == 1


def test_interval_overlap_preserves_bag_semantics(spark):
    """Duplicate input rows must yield duplicate output pairs (the
    theta-join spec); the old distinct() collapsed them."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.temporal import (
        interval_overlap_join,
    )

    left = spark.createDataFrame(
        [(1, 10, 0, 100), (1, 10, 0, 100)], "k long, lid long, ls long, le long"
    )
    right = spark.createDataFrame(
        [(1, 20, 50, 150)], "k long, rid long, rs long, re long"
    )
    rows = interval_overlap_join(
        left, right, keys=["k"],
        left_start="ls", left_end="le", right_start="rs", right_end="re",
        bucket_us=10,  # pair shares many buckets; emitted once PER INPUT ROW
    ).collect()
    assert len(rows) == 2
    assert all(r["overlap_us"] == 50 for r in rows)


def test_interval_overlap_rejects_shared_columns(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.temporal import (
        interval_overlap_join,
    )
    import pytest as _pytest

    left = spark.createDataFrame([(1, 0, 10)], "k long, start long, end long")
    right = spark.createDataFrame([(1, 5, 15)], "k long, start long, end long")
    with _pytest.raises(ValueError, match="share non-key columns"):
        interval_overlap_join(
            left, right, keys=["k"],
            left_start="start", left_end="end",
            right_start="start", right_end="end",
        )
