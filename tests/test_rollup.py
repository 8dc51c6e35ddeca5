"""Continuous rollup: incremental bucket maintenance incl. late data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.streaming.rollup import (
    bucket_aggregate,
    continuous_rollup,
    merge_rollup,
)
from wordpress_sql_to_contentstack_exporter_spark.streaming import rollup as rollup_mod

T = dt.datetime
SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def read_rollup(spark, path):
    return {
        (r["bucket_start"], r["key"]): (r["n"], round(r["sum_value"], 2))
        for r in rollup_mod.read_rollup(spark, path).collect()
    }


def test_continuous_rollup_incremental_and_late_data(spark, tmp_path):
    inp = tmp_path / "ev"
    roll = str(tmp_path / "rollup")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 5), "click", 1.0),
            (2, T(2024, 1, 1, 10, 50), "click", 2.0),
            (3, T(2024, 1, 1, 11, 10), "view", 5.0),
        ],
        SCHEMA,
    ).write.parquet(str(inp / "f1"))
    continuous_rollup(spark, str(inp), spark.createDataFrame([], SCHEMA).schema, roll, ckpt)
    state = read_rollup(spark, roll)
    assert state[(T(2024, 1, 1, 10), "click")] == (2, 3.0)
    assert state[(T(2024, 1, 1, 11), "view")] == (1, 5.0)

    # second run: new bucket + LATE event into the already-rolled 10:00 bucket
    spark.createDataFrame(
        [
            (4, T(2024, 1, 1, 12, 1), "click", 7.0),
            (5, T(2024, 1, 1, 10, 59), "click", 10.0),  # late arrival
        ],
        SCHEMA,
    ).write.parquet(str(inp / "f2"))
    continuous_rollup(spark, str(inp), spark.createDataFrame([], SCHEMA).schema, roll, ckpt)
    state = read_rollup(spark, roll)
    assert state[(T(2024, 1, 1, 10), "click")] == (3, 13.0)  # late data merged
    assert state[(T(2024, 1, 1, 11), "view")] == (1, 5.0)  # untouched bucket intact
    assert state[(T(2024, 1, 1, 12), "click")] == (1, 7.0)

    # third run, nothing new: rollup unchanged
    continuous_rollup(spark, str(inp), spark.createDataFrame([], SCHEMA).schema, roll, ckpt)
    assert read_rollup(spark, roll) == state


def test_merge_rollup_replay_is_idempotent(spark, tmp_path):
    """At-least-once replay of the same batch_id must not double-count."""
    roll = str(tmp_path / "roll")
    batch = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 5), "click", 1.0), (2, T(2024, 1, 1, 10, 6), "click", 2.0)],
        SCHEMA,
    )
    partial = bucket_aggregate(batch)
    merge_rollup(spark, partial, roll, batch_id=7)
    merge_rollup(spark, bucket_aggregate(batch), roll, batch_id=7)  # replay
    state = read_rollup(spark, roll)
    assert state[(T(2024, 1, 1, 10), "click")] == (2, 3.0)  # not doubled

    # a different batch into the same bucket DOES accumulate
    late = spark.createDataFrame([(3, T(2024, 1, 1, 10, 30), "click", 4.0)], SCHEMA)
    merge_rollup(spark, bucket_aggregate(late), roll, batch_id=8)
    assert read_rollup(spark, roll)[(T(2024, 1, 1, 10), "click")] == (3, 7.0)


def test_bucket_aggregate_drops_null_ts(spark):
    batch = spark.createDataFrame(
        [(1, None, "click", 1.0), (2, T(2024, 1, 1, 10, 0), "click", 2.0)], SCHEMA
    )
    rows = bucket_aggregate(batch).collect()
    assert len(rows) == 1 and rows[0]["n"] == 1
