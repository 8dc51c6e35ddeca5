"""Continuous rollup: incremental bucket maintenance incl. late data."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.streaming.rollup import continuous_rollup

T = dt.datetime
SCHEMA = "event_id long, ts timestamp, event_type string, value double"


def read_rollup(spark, path):
    return {
        (r["bucket_start"], r["key"]): (r["n"], round(r["sum_value"], 2))
        for r in spark.read.parquet(path).collect()
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
