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


def test_compact_rollup_folds_batches_and_accepts_new_appends(spark, tmp_path):
    roll = str(tmp_path / "roll")
    b1 = spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 5), "click", 1.0), (2, T(2024, 1, 1, 11, 0), "view", 5.0)],
        SCHEMA,
    )
    b2 = spark.createDataFrame([(3, T(2024, 1, 1, 10, 30), "click", 4.0)], SCHEMA)
    merge_rollup(spark, bucket_aggregate(b1), roll, batch_id=1)
    merge_rollup(spark, bucket_aggregate(b2), roll, batch_id=2)
    before = read_rollup(spark, roll)

    compacted = str(tmp_path / "roll_gen2")
    rollup_mod.compact_rollup(spark, roll, compacted)
    assert read_rollup(spark, compacted) == before
    # one generation row per (bucket, key) after compaction
    raw = spark.read.parquet(compacted)
    assert raw.count() == raw.select("bucket_start", "key").distinct().count()

    # the compacted table keeps accepting incremental batches
    b3 = spark.createDataFrame([(4, T(2024, 1, 1, 10, 45), "click", 2.0)], SCHEMA)
    merge_rollup(spark, bucket_aggregate(b3), compacted, batch_id=3)
    assert read_rollup(spark, compacted)[(T(2024, 1, 1, 10), "click")] == (3, 7.0)


def test_merge_rollup_never_rewrites_committed_files(spark, tmp_path):
    """Crash-safety invariant of the append-only design: files that exist
    before a merge still exist, byte-identical, after it."""
    import glob

    roll = str(tmp_path / "roll")
    b1 = spark.createDataFrame([(1, T(2024, 1, 1, 10, 5), "click", 1.0)], SCHEMA)
    merge_rollup(spark, bucket_aggregate(b1), roll, batch_id=1)
    before = {
        p: open(p, "rb").read() for p in glob.glob(f"{roll}/**/*.parquet", recursive=True)
    }
    assert before
    # same bucket again: old design rewrote this partition, new one appends
    b2 = spark.createDataFrame([(2, T(2024, 1, 1, 10, 30), "click", 4.0)], SCHEMA)
    merge_rollup(spark, bucket_aggregate(b2), roll, batch_id=2)
    for p, content in before.items():
        assert open(p, "rb").read() == content, f"committed file rewritten: {p}"
    assert read_rollup(spark, roll)[(T(2024, 1, 1, 10), "click")] == (2, 5.0)


def test_merge_rollup_skips_empty_partial(spark, tmp_path):
    """An all-late/empty micro-batch must not create a row-less rollup dir
    (read_rollup would then fail schema inference until a real batch lands)."""
    import os

    roll = str(tmp_path / "rollup_empty")
    empty = bucket_aggregate(spark.createDataFrame([], SCHEMA))
    merge_rollup(spark, empty, roll, batch_id=1)
    assert not os.path.exists(roll)  # skipped outright, not an empty append

    b = spark.createDataFrame([(1, T(2024, 1, 1, 10, 5), "click", 1.0)], SCHEMA)
    merge_rollup(spark, bucket_aggregate(b), roll, batch_id=2)
    merge_rollup(spark, empty, roll, batch_id=3)  # empty after real data: no-op
    assert read_rollup(spark, roll)[(T(2024, 1, 1, 10), "click")] == (1, 1.0)
