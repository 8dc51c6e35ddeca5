"""Structured Streaming: Trigger.AvailableNow incremental processing with
checkpoint-based resume, and watermarked window aggregation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.streaming import (
    incremental_export,
    windowed_event_counts,
)


def test_incremental_export_processes_only_new_files(spark, tmp_path):
    inp = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    out: list[tuple[int, list]] = []

    batch1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    batch1.write.parquet(str(inp / "f1"))
    schema = batch1.schema

    def collect_batch(df, batch_id):
        out.append((batch_id, sorted(r["id"] for r in df.collect())))

    def transform(df):
        return df.filter(F.col("id") > 0)

    incremental_export(
        spark, f"{inp}/*", schema, collect_batch, ckpt, transform=transform
    )
    assert [ids for _, ids in out] == [[1, 2]]

    # second run with a new file: only the new rows are processed
    spark.createDataFrame([(3, "c")], "id long, v string").write.parquet(str(inp / "f2"))
    incremental_export(
        spark, f"{inp}/*", schema, collect_batch, ckpt, transform=transform
    )
    seen = [ids for _, ids in out]
    assert seen[0] == [1, 2]
    assert [i for ids in seen[1:] for i in ids] == [3]

    # third run, nothing new: no further rows
    incremental_export(
        spark, f"{inp}/*", schema, collect_batch, ckpt, transform=transform
    )
    assert [i for ids in [ids for _, ids in out][1:] for i in ids] == [3]


def test_windowed_event_counts_batch_parity(spark):
    T = dt.datetime
    events = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 5), "click"),
            (2, T(2024, 1, 1, 10, 55), "click"),
            (3, T(2024, 1, 1, 11, 5), "click"),
            (4, T(2024, 1, 1, 10, 20), "view"),
        ],
        "event_id long, ts timestamp, event_type string",
    )
    out = windowed_event_counts(events, window_duration="1 hour")
    rows = {
        (r["window_start"].hour, r["event_type"]): r["n_events"] for r in out.collect()
    }
    assert rows[(10, "click")] == 2
    assert rows[(11, "click")] == 1
    assert rows[(10, "view")] == 1
