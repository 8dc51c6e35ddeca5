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


def test_streaming_exact_dedup_bounded_state_across_runs(spark, tmp_path):
    """dropDuplicatesWithinWatermark keyed on the content hash: duplicate
    content inside the watermark horizon is dropped — including a
    duplicate arriving in a LATER AvailableNow run (state persists via
    the checkpoint) — while distinct content always passes."""
    import datetime as dt

    from wordpress_sql_to_contentstack_exporter_spark.streaming import streaming_exact_dedup

    T = dt.datetime
    inp = tmp_path / "docs"
    ckpt = str(tmp_path / "ckpt")
    schema = "doc_id long, text string, ts timestamp"

    def run_once():
        got = []

        def sink(df, _bid):
            got.extend((r["doc_id"], r["text"]) for r in df.collect())

        stream = spark.readStream.schema(schema).parquet(f"{inp}/*")
        q = (
            streaming_exact_dedup(stream, watermark="1 hour")
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return got

    t0 = T(2024, 1, 1, 12, 0, 0)
    spark.createDataFrame(
        [
            (1, "Same   Doc", t0),
            (2, "same doc", t0 + dt.timedelta(seconds=5)),  # dup (normalized)
            (3, "another doc", t0 + dt.timedelta(seconds=1)),
        ],
        schema,
    ).coalesce(1).write.parquet(str(inp / "f1"))
    first = run_once()
    texts = sorted(t for _, t in first)
    assert len(first) == 2  # one of the dup pair survived
    assert "another doc" in texts

    # second run: same content again (within watermark) dropped via
    # checkpointed state; fresh content passes
    spark.createDataFrame(
        [
            (4, "SAME DOC", t0 + dt.timedelta(seconds=30)),  # still a dup
            (5, "fresh doc", t0 + dt.timedelta(seconds=40)),
        ],
        schema,
    ).coalesce(1).write.parquet(str(inp / "f2"))
    second = run_once()
    assert [(i, t) for i, t in second] == [(5, "fresh doc")]
