"""Stateful streaming sessionization: state persists across AvailableNow
runs via the checkpoint (a session spanning two runs is stitched)."""

from __future__ import annotations

import datetime as dt

from wordpress_sql_to_contentstack_exporter_spark.streaming.stateful import sessionize_stream

T = dt.datetime
SCHEMA = "user_id long, ts timestamp"


def run_once(spark, inp, ckpt, collected):
    stream = spark.readStream.schema(SCHEMA).parquet(f"{inp}/*")
    sessions = sessionize_stream(stream, gap_seconds=1800)

    def sink(df, batch_id):
        collected.extend(
            (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
            for r in df.collect()
        )

    q = (
        sessions.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_sessions_stitch_across_runs(spark, tmp_path):
    inp = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    # run 1: user 1 has two events 10 min apart (one open session)
    spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 0)), (1, T(2024, 1, 1, 10, 10))], SCHEMA
    ).write.parquet(str(inp / "f1"))
    run_once(spark, inp, ckpt, out)
    assert out == []  # session still open -> nothing emitted

    # run 2: 5 min later (continues session), then a 2h-later event closes it
    spark.createDataFrame(
        [(1, T(2024, 1, 1, 10, 15)), (1, T(2024, 1, 1, 12, 30))], SCHEMA
    ).write.parquet(str(inp / "f2"))
    run_once(spark, inp, ckpt, out)
    assert len(out) == 1
    uid, start, end, n = out[0]
    assert uid == 1
    assert start == T(2024, 1, 1, 10, 0)
    assert end == T(2024, 1, 1, 10, 15)  # stitched across runs
    assert n == 3

    # run 3: another user entirely; user 1's tail stays open
    spark.createDataFrame([(2, T(2024, 1, 1, 9, 0))], SCHEMA).write.parquet(
        str(inp / "f3")
    )
    run_once(spark, inp, ckpt, out)
    assert len(out) == 1
