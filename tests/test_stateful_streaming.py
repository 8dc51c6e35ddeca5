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


def test_heavy_hitters_space_saving_across_runs(spark, tmp_path):
    from wordpress_sql_to_contentstack_exporter_spark.streaming.stateful import heavy_hitters_stream

    inp = tmp_path / "hh_in"
    ckpt = str(tmp_path / "hh_ckpt")
    schema = "event_type string, item long"
    results: dict = {}

    def run_once(tag):
        stream = spark.readStream.schema(schema).parquet(str(inp / "*"))

        def sink(df, batch_id):
            for r in df.collect():
                results[(r["event_type"], r["item"])] = (r["est_count"], r["max_err"])

        q = (
            heavy_hitters_stream(stream, k=3)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # run 1: item 1 dominates
    spark.createDataFrame(
        [("view", 1)] * 5 + [("view", 2)] * 2 + [("view", 3)], schema
    ).write.parquet(str(inp / "b1"))
    run_once("a")
    assert results[("view", 1)] == (5, 0)
    assert results[("view", 2)] == (2, 0)

    # run 2: new batch continues the SAME sketch state (checkpointed):
    # item 4 floods in and must evict the weakest counter
    spark.createDataFrame([("view", 4)] * 7, schema).write.parquet(str(inp / "b2"))
    run_once("b")
    c4, err4 = results[("view", 4)]
    # inherited the evicted min counter (1) as bias: 7 true + 1 = 8, err 1
    assert c4 == 8 and err4 == 1
    # the dominant item survived with its exact count
    assert results[("view", 1)] == (5, 0)
