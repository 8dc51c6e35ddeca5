"""Hypertable-style continuous aggregate (incremental time-bucket rollup).

TimescaleDB's continuous aggregates / Druid rollups maintain a
pre-aggregated time-bucketed table as new data arrives. Spark-native
form: a streaming (or AvailableNow) pipeline that partially aggregates
each micro-batch, then merges into a bucket-partitioned parquet rollup
table by overwriting ONLY the partitions the batch touched (dynamic
partition overwrite) — late data re-opens exactly its bucket, untouched
history is never rewritten.

Merge math: per-batch partial aggregates (count/sum) are combined with
the existing bucket rows by summing — the standard decomposable-aggregate
contract (avg is derived sum/count at read time).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bucket_aggregate(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "1 hour",
) -> DataFrame:
    """Partial rollup of one batch: (bucket_start, key) -> count/sum."""
    return (
        events.groupBy(
            F.window(F.col(ts_col), bucket).alias("w"), F.col(key_col).alias("key")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.date_format(F.col("w.start"), "yyyy-MM-dd-HH").alias("bucket_part"),
            "key",
            "n",
            "sum_value",
        )
    )


def merge_rollup(spark: SparkSession, batch: DataFrame, rollup_path: str) -> None:
    """Merge a batch's partial rollup into the persistent rollup table.

    Reads only the touched bucket partitions, combines (sum of counts and
    sums), rewrites those partitions. Partition pruning keeps the read
    side proportional to the batch's time spread, not table history.
    """
    parts = [r["bucket_part"] for r in batch.select("bucket_part").distinct().collect()]
    if not parts:
        return
    combined = batch
    if os.path.exists(rollup_path):
        existing = (
            spark.read.parquet(rollup_path)
            .filter(F.col("bucket_part").isin(parts))
        )
        combined = (
            batch.unionByName(existing)
            .groupBy("bucket_start", "bucket_part", "key")
            .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
        )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    combined.write.partitionBy("bucket_part").mode("overwrite").parquet(rollup_path)


def continuous_rollup(
    spark: SparkSession,
    input_dir: str,
    schema,
    rollup_path: str,
    checkpoint_dir: str,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    bucket: str = "1 hour",
) -> None:
    """AvailableNow continuous aggregate: process new files, merge their
    partial rollups into the bucket-partitioned rollup table. Re-running
    with the same checkpoint ingests only new arrivals — the hypertable
    rollup maintenance loop."""

    def batch_fn(batch_df: DataFrame, _batch_id: int) -> None:
        partial = bucket_aggregate(
            batch_df, ts_col=ts_col, key_col=key_col, bucket=bucket
        )
        merge_rollup(spark, partial, rollup_path)

    stream = spark.readStream.schema(schema).parquet(f"{input_dir}/*")
    q = (
        stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
