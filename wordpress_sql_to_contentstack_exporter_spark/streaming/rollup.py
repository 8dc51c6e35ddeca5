"""Hypertable-style continuous aggregate (incremental time-bucket rollup).

TimescaleDB's continuous aggregates / Druid rollups maintain a
pre-aggregated time-bucketed table as new data arrives. Spark-native
form: a streaming (or AvailableNow) pipeline that partially aggregates
each micro-batch and merges into a bucket-partitioned parquet rollup
table, overwriting ONLY the partitions the batch touched (dynamic
partition overwrite) — late data re-opens exactly its bucket, untouched
history is never rewritten.

Idempotency: foreachBatch is at-least-once — a crash between the parquet
commit and the checkpoint commit replays the batch. The stored rollup
therefore keeps one row per (bucket, key, batch_id); a replayed batch
first drops its own previous contribution from the touched partitions,
so re-merging is a no-op. ``read_rollup`` folds the per-batch partials
into final aggregates (the usual decomposable count/sum contract; avg is
derived at read time).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from .incremental import incremental_export


def bucket_aggregate(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> DataFrame:
    """Partial rollup of one batch: (bucket_start, key) -> count/sum.

    Rows with a NULL timestamp carry no bucket and are excluded (they
    would otherwise land in a default partition whose merge semantics
    are undefined).
    """
    return (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(F.window(F.col(ts_col), bucket).alias("w"), F.col(key_col).alias("key"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("sum_value"))
        .select(
            F.col("w.start").alias("bucket_start"),
            # partition key from epoch seconds: timezone-independent,
            # unlike date_format which follows spark.sql.session.timeZone
            F.unix_timestamp(F.col("w.start")).cast("string").alias("bucket_part"),
            "key",
            "n",
            "sum_value",
        )
    )


def merge_rollup(
    spark: SparkSession, partial: DataFrame, rollup_path: str, batch_id: int
) -> None:
    """Merge one batch's partial rollup into the persistent rollup table.

    Reads only the touched bucket partitions (partition pruning keeps the
    read proportional to the batch's time spread), drops any rows this
    batch_id wrote before (replay safety), appends the new partials, and
    rewrites just those partitions.
    """
    partial = partial.withColumn("batch_id", F.lit(batch_id)).persist()
    parts = [r["bucket_part"] for r in partial.select("bucket_part").distinct().collect()]
    if not parts:
        partial.unpersist()
        return
    combined = partial
    try:
        existing = (
            spark.read.parquet(rollup_path)
            .filter(F.col("bucket_part").isin(parts))
            .filter(F.col("batch_id") != batch_id)
        )
        combined = partial.unionByName(existing)
    except AnalysisException:
        pass  # first write: rollup table does not exist yet (any filesystem)
    (
        combined.write.partitionBy("bucket_part")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(rollup_path)
    )
    partial.unpersist()


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Final aggregates: fold per-batch partials into one row per
    (bucket_start, key)."""
    return (
        spark.read.parquet(rollup_path)
        .groupBy("bucket_start", "key")
        .agg(F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value"))
    )


def continuous_rollup(
    spark: SparkSession,
    input_dir: str,
    schema,
    rollup_path: str,
    checkpoint_dir: str,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    bucket: str = "1 hour",
) -> None:
    """AvailableNow continuous aggregate: process new files, merge their
    partial rollups into the bucket-partitioned rollup table. Re-running
    with the same checkpoint ingests only new arrivals — the hypertable
    rollup maintenance loop."""

    def batch_fn(batch_df: DataFrame, batch_id: int) -> None:
        partial = bucket_aggregate(
            batch_df, ts_col=ts_col, key_col=key_col, value_col=value_col, bucket=bucket
        )
        merge_rollup(spark, partial, rollup_path, batch_id)

    incremental_export(spark, f"{input_dir}/*", schema, batch_fn, checkpoint_dir)
