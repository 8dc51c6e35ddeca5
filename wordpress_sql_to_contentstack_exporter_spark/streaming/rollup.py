"""Hypertable-style continuous aggregate (incremental time-bucket rollup).

TimescaleDB's continuous aggregates / Druid rollups maintain a
pre-aggregated time-bucketed table as new data arrives. Spark-native
form: a streaming (or AvailableNow) pipeline that partially aggregates
each micro-batch and merges into a bucket-partitioned parquet rollup
table, overwriting ONLY the partitions the batch touched (dynamic
partition overwrite) — late data re-opens exactly its bucket, untouched
history is never rewritten.

Idempotency + crash safety: foreachBatch is at-least-once — a crash
between the parquet commit and the checkpoint commit replays the batch.
The stored rollup keeps one row per (bucket, key, batch_id) and merges
are APPEND-ONLY (log-structured, merge-on-read — the Hudi-MOR / Druid
segment shape): an append either commits (files move out of
``_temporary`` at job commit) or leaves nothing visible, and prior
batches' files are never deleted or rewritten, so there is no window in
which a crash can lose already-committed history. (The previous design
read-modify-overwrote the touched partitions; plain-parquet dynamic
overwrite deletes old files before the new commit is durable, so a
crash mid-commit lost prior batches' rows in those partitions — round-1
advice.) A replayed batch re-appends the same (bucket, key, batch_id)
partials; ``read_rollup`` keeps one contribution per batch
(deterministic — a batch's partial is a groupBy aggregate, so per
(bucket, key, batch_id) there is exactly one logical row) and folds the
partials into final aggregates (decomposable count/sum contract; avg is
derived at read time). ``compact_rollup`` is the offline maintenance op
that bounds the per-batch file/row growth.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

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
    """Append one batch's partial rollup to the persistent rollup table.

    Append-only: never reads or rewrites prior batches' files, so a crash
    at any point either leaves the table untouched (job uncommitted —
    only ``_temporary`` garbage, which parquet readers ignore) or fully
    appended. Replay safety is read-side: ``read_rollup`` keeps one
    contribution per (bucket, key, batch_id). Writes stay partitioned by
    ``bucket_part`` so reads of a time range prune to its buckets.

    An empty partial (all-late or empty micro-batch) is skipped outright:
    appending zero rows would still create the directory with only a
    ``_SUCCESS`` marker, and ``read_rollup``'s schema inference throws on
    a row-less parquet dir until a real batch lands.
    """
    # Cache across the two actions (emptiness probe + write) so the
    # bucket aggregation runs once per micro-batch, not twice (ADVICE
    # r3). persist/unpersist is safe here — unlike the operator-internal
    # checkpoints, consumption is synchronous within this function, so
    # the unpersist cannot strand a lazy consumer.
    partial = partial.persist()
    try:
        if partial.isEmpty():
            return
        (
            partial.withColumn("batch_id", F.lit(batch_id))
            .write.partitionBy("bucket_part")
            .mode("append")
            .parquet(rollup_path)
        )
    finally:
        partial.unpersist(blocking=False)


def read_rollup(spark: SparkSession, rollup_path: str) -> DataFrame:
    """Final aggregates: fold per-batch partials into one row per
    (bucket_start, key).

    The inner ``first()`` aggregate collapses at-least-once replays —
    identical logical rows re-appended under the same (bucket, key,
    batch_id) — before the outer fold sums across batches. ``first`` is
    exact here, not arbitrary: a batch's partial has exactly one row per
    (bucket, key), so duplicates only ever differ by replay.
    """
    per_batch = (
        spark.read.parquet(rollup_path)
        .groupBy("bucket_start", "key", "batch_id")
        .agg(F.first("n").alias("n"), F.first("sum_value").alias("sum_value"))
    )
    return per_batch.groupBy("bucket_start", "key").agg(
        F.sum("n").alias("n"), F.sum("sum_value").alias("sum_value")
    )


def compact_rollup(
    spark: SparkSession, rollup_path: str, dest_path: str
) -> None:
    """Offline maintenance: fold all per-batch partials into a single
    ``batch_id = -1`` generation at ``dest_path`` (same schema/layout, so
    ``read_rollup``/``merge_rollup`` keep working and later batches can
    append on top).

    Writes to a NEW path — never in place — so the live table stays
    readable and crash-consistent throughout; the caller swaps paths
    (config/symlink) and deletes the old generation once the new one is
    verified. Run only while the stream is stopped with its checkpoint
    committed: compaction collapses batch identities, so a replay of a
    pre-compaction batch into the compacted table would double-count.
    """
    folded = (
        read_rollup(spark, rollup_path)
        .withColumn(
            "bucket_part", F.unix_timestamp(F.col("bucket_start")).cast("string")
        )
        .withColumn("batch_id", F.lit(-1))
        .select("bucket_start", "key", "n", "sum_value", "batch_id", "bucket_part")
    )
    folded.write.partitionBy("bucket_part").mode("errorifexists").parquet(dest_path)


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
