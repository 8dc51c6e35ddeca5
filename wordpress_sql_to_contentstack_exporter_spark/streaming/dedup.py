"""Streaming exact deduplication with watermark-bounded state.

Batch exact dedup (``operators/dedup.exact_dedup``) assumes the whole
corpus is present; a streaming ingest pipeline instead needs "drop
documents whose content we've already seen RECENTLY" with state that
does not grow forever. Spark-native form:
``dropDuplicatesWithinWatermark`` keyed on the 32-byte content hash —
the state store holds one hash per distinct document seen inside the
watermark horizon and the engine garbage-collects older entries, so
memory is bounded by the dedup window, not the stream's lifetime
(a plain ``dropDuplicates`` on an unbounded stream is a slow OOM).

Shuffle carries (hash, event-time) only — document bodies never move
for the dedup decision, same discipline as the batch path. State
survives restarts via the checkpoint, so ``Trigger.AvailableNow``
micro-runs compose into an incremental ingest: a duplicate arriving in
a later run (within the watermark) is still dropped.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.dedup import normalize_text


def streaming_exact_dedup(
    stream: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str = "ts",
    *,
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop stream rows whose normalized content hash was already seen
    within ``watermark`` of event time. One surviving row per distinct
    content per window; all original columns pass through (plus the
    ``content_hash`` used as the dedup key, kept for downstream lineage
    joins)."""
    h = F.sha2(normalize_text(F.col(text_col)), 256)
    return (
        stream.withColumn("content_hash", h)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_hash"])
    )


def streaming_minhash_neardup(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 2,
    shingle_k: int = 3,
    min_est_jaccard: float = 0.5,
    max_bucket_size: int | None = None,
) -> None:
    """Streaming near-duplicate detection: each micro-batch's documents
    are checked against every PREVIOUSLY ingested document (and each
    other) via banded MinHash-LSH, then appended to the signature index.

    State is not the engine's state store but a plain parquet signature
    index — (id, h0..h{n-1}, band, bucket), ~one hundred bytes per
    (doc, band) regardless of document size — because near-dup state,
    unlike exact-dedup hashes, must be JOINABLE by bucket rather than
    looked up by key: arrivals collide with signatures from any earlier
    batch. Per batch the work is bucket-local (new-side rows only join
    history rows sharing a band bucket), so a batch of b docs against a
    history of N costs the bucket-collision volume, never b x N.

    Exactly-once despite plain parquet: both outputs are written to a
    ``batch_id=<n>`` subdirectory with overwrite — a replayed batch
    (failure between writes, checkpoint rewind) overwrites its own
    partition instead of duplicating rows.

    Pairs are emitted with ``id_a < id_b`` normalized ordering and carry
    ``est_jaccard`` from full-signature agreement, exactly like the
    batch operator; ``max_bucket_size`` caps combined (band, bucket)
    groups with the same aggregate+semi-join guard. Old-vs-old pairs
    are never re-emitted: the join's left side is always the new batch.

    Runs one ``Trigger.AvailableNow`` pass to completion (compose with
    repeated invocations for incremental ingest, as
    ``streaming_exact_dedup``'s checkpointed runs do).
    """
    from ..operators.dedup import minhash_banded

    h_cols = [f"h{i}" for i in range(num_hashes)]

    def _process(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        banded = minhash_banded(
            batch,
            text_col,
            id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
        ).localCheckpoint(eager=False)
        try:
            history = spark.read.parquet(index_dir).drop("batch_id")
        except AnalysisException:  # first batch: no index directory yet
            # (only PATH_NOT_FOUND lands here; a corrupt index raises a
            # different error class and must fail the run, not silently
            # restart the dedup history)
            history = banded.limit(0)
        everyone = history.unionByName(banded)
        if max_bucket_size is not None:
            small = (
                everyone.groupBy("band", "bucket")
                .agg(F.count(F.lit(1)).alias("__n"))
                .filter(F.col("__n") <= max_bucket_size)
                .select("band", "bucket")
            )
            everyone = everyone.join(small, ["band", "bucket"], "left_semi")

        l, r = banded.alias("l"), everyone.alias("r")
        matches = None
        for c in h_cols:
            piece = (F.col(f"l.{c}") == F.col(f"r.{c}")).cast("int")
            matches = piece if matches is None else matches + piece
        est = matches / F.lit(num_hashes)
        pairs = (
            l.join(
                r,
                (F.col("l.band") == F.col("r.band"))
                & (F.col("l.bucket") == F.col("r.bucket"))
                & (F.col("l.id") != F.col("r.id")),
            )
            .select(
                F.least(F.col("l.id"), F.col("r.id")).alias("id_a"),
                F.greatest(F.col("l.id"), F.col("r.id")).alias("id_b"),
                F.round(est, 4).alias("est_jaccard"),
            )
            .filter(F.col("est_jaccard") >= min_est_jaccard)
            .dropDuplicates(["id_a", "id_b"])
        )
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch_id={batch_id}")
        banded.write.mode("overwrite").parquet(f"{index_dir}/batch_id={batch_id}")

    (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )
