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
