"""Streaming JSONL corpus ingest — the continuous-arrival side of
``sinks/jsonl.py``.

A crawl or upstream pipeline drops ``.jsonl(.gz)`` shards into a landing
directory; this operator tails the directory with Structured Streaming
(checkpoint = file manifest, the ``incremental.py`` discipline: each
``Trigger.AvailableNow`` run processes exactly the not-yet-seen files
and stops; swap the trigger to run continuously), parses with the SAME
enforced-schema + dead-letter contract as the batch reader, and lands
clean rows and malformed lines as separate sinks in the same
micro-batch — so a bad line can neither kill the ingest nor vanish,
and both outputs stay exactly-once under restart (file-sink commit
protocol + checkpointed source offsets).

Why ``read.text`` + ``from_json`` again (not the streaming JSON
source): identical reasons to the batch reader — the JSON source
forbids corrupt-column-only projections, and the text form guarantees
the DLQ carries the VERBATIM line, not a re-serialization.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..sinks.jsonl import parse_jsonl_lines


def jsonl_ingest(
    spark: SparkSession,
    input_dir: str,
    schema: StructType | str,
    *,
    clean_dir: str,
    dlq_dir: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    continuous: bool = False,
):
    """Ingest JSONL shards from ``input_dir``: clean rows land as
    parquet under ``clean_dir``, malformed lines under ``dlq_dir``.

    One streaming query; the clean/DLQ split happens inside
    ``foreachBatch`` so BOTH sinks commit from the SAME micro-batch —
    two separate streaming queries over the same source would each
    keep their own offset log and could diverge on failure (a batch
    acknowledged by one and not the other), splitting the
    exactly-once story in half.

    ``foreachBatch`` itself is only AT-LEAST-ONCE: a crash between the
    two writes replays the batch, and a blind append would then
    double-write the side that already committed. Each write therefore
    targets a ``batch_id=N`` subdirectory in OVERWRITE mode — replaying
    batch N rewrites exactly batch N's output and nothing else, making
    the whole ingest idempotent (the standard foreachBatch idempotency
    recipe; readers see the directory as ordinary partitioned parquet).
    The micro-batch is persisted across the two writes (one parse, two
    consumers, unpersisted before the batch returns).

    Re-running with the same ``checkpoint_dir`` resumes: only files
    not yet in the checkpoint manifest are read (replay-idempotent by
    construction). The run scaffolding (readStream + foreachBatch +
    checkpoint + trigger) is ``incremental.incremental_export`` — one
    copy of the streaming-run discipline in the package; this function
    supplies the text source, the parse split and the idempotent dual
    sink. Returns the ``StreamingQuery`` (terminated in AvailableNow
    mode; LIVE and caller-owned in continuous mode).
    """
    from pyspark.sql.types import StringType, StructField, StructType

    from .incremental import incremental_export

    def write_batch(batch: DataFrame, batch_id: int) -> None:
        batch = batch.persist()
        try:
            clean, dlq = parse_jsonl_lines(batch, schema)
            clean.write.mode("overwrite").parquet(f"{clean_dir}/batch_id={batch_id}")
            dlq.write.mode("overwrite").parquet(f"{dlq_dir}/batch_id={batch_id}")
        finally:
            batch.unpersist()

    opts = (
        {"maxFilesPerTrigger": str(max_files_per_trigger)}
        if max_files_per_trigger is not None
        else None
    )
    return incremental_export(
        spark,
        input_dir,
        StructType([StructField("value", StringType())]),
        write_batch,
        checkpoint_dir,
        fmt="text",
        reader_options=opts,
        continuous=continuous,
    )
