"""Multimodal (image/audio/video) column plumbing.

Media lives in-plane as opaque ``binary`` columns plus a typed metadata
struct — the same shape a 100 TB training-data lake uses (parquet with a
binary payload column, or a manifest of object-store URIs). The
Spark-side machinery here is real and tested: schemas, Arrow-batched
``mapInPandas`` decode stage, partition sizing. The actual codec work is
STUBBED (``decode_stub``) because image/audio libraries are not in this
container — swap ``_decode_bytes`` for a real decoder (PIL/torchaudio/…)
in production; the pipeline shape does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Canonical media-row schema: payload + typed metadata.
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

#: Output of the (stubbed) feature-extraction stage.
FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("content_sha256", T.StringType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_bytes(payload: bytes) -> list[float]:
    """Deterministic fake 'decode + featurize': 8 floats derived from the
    sha256 digest. Replace with a real codec (PIL.Image.open / soundfile /
    av frame sampling) in production — signature stays ``bytes ->
    list[float]``."""
    if payload is None:
        return []
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def decode_stub(df: DataFrame, *, batch_hint: int = 1024) -> DataFrame:
    """Arrow-batched decode/feature stage over binary media rows.

    ``mapInPandas`` so each Python worker sees whole Arrow batches (not
    rows); heavy codec state (models, decoders) initializes once per
    partition, amortized across the batch. Partition sizing at scale:
    keep media files grouped so a partition is ~128-512 MB of payload
    (``spark.sql.files.maxPartitionBytes`` / explicit repartition by size
    manifest) — the decode stage is compute-bound, so partitions ==
    cluster cores is the target.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(_decode_bytes),
                }
            )

    return df.select("media_id", "content").mapInPandas(run, FEATURES_SCHEMA)


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Build a MEDIA_SCHEMA-shaped DataFrame from the ``documents`` fixture
    (text bytes as payload) so the multimodal plumbing is exercisable
    without binary fixtures."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )
