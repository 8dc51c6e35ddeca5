"""Multimodal (image/audio/video) column plumbing.

Media lives in-plane as opaque ``binary`` columns plus a typed metadata
struct — the same shape a 100 TB training-data lake uses (parquet with a
binary payload column, or a manifest of object-store URIs). The
Spark-side machinery here is real and tested: schemas, Arrow-batched
``mapInPandas`` decode stage, partition sizing.

Codec dispatch: ``decode_features(decoder="auto")`` prefers a real
image decoder (PIL, imported lazily on each executor) and falls back to
the deterministic sha256-derived stub when no codec library is present
(this container ships none — verified by ``available_decoders()``).
``decoder="stub"`` forces the deterministic path; the driver gate query
pins it so oracle parity cannot depend on which libraries happen to be
installed.
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
    """Deterministic 'decode + featurize' stub: 8 floats derived from the
    sha256 digest. Signature contract for every decoder: ``bytes ->
    list[float]``."""
    if payload is None:
        return []
    digest = hashlib.sha256(payload).digest()
    return [b / 255.0 for b in digest[:8]]


def _make_pil_decoder():
    """Real image decoder via PIL, or None if PIL is unavailable.

    Built lazily on each executor (import inside the closure builder) so
    the driver never needs the library. Feature = 2x2 grayscale thumbnail
    (4 floats) + normalized original width/height + aspect + 0-pad: a
    deterministic, resolution-aware 8-float signature matching the stub's
    shape, so downstream schemas don't care which decoder ran.
    """
    try:
        import io

        from PIL import Image
    except ImportError:
        return None

    def decode(payload: bytes) -> list[float]:
        img = Image.open(io.BytesIO(payload))
        w, h = img.size
        thumb = img.convert("L").resize((2, 2))
        px = [p / 255.0 for p in thumb.getdata()]
        return px + [
            min(w, 65535) / 65535.0,
            min(h, 65535) / 65535.0,
            w / h if h else 0.0,
            0.0,
        ]

    return decode


def available_decoders() -> list[str]:
    """Names of real codec backends importable in THIS interpreter
    ("pil", ...). Empty in codec-less containers — the honest signal the
    stub path is in use."""
    return ["pil"] if _make_pil_decoder() is not None else []


def decode_features(
    df: DataFrame, *, decoder: str = "auto", batch_hint: int = 1024
) -> DataFrame:
    """Arrow-batched decode/feature stage over binary media rows.

    ``decoder``: ``"auto"`` prefers a real codec on the executors (PIL
    today) and falls back to the deterministic stub; ``"pil"`` requires
    PIL (rows the codec cannot parse fall back to the stub feature
    rather than poisoning the batch); ``"stub"`` forces the
    deterministic path (the driver gate pins this so results never
    depend on installed libraries).

    ``mapInPandas`` so each Python worker sees whole Arrow batches (not
    rows); heavy codec state (models, decoders) initializes once per
    partition, amortized across the batch. Partition sizing at scale:
    keep media files grouped so a partition is ~128-512 MB of payload
    (``spark.sql.files.maxPartitionBytes`` / explicit repartition by size
    manifest) — the decode stage is compute-bound, so partitions ==
    cluster cores is the target.
    """
    if decoder not in ("auto", "pil", "stub"):
        raise ValueError(f"unknown decoder {decoder!r} (auto|pil|stub)")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        real = _make_pil_decoder() if decoder in ("auto", "pil") else None
        if decoder == "pil" and real is None:
            raise ImportError("decoder='pil' requested but PIL is not installed")

        def featurize(payload):
            if payload is None:
                return []
            if real is not None:
                try:
                    return real(payload)
                except Exception:  # non-image payload: stub feature, not poison
                    return _decode_bytes(payload)
            return _decode_bytes(payload)

        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    "content_sha256": content.map(
                        lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                    ),
                    "feature": content.map(featurize),
                }
            )

    return df.select("media_id", "content").mapInPandas(run, FEATURES_SCHEMA)


def decode_stub(df: DataFrame, *, batch_hint: int = 1024) -> DataFrame:
    """Deterministic decode stage (round-1 name, kept for compatibility):
    ``decode_features(decoder="stub")``."""
    return decode_features(df, decoder="stub", batch_hint=batch_hint)


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
