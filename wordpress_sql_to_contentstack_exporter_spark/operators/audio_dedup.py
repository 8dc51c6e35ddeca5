"""Audio near-duplicate detection: energy-envelope signature + banding.

Completes the near-dup modality triple (text: MinHash/SimHash, image:
dHash, audio: this). Byte-exact audio dedup misses every re-encode,
gain change, and dithered copy; the robust signal is the SHAPE of the
energy envelope over time — the basis of published audio-fingerprinting
systems (energy-band sign-of-difference fingerprints à la Haitsma &
Kalker 2002, public knowledge), reduced here to a 64-bit signature:

1. decode PCM (stdlib WAV tier, ``operators.wav``),
2. split the first channel into 65 equal frames; per-frame energy =
   sum of absolute sample values (integer math),
3. bit ``f`` = ``energy[f] < energy[f+1]`` — 64 gradient signs,
   invariant to global gain (scaling all samples preserves every
   comparison) and robust to low-amplitude noise,
4. candidates + verify via the shared banded-Hamming core
   (:func:`~.dedup.banded_hamming_pairs`).

Scale shape matches the image operator: Arrow-batched ``mapInPandas``
decode (compute-bound, partitions sized to cores), then pure JVM
banding — the exchange carries (band, block) keys, never samples. A
soundfile/ffmpeg codec drops into the same contract for compressed
formats.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import wav as _wav
from .dedup import banded_hamming_pairs

__all__ = ["synthesize_wav_corpus", "audio_signature64", "audio_neardup"]

#: media_id offset for planted perturbed copies in the synthetic corpus.
PLANT_OFFSET = 10_000_000

#: 65 frames -> 64 energy-gradient bits.
_N_FRAMES = 65

_SIG_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("sig", T.LongType(), True),
    ]
)

_WAV_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("content", T.BinaryType(), True),
    ]
)


def synthesize_wav_corpus(
    docs: DataFrame,
    *,
    n_samples: int = 2080,
    sample_rate: int = 8000,
    plant_every: int = 17,
    noise_amp: int = 180,
) -> DataFrame:
    """Deterministic PCM-WAV corpus from the ``documents`` fixture: each
    doc's text bytes become 16-bit samples (zero-centered, x256 gain so
    the envelope has real dynamic range). Every ``plant_every``-th doc
    also emits a PLANTED NEAR-DUP at ``media_id + PLANT_OFFSET`` with
    ``noise_amp``-amplitude deterministic noise added to every 7th
    sample — inaudible next to the ~32k signal swing, the ground truth
    for the recall evidence."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            blobs: list[bytes | None] = []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = (text or "").encode("utf-8") or b"\x40"
                samples = [
                    (raw[i % len(raw)] - 128) * 256 for i in range(n_samples)
                ]
                ids.append(int(doc_id))
                blobs.append(_wav.encode(sample_rate, samples))
                if int(doc_id) % plant_every == 0:
                    noisy = [
                        s + (noise_amp if i % 7 == 0 else 0)
                        for i, s in enumerate(samples)
                    ]
                    noisy = [max(-32768, min(32767, s)) for s in noisy]
                    ids.append(int(doc_id) + PLANT_OFFSET)
                    blobs.append(_wav.encode(sample_rate, noisy))
            yield pd.DataFrame(
                {"media_id": pd.Series(ids, dtype="int64"), "content": blobs}
            )

    return docs.select("doc_id", "text").mapInPandas(run, _WAV_SCHEMA)


def _signature_bytes(payload: bytes) -> int | None:
    """64-bit energy-envelope gradient signature of one PCM payload
    (signed int64, matching Spark LongType); None if undecodable."""
    try:
        info = _wav.parse(payload)
        samples = _wav.first_channel_samples(info)
    except Exception:
        # undecodable -> NULL signature, never a task failure (same
        # except-Exception discipline as the image/multimodal tiers)
        return None
    if len(samples) < _N_FRAMES:
        return None
    frame_len = len(samples) // _N_FRAMES
    energies = [
        sum(abs(s) for s in samples[f * frame_len : (f + 1) * frame_len])
        for f in range(_N_FRAMES)
    ]
    bits = 0
    for f in range(_N_FRAMES - 1):
        bits = (bits << 1) | (1 if energies[f] < energies[f + 1] else 0)
    if bits >= 1 << 63:
        bits -= 1 << 64
    return bits


def audio_signature64(
    media: DataFrame, *, id_col: str = "media_id", content_col: str = "content"
) -> DataFrame:
    """Arrow-batched signature stage: ``(media_id, sig LONG)``;
    undecodable payloads sign to NULL rather than poisoning the batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "sig": pd.Series(
                        [
                            _signature_bytes(b) if b is not None else None
                            for b in pdf[content_col]
                        ],
                        dtype="Int64",
                    ),
                }
            )

    return media.select(F.col(id_col), F.col(content_col)).mapInPandas(
        run, _SIG_SCHEMA
    )


def audio_neardup(
    media: DataFrame, *, bands: int = 4, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate audio pairs ``(id_a, id_b, hamming)`` — the
    signature stage feeding the shared banded-Hamming candidate/verify
    core (same pipeline shape as the image operator)."""
    return banded_hamming_pairs(
        audio_signature64(media),
        id_col="media_id",
        hash_col="sig",
        bands=bands,
        max_hamming=max_hamming,
    )
