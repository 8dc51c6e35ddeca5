"""Minimal PCM WAV codec helpers — stdlib only (``wave`` + ``struct``).

The audio analogue of ``operators.png`` and ``operators.y4m``: no audio
library ships in this container, but PCM WAV is stdlib-parsable, so the
REAL-sample decode path of the audio feature stage executes in-container
with fixture files a test writes. Production clusters plug richer
codecs (soundfile/ffmpeg) into the ``decoder="lib"`` tier of
``multimodal.audio_features``; the Spark-side plumbing is identical.

Only integer PCM (8/16/32-bit) is handled; anything else raises
``ValueError`` and the caller's dispatch cascade falls to the stub.
"""

from __future__ import annotations

import io
import struct
import wave


def parse(data: bytes) -> dict:
    """Parse a PCM WAV payload. Returns {sample_rate, n_channels,
    sample_width, n_frames, duration_ms} plus the raw frame bytes."""
    try:
        with wave.open(io.BytesIO(data)) as w:
            info = {
                "sample_rate": w.getframerate(),
                "n_channels": w.getnchannels(),
                "sample_width": w.getsampwidth(),
                "n_frames": w.getnframes(),
            }
            frames = w.readframes(w.getnframes())
    except (wave.Error, EOFError) as e:
        raise ValueError(f"not a PCM WAV payload: {e}") from None
    if info["sample_width"] not in (1, 2, 4):
        raise ValueError(f"unsupported sample width {info['sample_width']}")
    if info["sample_rate"] <= 0:
        raise ValueError("invalid sample rate")
    info["duration_ms"] = info["n_frames"] * 1000 // info["sample_rate"]
    info["frames"] = frames
    return info


def first_channel_samples(info: dict) -> list[int]:
    """Integer samples of channel 0 (8-bit WAV is unsigned per spec —
    recentred to signed here so energy/peak math is uniform)."""
    width = info["sample_width"]
    nch = info["n_channels"]
    frames = info["frames"]
    if width == 1:
        vals = [b - 128 for b in frames]
    else:
        fmt = {2: "h", 4: "i"}[width]
        count = len(frames) // width
        vals = list(struct.unpack(f"<{count}{fmt}", frames[: count * width]))
    return vals[::nch]


def encode(sample_rate: int, samples: list[int], *, sample_width: int = 2, n_channels: int = 1) -> bytes:
    """Assemble a PCM WAV payload (test-fixture writer), channel 0 only
    (mono or duplicated across channels)."""
    fmt = {1: "B", 2: "h", 4: "i"}[sample_width]
    if sample_width == 1:
        raw = struct.pack(f"<{len(samples) * n_channels}{fmt}",
                          *[s + 128 for s in samples for _ in range(n_channels)])
    else:
        raw = struct.pack(f"<{len(samples) * n_channels}{fmt}",
                          *[s for s in samples for _ in range(n_channels)])
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sample_width)
        w.setframerate(sample_rate)
        w.writeframes(raw)
    return buf.getvalue()
