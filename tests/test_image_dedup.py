"""Perceptual image near-dup (operators/image_dedup.py): dHash
robustness on real PNG decodes, planted-pair recall through the full
banded pipeline, and the no-false-positive surface on distinct images."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators import image_dedup as imd
from wordpress_sql_to_contentstack_exporter_spark.operators import png

SF_DIR = "/root/testdata/sf0.001"


def _gray_png(seed: bytes, w: int = 32, h: int = 32) -> bytes:
    reps = (w * h) // len(seed) + 1
    return png.encode(w, h, 1, (seed * reps)[: w * h])


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & ((1 << 64) - 1)).count("1")


def test_dhash_stable_under_one_pixel_edit():
    base = _gray_png(b"the quick brown fox jumps over the lazy dog")
    w, h, nch, px = png.decode(base)
    mutated = bytearray(px)
    mutated[0] = (mutated[0] + 24) % 256
    edited = png.encode(w, h, 1, bytes(mutated))
    ha = imd._dhash_bytes(base)
    hb = imd._dhash_bytes(edited)
    assert ha is not None and hb is not None
    assert _hamming(ha, hb) <= 3  # a single-pixel edit flips at most a
    # couple of gradient signs in the 9x8 downsample


def test_dhash_separates_distinct_images():
    ha = imd._dhash_bytes(_gray_png(b"first completely different payload text"))
    hb = imd._dhash_bytes(_gray_png(b"another unrelated byte sequence entirely!"))
    assert ha is not None and hb is not None
    assert _hamming(ha, hb) > 6  # far beyond the near-dup threshold


def test_dhash_undecodable_is_null(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"not a png")), (2, None)], "media_id long, content binary"
    )
    rows = imd.dhash64(media).collect()
    assert all(r["dhash"] is None for r in rows)


def test_planted_pairs_recovered_end_to_end(spark):
    """The full pipeline (synthesize -> decode -> dHash -> band join ->
    popcount verify) must recover every planted one-pixel-perturbed
    copy and report no spurious pairs on the text-derived corpus."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = imd.synthesize_png_corpus(docs)
    pairs = imd.image_neardup(corpus, bands=4, max_hamming=6)
    rows = pairs.collect()
    planted_ids = {
        r["doc_id"] for r in docs.filter(F.col("doc_id") % 17 == 0).collect()
    }
    assert planted_ids  # fixture non-degenerate
    recovered = {
        r["id_a"] for r in rows if r["id_b"] - r["id_a"] == imd.PLANT_OFFSET
    }
    assert recovered == planted_ids
    spurious = [r for r in rows if r["id_b"] - r["id_a"] != imd.PLANT_OFFSET]
    assert spurious == []


def test_band_pigeonhole_boundary():
    """The candidate-generation guarantee the docstring claims: fewer
    differing bits than bands always leaves a shared band; a flip in
    EVERY band (possible from d=4 up) is the regime banding can miss —
    pinned on controlled bit patterns."""
    width = 16
    mask = (1 << width) - 1

    def bands(v: int) -> list[int]:
        u = v & ((1 << 64) - 1)
        return [(u >> (b * width)) & mask for b in range(4)]

    base = 0x0123456789ABCDEF
    d3 = base ^ 0b111  # 3 flips, all inside band 0
    d4_spread = base ^ ((1 << 0) | (1 << 16) | (1 << 32) | (1 << 48))
    assert any(x == y for x, y in zip(bands(base), bands(d3)))
    assert all(x != y for x, y in zip(bands(base), bands(d4_spread)))


def test_corrupt_idat_hashes_to_null(spark):
    """Corrupt payloads escape png.decode as zlib.error / struct.error,
    not just ValueError (review finding) — they must hash NULL, never
    kill the task."""
    import struct as _struct
    import zlib as _zlib

    good = _gray_png(b"payload")
    # corrupt the IDAT body: keep structure, break the deflate stream
    idat_at = good.index(b"IDAT") - 4
    (ln,) = _struct.unpack(">I", good[idat_at : idat_at + 4])
    corrupted = (
        good[: idat_at + 8]
        + b"\x00" * ln
        + good[idat_at + 8 + ln :]
    )
    truncated_ihdr = png.PNG_SIGNATURE + _struct.pack(">I", 13) + b"IHDR" + b"\x00" * 5
    media = spark.createDataFrame(
        [(1, bytearray(corrupted)), (2, bytearray(truncated_ihdr))],
        "media_id long, content binary",
    )
    rows = imd.dhash64(media).collect()
    assert all(r["dhash"] is None for r in rows)
    # and the raw decoders indeed raise the non-ValueError classes
    try:
        png.decode(corrupted)
        raise AssertionError("expected decode failure")
    except Exception as e:
        assert isinstance(e, (_zlib.error, ValueError))
