"""Property tests for the round-4 primitives: Morton interleave
round-trip and hashed-shingle/string-shingle structural parity."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.sinks.layout import zorder_key


def _deinterleave(z: int, bits: int) -> tuple[int, int]:
    a = b = 0
    for i in range(bits):
        a |= ((z >> (2 * i)) & 1) << i
        b |= ((z >> (2 * i + 1)) & 1) << i
    return a, b


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=0, max_value=(1 << 21) - 1),
    st.integers(min_value=0, max_value=(1 << 21) - 1),
)
def test_zorder_key_roundtrips(spark, a, b):
    z = spark.range(1).select(
        zorder_key(F.lit(a), F.lit(b), bits=21).alias("z")
    ).collect()[0]["z"]
    assert z >= 0
    assert _deinterleave(z, 21) == (a, b)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcxyz", min_size=1, max_size=6),
        min_size=1,
        max_size=12,
    )
)
def test_shingle_hash_count_matches_string_shingles(spark, toks):
    """Hashed shingles must be structurally parallel to the string path:
    same count as the (non-distinct) string shingles, and equal token
    sequences must map to equal hash sequences."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.dedup import word_shingle_hashes

    text = " ".join(toks)
    row = spark.range(1).select(
        word_shingle_hashes(F.lit(text), 3).alias("h"),
        word_shingle_hashes(F.lit(" " + text.upper() + " "), 3).alias("h_norm"),
    ).collect()[0]
    assert len(row["h"]) == max(len(toks) - 2, 1)
    # normalization: case/outer whitespace do not change the hashes
    assert row["h"] == row["h_norm"]
