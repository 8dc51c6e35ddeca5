"""Streaming dedup with CONSTANT state: sharded Bloom filters.

``streaming_exact_dedup`` holds one 32-byte hash per distinct document
inside the watermark horizon — exact, but state grows with distinct
volume, and a lifetime-scoped dedup (no watermark GC) on a 100 TB
ingest would hold billions of hashes. This operator trades a bounded,
measurable false-POSITIVE rate (a novel document occasionally dropped
as "seen") for state that never grows: ``n_shards`` Bloom filters of
``m_bits`` each, total memory ``n_shards * m_bits / 8`` bytes forever.

The guarantee direction is what curation wants: the output NEVER
contains two copies of the same content (a seen key always hits its own
bits — no false negatives), and the cost is a ~fp-rate loss of novel
documents, sized by ``m_bits`` against expected distinct volume
(fp ≈ (1 - e^(-k n / m))^k per shard).

Mechanics:

- the dedup key is the sha256 of normalized content (document bodies
  never enter the shuffle or the state store — same discipline as the
  batch and exact-streaming paths);
- rows route to a shard by key hash; each shard's
  ``applyInPandasWithState`` group holds one ``m_bits``-bit filter as a
  single BINARY state value, so state-store traffic is one blob per
  shard per micro-batch, not per document;
- the k probe positions derive from the key's 256-bit digest by
  double hashing (Kirsch-Mitzenmacher: pos_i = h1 + i*h2 mod m — two
  independent 64-bit halves of the sha256, public-knowledge
  construction), deterministic across runs and engines;
- duplicates WITHIN a micro-batch are also dropped (bits are set as
  the batch is scanned in deterministic (key, id) order — the
  first-seen row wins);
- state survives restarts via the checkpoint: a duplicate arriving in
  a later ``Trigger.AvailableNow`` run is still dropped, with no
  watermark horizon — lifetime dedup in constant memory.

Shard count sizes parallelism (each shard is one state-store group);
shard filters are independent, so fp is per-shard and the formula
applies with n = distinct keys / n_shards.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.dedup import normalize_text

__all__ = ["streaming_bloom_dedup", "bloom_positions"]


def bloom_positions(digest_hex: str, m_bits: int, k: int) -> list[int]:
    """The k bit positions for a sha256 hex digest — double hashing from
    the digest's first two 64-bit words (Kirsch-Mitzenmacher)."""
    h1 = int(digest_hex[:16], 16)
    h2 = int(digest_hex[16:32], 16) | 1  # odd -> full-period stepping
    return [(h1 + i * h2) % m_bits for i in range(k)]


def _dedup_fn_factory(m_bits: int, k: int):
    n_bytes = m_bits // 8

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (shard,) = key
        filt = bytearray(state.get[0]) if state.exists else bytearray(n_bytes)

        out_ids: list[int] = []
        out_hashes: list[str] = []
        rows: list[tuple[str, int]] = []
        for pdf in pdfs:
            rows.extend(zip(pdf["content_hash"], pdf["doc_id"]))
        # Deterministic in-batch order: rows are processed in (hash,
        # doc_id) sort order, so within a micro-batch the SURVIVOR of a
        # duplicate family is the LOWEST doc_id — NOT the temporally
        # first arrival (arrival order within a batch is
        # partition-interleaved and nondeterministic, so "earliest
        # arrival" is not even well-defined here; ADVICE r7 asks this
        # stated explicitly). Downstream consumers that need temporal
        # firstness should carry an event-time column and re-pick
        # per-hash min(event_time) on the survivor stream.
        rows.sort(key=lambda r: (r[0], r[1]))
        for digest, doc_id in rows:
            pos = bloom_positions(digest, m_bits, k)
            seen = all(filt[p >> 3] & (1 << (p & 7)) for p in pos)
            if seen:
                continue
            for p in pos:
                filt[p >> 3] |= 1 << (p & 7)
            out_ids.append(int(doc_id))
            out_hashes.append(digest)

        state.update((bytes(filt),))
        if out_ids:
            yield pd.DataFrame(
                {
                    "shard": pd.Series([int(shard)] * len(out_ids), dtype="int64"),
                    "doc_id": pd.Series(out_ids, dtype="int64"),
                    "content_hash": out_hashes,
                }
            )

    return fn


def streaming_bloom_dedup(
    stream: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_shards: int = 16,
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """First occurrence of each distinct normalized content, forever, in
    ``n_shards * m_bits / 8`` bytes of total state. Emits
    ``(shard, doc_id, content_hash)`` for surviving rows (join back on
    id for payloads — the state path never carries bodies)."""
    if m_bits % 8 != 0:
        raise ValueError("m_bits must be a multiple of 8")
    # NULL text hashes as empty content (coalesce BEFORE sha2): without
    # it the state fn receives a None digest and crashes the whole
    # streaming query on sort/subscript — and "every NULL/empty doc is
    # one duplicate family, first survives" is the dedup semantic the
    # exact operator family already applies to normalized-empty text.
    keyed = stream.select(
        F.col(id_col).alias("doc_id"),
        F.sha2(
            F.coalesce(normalize_text(F.col(text_col)), F.lit("")), 256
        ).alias("content_hash"),
    ).withColumn(
        "shard", F.pmod(F.xxhash64("content_hash"), F.lit(int(n_shards)))
    )
    out_schema = T.StructType(
        [
            T.StructField("shard", T.LongType(), False),
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("content_hash", T.StringType(), False),
        ]
    )
    state_schema = T.StructType([T.StructField("filter", T.BinaryType(), True)])
    return keyed.groupBy("shard").applyInPandasWithState(
        _dedup_fn_factory(m_bits, k),
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
