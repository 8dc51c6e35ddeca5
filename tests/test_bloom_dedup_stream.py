"""Streaming Bloom dedup: constant-state lifetime dedup — no duplicate
ever emitted (in-batch, cross-batch, and across checkpointed restarts),
novel docs pass, and the state blob stays one filter per shard."""

from __future__ import annotations

from wordpress_sql_to_contentstack_exporter_spark.streaming.bloom_dedup import (
    bloom_positions,
    streaming_bloom_dedup,
)

SCHEMA = "doc_id long, text string"


def run_once(spark, inp, ckpt, collected):
    stream = spark.readStream.schema(SCHEMA).parquet(f"{inp}/*")
    out = streaming_bloom_dedup(stream, n_shards=4, m_bits=1 << 12, k=4)

    def sink(df, batch_id):
        collected.extend((r["doc_id"], r["content_hash"]) for r in df.collect())

    q = (
        out.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_across_checkpointed_runs(spark, tmp_path):
    inp = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    # run 1: three distinct docs + an in-batch duplicate of doc 1
    spark.createDataFrame(
        [(1, "alpha doc"), (2, "beta doc"), (3, "gamma doc"), (4, "alpha doc")],
        SCHEMA,
    ).write.parquet(str(inp / "f1"))
    run_once(spark, inp, ckpt, out)
    assert len(out) == 3
    texts_seen = {h for _, h in out}
    assert len(texts_seen) == 3
    # deterministic first-wins: the in-batch dup kept the lower doc_id
    assert {i for i, _ in out} == {1, 2, 3}

    # run 2 (fresh process state, restored from checkpoint): a cross-run
    # duplicate, a normalized-whitespace duplicate, and a novel doc
    spark.createDataFrame(
        [(5, "beta doc"), (6, "  alpha   doc "), (7, "delta doc")], SCHEMA
    ).write.parquet(str(inp / "f2"))
    run_once(spark, inp, ckpt, out)
    assert {i for i, _ in out} == {1, 2, 3, 7}
    # lifetime guarantee: every emitted content hash unique
    hashes = [h for _, h in out]
    assert len(hashes) == len(set(hashes))


def test_positions_deterministic_and_in_range():
    d = "ab" * 32
    p1 = bloom_positions(d, 1 << 12, 4)
    assert p1 == bloom_positions(d, 1 << 12, 4)
    assert len(p1) == 4
    assert all(0 <= p < (1 << 12) for p in p1)
    # distinct digests give distinct position sets in general
    assert p1 != bloom_positions("cd" * 32, 1 << 12, 4)


def test_validates_m_bits(spark):
    import pytest

    df = spark.readStream.schema(SCHEMA).parquet("/tmp/nonexistent-ok/*")
    with pytest.raises(ValueError, match="multiple of 8"):
        streaming_bloom_dedup(df, m_bits=1001)


def test_null_text_rows_survive_as_one_family(spark, tmp_path):
    """NULL text must not crash the query (review finding: a None
    digest reached the state fn's sort); all NULL/empty docs form one
    duplicate family whose first row survives."""
    inp = tmp_path / "in"
    ckpt = str(tmp_path / "ckpt")
    out: list = []
    spark.createDataFrame(
        [(1, None), (2, "real doc"), (3, None), (4, "   ")], SCHEMA
    ).write.parquet(str(inp / "f1"))
    run_once(spark, inp, ckpt, out)
    # one survivor for the NULL/empty family (id 1) + the real doc
    assert {i for i, _ in out} == {1, 2}
