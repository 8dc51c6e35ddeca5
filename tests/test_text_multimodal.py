"""Text analysis (lang-ID, quality, tokens, fingerprints) and multimodal
binary-column plumbing."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators import multimodal as mm
from wordpress_sql_to_contentstack_exporter_spark.operators import text as tx


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(1, "hello, world! it's 2024"), (2, "   "), (3, "one")],
        "id long, text string",
    )
    out = df.select(
        "id",
        tx.token_count_ws(F.col("text")).alias("ws"),
        tx.token_count_bpe(F.col("text")).alias("bpe"),
    )
    rows = {r["id"]: (r["ws"], r["bpe"]) for r in out.collect()}
    assert rows[1][0] == 4
    # hello , world ! it ' s 2024 -> 8 BPE-ish tokens
    assert rows[1][1] == 8
    assert rows[2] == (0, 0)
    assert rows[3] == (1, 1)


def test_lang_id_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "el gato de la casa que los perros"),
            (3, "der hund und die katze das ist gut"),
            (4, "xyzzy plugh"),
        ],
        "doc_id long, text string",
    )
    out = tx.lang_id(df)
    rows = {r["doc_id"]: r["lang_pred"] for r in out.collect()}
    assert rows[1] == "en" and rows[2] == "es" and rows[3] == "de" and rows[4] == "und"


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello   World"), (2, "hello world"), (3, "hello  world ")],
        "doc_id long, text string",
    )
    fps = [r["fp"] for r in tx.fingerprint(df).orderBy("doc_id").collect()]
    assert fps[0] == fps[1] == fps[2]
    assert fps[0] == hashlib.sha256(b"hello world").hexdigest()


def test_quality_features_ranges(spark):
    df = spark.createDataFrame(
        [(1, "Good text, with punctuation. And the usual stopwords of note.")],
        "doc_id long, text string",
    )
    r = tx.quality_features(df).first()
    assert r["q_tokens"] == 10
    assert 0 < r["q_punct_ratio"] < 0.2
    assert 0 < r["q_stopword_ratio"] <= 0.5
    assert r["q_mean_token_len"] > 3


def test_multimodal_decode_stub(spark):
    docs = spark.createDataFrame(
        [(1, "alpha"), (2, "beta")], "doc_id long, text string"
    )
    media = mm.synthesize_media_from_documents(
        docs.withColumn("lang", F.lit("en"))
    )
    assert media.schema["content"].dataType.typeName() == "binary"
    feats = mm.decode_stub(media)
    rows = {r["media_id"]: r for r in feats.collect()}
    assert rows[1]["n_bytes"] == 5
    assert rows[1]["content_sha256"] == hashlib.sha256(b"alpha").hexdigest()
    assert len(rows[1]["feature"]) == 8
    assert all(0.0 <= x <= 1.0 for x in rows[1]["feature"])


def test_decoder_dispatch_auto_falls_back_to_stub(spark):
    """No codec libs in this container: auto must equal the pinned stub
    path bit-for-bit, and available_decoders() must say why."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(20)
    media = mm.synthesize_media_from_documents(docs)
    assert mm.available_decoders() == []
    stub = {r["media_id"]: r for r in mm.decode_features(media, decoder="stub").collect()}
    auto = {r["media_id"]: r for r in mm.decode_features(media, decoder="auto").collect()}
    assert stub.keys() == auto.keys()
    for mid in stub:
        assert stub[mid]["feature"] == auto[mid]["feature"]
        assert stub[mid]["content_sha256"] == auto[mid]["content_sha256"]


def test_decoder_dispatch_pil_required_raises_without_pil(spark):
    import pytest

    try:
        import PIL  # noqa: F401

        pytest.skip("PIL installed; the strict path would succeed")
    except ImportError:
        pass
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(2)
    media = mm.synthesize_media_from_documents(docs)
    with pytest.raises(Exception, match="PIL is not installed"):
        mm.decode_features(media, decoder="pil").collect()


def test_decoder_dispatch_rejects_unknown_name(spark):
    import pytest

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(2)
    media = mm.synthesize_media_from_documents(docs)
    with pytest.raises(ValueError, match="unknown decoder"):
        mm.decode_features(media, decoder="jpeg2000")


def test_decoder_real_pil_path_if_available(spark):
    """Exercised only when a codec lib lands in the container: a 1x1 PNG
    decodes to the resolution-aware feature, a non-image payload falls
    back to the stub feature without failing the batch."""
    import pytest

    pil = pytest.importorskip("PIL")  # noqa: F841
    import base64

    # 1x1 red pixel PNG
    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR4nGP8z8BQ"
        "DwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    rows = [(1, png), (2, b"definitely not an image")]
    media = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r for r in mm.decode_features(media, decoder="auto").collect()}
    assert out[1]["feature"][4] == pytest.approx(1 / 65535.0)  # width=1
    assert out[2]["feature"] == [b / 255.0 for b in __import__("hashlib").sha256(rows[1][1]).digest()[:8]]
