"""Distributed hashed-BoW logistic regression (operators/classify):
learnability on a separable fixture, the bit-stable-under-partitioning
claim (the module's central determinism contract), and prediction."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators import classify as clf

POS = ["good clean prose here", "well written good text", "good good prose"]
NEG = ["spam spam buy now", "buy spam click now", "spam click buy"]


@pytest.fixture(scope="module")
def labeled(spark):
    rows = [(i, t, 1) for i, t in enumerate(POS)] + [
        (i + 100, t, 0) for i, t in enumerate(NEG)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def test_featurize_l1_normalized_and_sorted(spark):
    d = spark.createDataFrame([(1, "a b a")], "doc_id long, text string")
    row = clf.featurize_hashed_bow(d, n_features=64).collect()[0]
    assert list(row["feats"]) == sorted(row["feats"])
    assert abs(sum(row["vals"]) - 1.0) < 1e-12
    assert len(row["feats"]) == len(set(row["feats"]))  # distinct buckets


def test_learns_separable_labels(labeled):
    w, hist = clf.train_logreg(labeled, n_features=64, iters=15, lr=2.0)
    rows = sorted(hist.collect(), key=lambda r: r["iter"])
    assert rows[-1]["correct"] == rows[-1]["n"] == 6  # fits the fixture
    assert rows[-1]["loss_q"] < rows[0]["loss_q"]  # loss decreased
    pred = {
        r["doc_id"]: r["prediction"]
        for r in clf.predict_logreg(labeled, w, n_features=64).collect()
    }
    assert all(pred[i] == 1 for i in range(3))
    assert all(pred[i + 100] == 0 for i in range(3))


def test_training_is_bit_stable_under_repartitioning(labeled):
    """The determinism contract: per-row fixed-point quantization before
    any cross-row sum makes the whole trajectory independent of
    partitioning — THE property that makes distributed training a
    reproducible artifact."""
    w1, h1 = clf.train_logreg(labeled, n_features=64, iters=8)
    w2, h2 = clf.train_logreg(
        labeled.repartition(7), n_features=64, iters=8
    )
    assert np.array_equal(w1, w2)
    assert sorted(map(tuple, h1.collect())) == sorted(map(tuple, h2.collect()))


def test_empty_frame_raises(spark):
    empty = spark.createDataFrame([], "doc_id long, text string, label int")
    with pytest.raises(ValueError, match="empty"):
        clf.train_logreg(empty, n_features=32, iters=1)


def test_parameter_guards(labeled):
    with pytest.raises(ValueError, match="scale_bits"):
        clf.train_logreg(labeled, scale_bits=10)
    with pytest.raises(ValueError, match="iters"):
        clf.train_logreg(labeled, iters=0)
    with pytest.raises(ValueError, match="n_features"):
        clf.featurize_hashed_bow(labeled, n_features=1)
    with pytest.raises(ValueError, match="weights length"):
        clf.predict_logreg(labeled, np.zeros(5), n_features=64)


def test_predict_scores_a_stream(spark, tmp_path, labeled):
    """Train on a batch, score a STREAM with the same weights — the
    deployment shape of the quality filter (the model is a closure
    constant, so predict_logreg is a stateless map and works unchanged
    under Structured Streaming)."""
    w, _ = clf.train_logreg(labeled, n_features=64, iters=15, lr=2.0)
    src = tmp_path / "in"
    src.mkdir()
    labeled.select("doc_id", "text").write.parquet(str(src / "b0.parquet"))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(src / "*")
    )
    scored = clf.predict_logreg(stream, w, n_features=64)
    q = (
        scored.writeStream.format("memory")
        .queryName("qc_stream_scores")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["doc_id"]: r["prediction"]
        for r in spark.sql("select * from qc_stream_scores").collect()
    }
    batch = {
        r["doc_id"]: r["prediction"]
        for r in clf.predict_logreg(
            labeled.select("doc_id", "text"), w, n_features=64
        ).collect()
    }
    assert got == batch and len(got) == 6
