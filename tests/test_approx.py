"""Approximate aggregates stay within their error bounds vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_approx_count_distinct_error(spark):
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    row = l.agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("a"),
        F.countDistinct("l_partkey").alias("e"),
    ).first()
    assert abs(row["a"] - row["e"]) / row["e"] < 0.05


def test_percentile_approx_close_to_exact(spark):
    l = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    row = l.agg(
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("a"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("e"),
    ).first()
    assert abs(row["a"] - row["e"]) / row["e"] < 0.01


def test_hll_sketch_estimates_within_bound(spark):
    # Mergeable-sketch path (hll_sketches gate query): per-type estimates
    # and the merged __all__ estimate must stay within 2% of exact.
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import q_hll_sketches

    sf = "/root/testdata/sf0.001"
    est = {r["event_type"]: r["est_users"] for r in q_hll_sketches(spark, sf).collect()}
    e = spark.read.parquet(f"{sf}/events.parquet")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()
    }
    exact["__all__"] = e.select("user_id").distinct().count()
    assert set(est) == set(exact)
    for k, ex in exact.items():
        assert abs(est[k] - ex) / ex <= 0.02, (k, est[k], ex)
