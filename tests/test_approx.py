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
