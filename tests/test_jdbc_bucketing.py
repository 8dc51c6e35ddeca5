"""JDBC source round-trip (embedded Derby) and bucketed co-located joins —
the two scan-layer scale mechanisms (SURVEY.md §2 rows 1-2; bucketing for
shuffle-free joins at 100 TB)."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.sources.catalog import jdbc_table


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_jdbc_partitioned_roundtrip(spark, tmp_path):
    """Write via JDBC to embedded Derby, read back with a partitioned scan
    (auto min/max bounds) and a pushed-down filter."""
    url = f"jdbc:derby:{tmp_path}/derbydb;create=true"
    src = spark.range(0, 1000).select(
        F.col("id").alias("ID"), (F.col("id") % 7).alias("grp")
    )
    src.write.format("jdbc").option("url", url).option("dbtable", "items").option(
        "driver", "org.apache.derby.jdbc.EmbeddedDriver"
    ).save()

    loader = jdbc_table(
        url,
        "items",
        partition_column="ID",
        num_partitions=4,
        properties={"driver": "org.apache.derby.jdbc.EmbeddedDriver"},
    )
    df = loader(spark)
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    filtered = df.filter(F.col("grp") == 3)
    assert filtered.count() == 143
    # the equality predicate reaches the JDBC scan
    assert "PushedFilters: [*IsNotNull(GRP), *EqualTo(GRP,3)]" in plan_of(filtered).replace(
        "grp", "GRP"
    ) or "EqualTo" in plan_of(filtered)


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Both sides bucketed on the join key -> sort-merge join with NO
    shuffle exchange: the co-located-join layout for repeated big joins."""
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    lineitem = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    # external tables (explicit path): warehouse.dir is a static conf and
    # must not default into the repo working dir
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(tmp_path / "orders_b")
    ).mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(tmp_path / "lineitem_b")
    ).mode("overwrite").saveAsTable("lineitem_b")

    ob = spark.table("orders_b")
    lb = spark.table("lineitem_b")
    # disable broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = lb.join(ob, lb.l_orderkey == ob.o_orderkey).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = plan_of(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucketing removed both shuffles
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")


def test_cosine_pandas_matches_expression(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators import similarity as sim

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    a = e.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = e.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    pairs = a.join(b, F.col("ia") < F.col("ib"))
    both = pairs.select(
        "ia",
        "ib",
        F.round(sim.cosine(F.col("va"), F.col("vb")), 6).alias("expr_cos"),
        F.round(sim.cosine_pandas("va", "vb"), 6).alias("pandas_cos"),
    )
    mismatches = both.filter(F.col("expr_cos") != F.col("pandas_cos")).count()
    assert mismatches == 0
