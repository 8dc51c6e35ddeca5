"""SparkSession factory with scale-aware defaults.

Defaults chosen for the 100 TB target (AQE on, skew-join handling on,
UTC session timezone for ISO-8601 parity with the reference's
``toISOString`` — see SURVEY.md §2 row 35) while remaining correct on
local[N] test runs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "wordpress_sql_to_contentstack_exporter_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster the caller leaves it unset and spark-submit provides it.
    ``shuffle_partitions`` should be ~2-3x total cores on a cluster; locally
    we match core count so tiny test shuffles don't fan into 200 empty tasks.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus.isdigit() else 32

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # size-targeted coalescing (the Spark-docs-recommended production
        # setting): post-shuffle partitions aim at the advisory size
        # instead of maximal parallelism — fewer, fuller tasks; measured
        # -14% on the sf0.1 headline subset with no regression at the
        # 200k-doc dedup tier
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # answer eligible MIN/MAX/COUNT scans from parquet footer stats
        # instead of reading row groups (off by default; Spark only pushes
        # when semantics allow, so this is free at 100 TB)
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
