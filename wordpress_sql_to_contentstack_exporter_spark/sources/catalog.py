"""Source catalog: logical table name -> DataFrame.

Replaces the reference's textual ``<<tableprefix>>`` SQL splicing
(helper.js:43-51, posts.js:179, authors.js:69, categories.js:88,
assets.js:159) with a registry that resolves logical names to physical
tables at plan time — never string-spliced SQL.

Two physical backends:

- ``parquet_table``: directory-of-parquet (tests, lakehouse).
- ``jdbc_table``: partitioned JDBC read. This replaces the reference's
  ``COUNT(*)`` + ``LIMIT skip,100`` page loop (posts.js:180,197-207 and
  clones) which is both serial and unsound (OFFSET pages lack a total
  order). A partitioned JDBC scan on a numeric column is parallel and
  exact, and Spark pushes filters/column pruning into the remote SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parquet_table(path: str) -> Callable[[SparkSession], DataFrame]:
    def load(spark: SparkSession) -> DataFrame:
        return spark.read.parquet(path)

    return load


def quote_ident(url: str, name: str) -> str:
    """Quote an identifier for the database behind a JDBC URL (backticks
    for MySQL/MariaDB, ANSI double quotes otherwise). Needed because the
    auto-bounds query below is raw SQL: unquoted identifiers case-fold
    (Derby/Postgres fold ``meta_id`` -> ``META_ID``/``meta_id``
    differently), while Spark's own generated scans quote via its dialect.
    """
    q = "`" if url.startswith(("jdbc:mysql:", "jdbc:mariadb:")) else '"'
    return f"{q}{name.replace(q, q * 2)}{q}"


def jdbc_table(
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> Callable[[SparkSession], DataFrame]:
    """Partitioned JDBC scan.

    At 100 TB-ish source scale the partition column should be the table's
    numeric PK — which in WordPress differs per table (``ID`` for
    posts/users, ``meta_id`` for postmeta, ...; see
    ``config.WP_PARTITION_COLUMNS``). Bounds can be fetched once via
    ``SELECT min(pk), max(pk)`` rather than a COUNT — O(1) on an indexed
    PK, and unlike OFFSET paging each partition's predicate is a disjoint
    range, so rows are never skipped/duplicated when the table mutates
    between pages.
    """

    def load(spark: SparkSession) -> DataFrame:
        if url.startswith("jdbc:derby:"):
            # Spark's stock Derby dialect maps strings to CLOB, which kills
            # pushed string predicates and NULL-string writes; swap in the
            # VARCHAR mapping before the first Derby scan (idempotent).
            from wordpress_sql_to_contentstack_exporter_spark.sources.derby import (
                ensure_derby_varchar_dialect,
            )

            ensure_derby_varchar_dialect(spark)
        reader = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", table)
            .option("fetchsize", str(fetch_size))
        )
        if properties:
            for k, v in properties.items():
                reader = reader.option(k, v)
        if partition_column is not None:
            lo, hi = lower_bound, upper_bound
            if lo is None or hi is None:
                bounds_reader = (
                    spark.read.format("jdbc")
                    .option("url", url)
                    .option(
                        "dbtable",
                        f"(SELECT MIN({quote_ident(url, partition_column)}) lo, "
                        f"MAX({quote_ident(url, partition_column)}) hi FROM {table}) b",
                    )
                )
                if properties:
                    # same driver/user/password as the data read — an
                    # authenticated server rejects the bounds query otherwise
                    for k, v in properties.items():
                        bounds_reader = bounds_reader.option(k, v)
                bounds = bounds_reader.load().first()
                # positional: databases differ in identifier case folding
                lo = bounds[0] if lo is None else lo
                hi = bounds[1] if hi is None else hi
            if lo is not None and hi is not None:
                reader = (
                    reader.option("partitionColumn", partition_column)
                    .option("lowerBound", str(lo))
                    .option("upperBound", str(hi))
                    .option("numPartitions", str(num_partitions))
                )
        return reader.load()

    return load


def mysql_jdbc_options(
    *,
    host: str,
    database: str,
    user: str = "",
    password: str = "",
    port: int = 3306,
    fetch_size: int = 10_000,
) -> tuple[str, dict[str, str]]:
    """MySQL dialect option set for ``jdbc_table`` — (url, properties).

    Mirrors the reference's connection block (helper.js:43-51,
    config/index.json:28-33: host/user/password/database) onto Spark's
    JDBC source with the knobs a real WordPress MySQL needs:

    - ``zeroDateTimeBehavior=convertToNull``: WP tables are full of
      ``0000-00-00 00:00:00`` sentinel dates, which Connector/J otherwise
      throws on.
    - ``tinyInt1isBit=false``: WP uses TINYINT(1) as small ints, not
      booleans.
    - ``useCursorFetch=true`` + ``fetchsize``: without cursor fetch,
      Connector/J materializes each partition's ENTIRE result set in
      executor memory before the first row is consumed — the difference
      between streaming a 1e9-row partition range and OOMing on it.
    - ``pushDownPredicate=true`` (Spark-side): filters travel into the
      remote WHERE clause; MySQL resolves them on the PK/index instead of
      shipping rows. (Spark's MySQLDialect quotes identifiers with
      backticks, so mixed-case WP column names like ``ID`` survive.)

    Only Derby is installed in this container, so MySQL coverage is the
    generated option map itself (unit-tested), with Derby as the live
    integration path.
    """
    url = f"jdbc:mysql://{host}:{port}/{database}"
    props = {
        "driver": "com.mysql.cj.jdbc.Driver",
        "user": user,
        "password": password,
        "zeroDateTimeBehavior": "convertToNull",
        "tinyInt1isBit": "false",
        "useCursorFetch": "true",
        "fetchsize": str(fetch_size),
        "pushDownPredicate": "true",
    }
    return url, props


@dataclass
class Catalog:
    """Logical-name -> loader registry with prefix handling.

    ``prefix`` mirrors the reference's ``table_prefix`` config
    (config/index.json:4): logical ``posts`` resolves to physical
    ``wp_posts`` — but as a registry key, not a regex splice into SQL.
    """

    spark: SparkSession
    prefix: str = ""
    _loaders: dict[str, Callable[[SparkSession], DataFrame]] = field(default_factory=dict)

    def register(self, name: str, loader: Callable[[SparkSession], DataFrame]) -> None:
        self._loaders[name] = loader

    def register_parquet_dir(self, directory: str, names: list[str]) -> None:
        for n in names:
            self.register(n, parquet_table(f"{directory}/{self.prefix}{n}.parquet"))

    def table(self, name: str) -> DataFrame:
        if name not in self._loaders:
            raise KeyError(f"table {name!r} not registered (have {sorted(self._loaders)})")
        return self._loaders[name](self.spark)

    def register_views(self) -> None:
        """Expose every registered table as a temp view for spark.sql()."""
        for name in self._loaders:
            self.table(name).createOrReplaceTempView(name)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one synthetic table, normalizing nanosecond timestamps.

    ``events.parquet`` stores ``ts`` as parquet TIMESTAMP(NANOS), which
    Spark rejects by default. Read nanos as long
    (``spark.sql.legacy.parquet.nanosAsLong``) and truncate to
    microseconds — the same truncation DuckDB applies, so oracle parity
    holds.
    """
    df_path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(df_path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(df_path)


def spread_small_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin repartition a frame ONLY when its scan yields fewer
    partitions than the session's parallelism — the guard that keeps
    expensive per-row map work (shingling, hashing, signature
    generation) off a single core when the input is a small
    single-row-group file.

    Why this exists (round 9, measured): the fixture tables are one
    parquet file with ONE row group each, and Spark's byte-range file
    splitting cannot divide a single row group — so every pre-exchange
    projection ran on one task no matter the core count. The dedup/
    overlap family spends its wall time exactly there (source_overlap:
    6.3 s single-task scan+shingle out of 6.9 s total at sf0.1).

    Why it is scale-honest: the repartition fires only when
    ``scan partitions < parallelism``. A production 100 TB corpus is
    thousands of files/row groups — the scan already yields more
    partitions than cores and this is a NO-OP; blindly repartitioning
    there would be a harmful full-corpus shuffle of raw bytes. The
    partition probe reads plan metadata, not data (no Spark job — the
    registry's build-laziness contract holds).
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)


_EMBEDDING_DIM_CACHE: dict[tuple[str, str], int] = {}


def embedding_dim(path: str, column: str = "embedding") -> int:
    """Vector width of a parquet embedding column, WITHOUT a Spark job.

    ``array<float>`` carries no width in its schema, so at query-build
    time the width must come from metadata, not a cluster-wide read.
    Resolution order:

    1. ``SPARK_GRAFT_EMBEDDING_DIM`` env override (cluster deployments
       pin the model's dimension here — zero I/O). NOTE: the override is
       global — it applies to EVERY (path, column) in the process, so it
       is only valid for single-embedding-source deployments (one model,
       one width). Jobs mixing embedding widths must leave it unset and
       rely on the per-source metadata probe below.
    2. A driver-local pyarrow read of the first record batches of ONE
       parquet file — footer + one column chunk, no Spark job scheduled.
       Cached per (path, column) for the process lifetime.

    Returns 0 for an empty/all-null table; callers short-circuit to an
    empty result instead of crashing.
    """
    import os

    env = os.environ.get("SPARK_GRAFT_EMBEDDING_DIM")
    if env:
        try:
            dim = int(env)
        except ValueError:
            raise ValueError(
                f"SPARK_GRAFT_EMBEDDING_DIM must be a positive integer, "
                f"got {env!r}"
            ) from None
        if dim <= 0:
            raise ValueError(
                f"SPARK_GRAFT_EMBEDDING_DIM must be a positive integer, "
                f"got {env!r}"
            )
        return dim
    key = (path, column)
    if key not in _EMBEDDING_DIM_CACHE:
        import glob

        import pyarrow.parquet as pq

        files = sorted(glob.glob(os.path.join(path, "*.parquet"))) if os.path.isdir(
            path
        ) else [path]
        dim = 0
        for f in files:
            pf = pq.ParquetFile(f)
            for batch in pf.iter_batches(batch_size=64, columns=[column]):
                vals = batch.column(0)
                for v in vals:
                    if v.is_valid:
                        dim = len(v)
                        break
                if dim:
                    break
            if dim:
                break
        _EMBEDDING_DIM_CACHE[key] = dim
    return _EMBEDDING_DIM_CACHE[key]


TPCH_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def testdata_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    """Catalog over the driver-generated synthetic tables (TESTDATA.md)."""
    cat = Catalog(spark)
    for n in TPCH_TABLES:
        cat.register(n, lambda s, _n=n: load_table(s, sf_dir, _n))
    return cat
