"""Runtime configuration (the reference's config/index.json surface).

Maps the reference's config keys onto the engine: output paths, table
prefix, and source connection — but the MySQL credential block becomes a
JDBC URL + partitioned-read settings, and the prefix is a Catalog
parameter rather than a regex splice (SURVEY.md §2 row 41).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field


@dataclass
class SourceConfig:
    """JDBC source (production) or parquet directory (tests/lakehouse).

    Partition columns are resolved per table (``WP_PARTITION_COLUMNS``) —
    WordPress tables do NOT share a PK name (posts/users: ``ID``,
    postmeta: ``meta_id``, usermeta: ``umeta_id``, ...), and
    ``term_relationships`` has a composite PK so it reads unpartitioned.
    ``partition_overrides`` maps logical table name -> column (or None to
    force an unpartitioned read) for schema variants.
    """

    kind: str = "parquet"  # "parquet" | "jdbc"
    path: str = ""  # parquet dir
    jdbc_url: str = ""  # e.g. jdbc:mysql://host:3306/db
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    partition_overrides: dict[str, str | None] = field(default_factory=dict)
    num_partitions: int = 32


@dataclass
class ExportConfig:
    data_dir: str = "./wp_data"
    table_prefix: str = "wp_"
    locale: str = "en-us"
    asset_parallelism: int = 2  # reference guard.n(2), assets.js:172
    http_timeout_s: float = 60.0  # assets.js:84
    http_retries: int = 1  # assets.js:89-96
    source: SourceConfig = field(default_factory=SourceConfig)

    @classmethod
    def from_json(cls, path: str) -> "ExportConfig":
        with open(path) as f:
            doc = json.load(f)
        src = doc.get("source", {})
        if "partition_column" in src:
            # A single global column was the round-1 bug: only posts/users
            # have an ID column. Reject loudly rather than crash later on
            # SELECT MIN(ID) FROM wp_usermeta.
            raise ValueError(
                "source.partition_column is not supported: WordPress tables "
                "have different PK names. Use source.partition_overrides "
                '({"<logical table>": "<column>"}) to override the built-in '
                "per-table map."
            )
        mysql = src.get("mysql")
        jdbc_url = src.get("jdbc_url", "")
        jdbc_properties = dict(src.get("jdbc_properties", {}))
        kind = src.get("kind", "jdbc" if mysql else "parquet")
        if mysql and kind != "jdbc":
            # a mysql block with kind='parquet' would be silently ignored —
            # the defect class this parser exists to reject
            raise ValueError(
                f"source.mysql given but source.kind={kind!r}; remove the "
                "mysql block or set kind to 'jdbc'"
            )
        if mysql:
            from .sources.catalog import mysql_jdbc_options

            jdbc_url, mysql_props = mysql_jdbc_options(
                host=mysql.get("host", "localhost"),
                port=int(mysql.get("port", 3306)),
                database=mysql["database"],
                user=mysql.get("user", ""),
                password=mysql.get("password", ""),
            )
            # explicit jdbc_properties win over dialect defaults
            jdbc_properties = {**mysql_props, **jdbc_properties}
        return cls(
            data_dir=doc.get("data_dir", "./wp_data"),
            table_prefix=doc.get("table_prefix", "wp_"),
            locale=doc.get("locale", "en-us"),
            asset_parallelism=int(doc.get("asset_parallelism", 2)),
            http_timeout_s=float(doc.get("http_timeout_s", 60.0)),
            http_retries=int(doc.get("http_retries", 1)),
            source=SourceConfig(
                kind=kind,
                path=src.get("path", ""),
                jdbc_url=jdbc_url,
                jdbc_properties=jdbc_properties,
                partition_overrides=src.get("partition_overrides", {}),
                num_partitions=int(src.get("num_partitions", 32)),
            ),
        )


WP_TABLES = [
    "posts",
    "users",
    "usermeta",
    "postmeta",
    "terms",
    "term_taxonomy",
    "term_relationships",
    "options",
]

#: Numeric PK per WordPress core table (the JDBC partition column).
#: ``term_relationships`` has a composite PK (object_id,
#: term_taxonomy_id) — no single numeric column partitions it evenly, so
#: it reads unpartitioned (it is also the narrowest table by far).
WP_PARTITION_COLUMNS: dict[str, str | None] = {
    "posts": "ID",
    "users": "ID",
    "usermeta": "umeta_id",
    "postmeta": "meta_id",
    "terms": "term_id",
    "term_taxonomy": "term_taxonomy_id",
    "term_relationships": None,
    "options": "option_id",
}


def partition_column_for(name: str, source: SourceConfig) -> str | None:
    """Partition column for a logical table: explicit override wins, then
    the built-in WP map, else unpartitioned."""
    if name in source.partition_overrides:
        return source.partition_overrides[name]
    return WP_PARTITION_COLUMNS.get(name)


def build_catalog(spark, cfg: ExportConfig):
    """Resolve the configured source into a Catalog of logical WP tables."""
    from .sources.catalog import Catalog, jdbc_table, parquet_table

    cat = Catalog(spark, prefix=cfg.table_prefix)
    for name in WP_TABLES:
        physical = f"{cfg.table_prefix}{name}"
        if cfg.source.kind == "jdbc":
            cat.register(
                name,
                jdbc_table(
                    cfg.source.jdbc_url,
                    physical,
                    partition_column=partition_column_for(name, cfg.source),
                    num_partitions=cfg.source.num_partitions,
                    properties=cfg.source.jdbc_properties,
                ),
            )
        else:
            cat.register(name, parquet_table(f"{cfg.source.path}/{physical}.parquet"))
    return cat
