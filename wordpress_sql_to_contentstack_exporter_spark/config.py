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
    """JDBC source (production) or parquet directory (tests/lakehouse)."""

    kind: str = "parquet"  # "parquet" | "jdbc"
    path: str = ""  # parquet dir
    jdbc_url: str = ""  # e.g. jdbc:mysql://host:3306/db
    jdbc_properties: dict[str, str] = field(default_factory=dict)
    partition_column: str = "ID"
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
        return cls(
            data_dir=doc.get("data_dir", "./wp_data"),
            table_prefix=doc.get("table_prefix", "wp_"),
            locale=doc.get("locale", "en-us"),
            asset_parallelism=int(doc.get("asset_parallelism", 2)),
            http_timeout_s=float(doc.get("http_timeout_s", 60.0)),
            http_retries=int(doc.get("http_retries", 1)),
            source=SourceConfig(
                kind=src.get("kind", "parquet"),
                path=src.get("path", ""),
                jdbc_url=src.get("jdbc_url", ""),
                jdbc_properties=src.get("jdbc_properties", {}),
                partition_column=src.get("partition_column", "ID"),
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
                    partition_column=cfg.source.partition_column,
                    num_partitions=cfg.source.num_partitions,
                    properties=cfg.source.jdbc_properties,
                ),
            )
        else:
            cat.register(name, parquet_table(f"{cfg.source.path}/{physical}.parquet"))
    return cat
