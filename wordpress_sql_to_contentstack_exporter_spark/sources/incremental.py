"""Incremental source pulls via a persisted high-watermark.

The reference re-reads every table on every run (its only incremental
machinery is sink-side: skip-if-exists and the DLQ re-drive). For a
production source of WordPress scale-and-up, the standard pattern is a
HIGH WATERMARK on a monotonically increasing column (the numeric PK, or
a last-modified audit column): each run exports only rows past the
stored watermark, then advances it to the max it just exported.

The filter composes with the JDBC scan's predicate pushdown —
``pk > hwm`` travels into the remote WHERE clause and resolves on the
PK index, so an incremental run's source cost is proportional to the
NEW rows, not the table (file-based catalogs get the same filter
against parquet row-group stats). Crash safety: the watermark is
advanced by the CALLER after its sink commits, so a failed run re-reads
the same increment (at-least-once; the keyed-JSON sinks overwrite by
id, making the export idempotent).

``streaming/incremental.py`` is the file-arrival counterpart
(checkpoint-tracked); this module is the queryable-source counterpart
(watermark-tracked).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_watermark(path: str) -> int | None:
    """Last exported watermark, or None before the first successful run."""
    if not os.path.exists(path):
        return None
    with open(path) as f:
        doc = json.load(f)
    return doc.get("high_watermark")


def incremental_scan(df: DataFrame, column: str, watermark: int | None) -> DataFrame:
    """Rows strictly past the watermark (everything when None). The
    comparison is a plain pushable predicate — keep ``column`` a numeric
    PK or monotonic audit column."""
    if watermark is None:
        return df
    return df.filter(F.col(column) > F.lit(watermark))


def advance_watermark(path: str, df: DataFrame, column: str) -> int | None:
    """Persist max(column) of the exported increment; returns the new
    watermark (unchanged file and None if the increment was empty).

    Call AFTER the sink commits — advancing first would drop rows on a
    crash between advance and commit. One MIN/MAX-style aggregate job;
    with parquet sources Spark answers it from footer stats
    (``spark.sql.parquet.aggregatePushdown``).
    """
    row = df.agg(F.max(column).alias("hwm")).first()
    hwm = row["hwm"]
    if hwm is None:
        return None
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump({"high_watermark": int(hwm), "column": column}, f)
    os.replace(tmp, path)  # atomic: readers never see a torn file
    return int(hwm)
