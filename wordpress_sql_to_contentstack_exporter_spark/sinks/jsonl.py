"""JSONL corpus sink/source — the LLM-training-data interchange format.

Curated corpora leave the engine as sharded ``.jsonl`` (one JSON object
per line, optionally gzipped) because every downstream trainer/tokenizer
toolchain reads it; they come back the same way. Both directions are
thin, deliberate wrappers over Spark's native distributed JSON
source/sink — the value here is pinning the contracts that make the
format safe at 100 TB:

- WRITE: deterministic content-keyed sharding (``xxhash64(id)`` hash
  partitioning), so re-runs place every document in the same shard and
  shard counts are an explicit, planned choice — never the incidental
  upstream partitioning (which would let one skewed upstream task emit
  a 500 GB shard). gzip by default: jsonl.gz is NOT splittable, so the
  shard size IS the read-parallelism unit downstream — another reason
  the count must be chosen, not inherited.
- READ: the schema is REQUIRED. Schema inference on JSON is a full
  extra pass over the corpus before the real one (2x the scan at
  100 TB) and silently types empty/odd shards differently between
  runs. Malformed lines follow the engine's dead-letter discipline
  (sinks/dlq.py; reference error path ``app.js:30-43``): PERMISSIVE
  parse with a corrupt-record column, split into (clean, dlq) frames
  so one bad line can neither kill a 100 TB job (FAILFAST) nor vanish
  (DROPMALFORMED) — the caller decides what the DLQ volume means.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

#: Name of the corrupt-record column surfaced by read_jsonl_corpus.
CORRUPT_COL = "_corrupt_record"


def write_jsonl_corpus(
    df: DataFrame,
    path: str,
    *,
    id_col: str = "doc_id",
    n_shards: int,
    compression: str | None = "gzip",
) -> None:
    """Write ``df`` as AT MOST ``n_shards`` JSONL shards under ``path``.

    Sharding is ``repartition(n_shards, xxhash64(id_col))`` — a hash
    exchange of the output rows (the one unavoidable shuffle of a
    sharded write), deterministic in the id so replays are
    shard-stable. Spark emits no file for an empty partition, so tiny
    or hash-collided inputs legitimately produce FEWER than
    ``n_shards`` files (ADVICE r10 #3); consumers must glob, never
    enumerate shard indices. ``n_shards`` has no default on purpose: at 100 TB it
    is a capacity decision (shards ~256 MB-1 GB keep the non-splittable
    gzip readable in parallel), and defaulting it would hide exactly
    the choice that matters.
    """
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    if CORRUPT_COL in df.columns:
        raise ValueError(
            f"{CORRUPT_COL!r} is reserved for the reader's corrupt-record "
            "channel and must not be written"
        )
    writer = (
        df.repartition(n_shards, F.xxhash64(F.col(id_col)))
        .write.mode("overwrite")
    )
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl_corpus(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus with an ENFORCED schema.

    Returns ``(clean, dlq)``: rows that parsed against ``schema``, and
    a dead-letter frame ``(raw_line)`` of malformed lines for the
    caller's DLQ sink. Both come from ONE parse pass; the split is a
    pair of map-only filters, so taking the DLQ frame costs nothing
    extra at plan time.

    The parse is ``read.text`` + a ``from_json`` PROJECTION rather than
    the native JSON source: Spark's JSON source disallows any query
    whose surviving references are only the corrupt-record column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN — column
    pruning would make corruption undecidable at the scan), and the
    optimizer prunes ``dlq.count()`` into exactly that shape. As an
    expression, ``from_json`` has no such restriction, runs the same
    parser against the same enforced schema, and keeps the whole read
    map-only (text source splits/decompresses identically).
    """
    return parse_jsonl_lines(spark.read.text(path), schema)


def parse_jsonl_lines(
    lines: DataFrame, schema: StructType | str
) -> tuple[DataFrame, DataFrame]:
    """Split a ``value: string`` frame of raw JSONL lines into
    (clean, dlq). Works on batch AND streaming frames (two stateless
    map-only filters over one ``from_json`` parse) — the streaming
    ingest (``streaming/jsonl_ingest.py``) reuses it per micro-batch.
    """
    if isinstance(schema, str):
        schema = StructType.fromDDL(schema)
    if CORRUPT_COL in schema.fieldNames():
        raise ValueError(f"schema must not declare the reserved {CORRUPT_COL!r}")
    from pyspark.sql.types import StringType, StructField

    # a fresh StructType — StructType.add MUTATES the receiver, which
    # would silently grow the caller's schema with the corrupt column
    data_fields = list(schema.fields)
    full = StructType(data_fields + [StructField(CORRUPT_COL, StringType())])
    parsed = lines.select(
        F.col("value"),
        F.from_json(
            "value",
            full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("__r"),
    )
    # from_json leaves the corrupt field NULL for clean rows and puts
    # the raw line there for malformed ones. A malformed row may still
    # carry nulls in data fields — the corrupt field is the
    # discriminator. Two inputs produce a NULL STRUCT instead (no
    # corrupt field to inspect): blank/whitespace-only lines and the
    # JSON literal ``null`` — both are non-documents and belong in the
    # DLQ, not as phantom all-null rows in the training corpus.
    is_clean = F.col("__r").isNotNull() & F.col(f"__r.{CORRUPT_COL}").isNull()
    clean = parsed.filter(is_clean).select(
        *[F.col(f"__r.{f.name}") for f in data_fields]
    )
    dlq = parsed.filter(~is_clean).select(F.col("value").alias("raw_line"))
    return clean, dlq
