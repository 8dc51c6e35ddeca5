"""Cross-run incremental dedup manifest: the batch analogue of
``streaming/bloom_dedup`` (VERDICT r7 #7).

The operational loop a 100 TB curation pipeline runs daily: a new batch
of documents arrives; anything whose CONTENT was already kept by a
prior run must be skipped; the survivors ship and their hashes are
appended to a persisted manifest so the next run skips them. The
reference runs exactly this idempotency pattern per asset at human
scale — ``assets.js:78-80`` skips the download when the file already
exists on disk — and ``posts.js``'s re-run behavior depends on it; here
the "already exists" check is a LEFT ANTI join against a parquet
manifest of content hashes, and the "write the file" step is an
append of the new hashes.

Scale design:

- The manifest stores 64-char hex sha256 content hashes (plus the
  run_id that added each) — NEVER text. A trillion-document corpus is
  ~100 TB of text but ~70 GB of hashes: the manifest stays join-able
  on a cluster that could not re-scan the corpus.
- Within-batch dedup happens FIRST (min-id per hash — the
  deterministic keeper rule shared with ``dedup.exact_dedup``), so the
  anti-join probes one row per distinct content, not per document.
- The anti-join shuffles 32-byte hashes on both sides. For a manifest
  consumed every day, store it BUCKETED by ``content_hash`` (Spark
  ``bucketBy`` on a saved table) and repartition the batch side to the
  same scheme — the manifest-side shuffle then disappears from every
  daily run. The plain parquet layout here keeps the operator
  storage-agnostic; the bucketing is a one-line change at the write.
- Appends are IDEMPOTENT BY SEMANTICS, not by write-protocol: only
  hashes that survived the anti-join are appended, so re-running an
  already-applied batch appends nothing. If an orchestration-level
  retry replays a partially-applied append, the duplicate hash rows
  are harmless — the manifest is only ever consumed as an anti-join
  set (``first_seen_run`` of a duplicated hash is ambiguous, which is
  why it is provenance metadata, not an API).
- Runs against ONE manifest path must be SERIALIZED (an
  orchestrator-level lock, the normal shape for a daily loop). Two
  concurrent runs each read the pre-append snapshot, so a document
  present in both batches passes both anti-joins, ships twice, and
  its hash is appended twice. The replay-idempotency argument above
  covers serial re-runs only; there is no optimistic-concurrency
  protocol here because plain parquet appends offer no atomic
  compare-and-swap to build one on (a table format with snapshot
  isolation — e.g. the bucketed saved-table variant below under a
  metastore lock — is the upgrade path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .dedup import normalize_text

MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("first_seen_run", T.StringType(), True),
    ]
)


def _is_path_absent(e: Exception) -> bool:
    """True iff an AnalysisException means "the path does not exist" —
    the one condition that may bootstrap an empty manifest. Matches the
    stable error CONDITION first (``getCondition()``, Spark's versioned
    error-condition registry; named ``getErrorClass()`` pre-4.0, kept
    as the fallback accessor) and falls back to the two known message
    substrings only when the condition is unavailable; matching on
    message text alone is brittle across Spark versions (ADVICE r8).
    Drift still fails SAFE — an unrecognized error raises rather than
    silently bootstrapping."""
    get_cond = getattr(e, "getCondition", None) or getattr(
        e, "getErrorClass", None
    )
    if get_cond is not None:
        cond = get_cond()
        if cond is not None:
            return cond == "PATH_NOT_FOUND"
    msg = str(e)
    return "PATH_NOT_FOUND" in msg or "Path does not exist" in msg


def content_hash(text_col: str = "text"):
    """The manifest's hash definition: sha256 over the dedup family's
    normalized form (shared with ``exact_dedup`` so a corpus deduped
    batch-by-batch and one deduped whole agree on what "same content"
    means)."""
    return F.sha2(normalize_text(F.col(text_col)), 256)


def build_manifest(
    df: DataFrame, *, text_col: str = "text", run_id: str | None = None
) -> DataFrame:
    """Distinct content hashes of a corpus, in manifest schema — the
    bootstrap for a pipeline adopting incremental dedup over an
    already-published corpus."""
    out = df.select(content_hash(text_col).alias("content_hash")).distinct()
    # cast: F.lit(None) is VOID-typed, which parquet rejects — the
    # bootstrap output must be writable (round-8 review finding)
    return out.withColumn("first_seen_run", F.lit(run_id).cast("string"))


def manifest_dedup(
    new_docs: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_partitions: int | None = None,
) -> DataFrame:
    """Survivors of a new batch against the persisted manifest: one row
    per distinct NEW content, ``(id_col, content_hash)``, keeper =
    min id (deterministic). Everything already in the manifest — and
    every within-batch duplicate — is dropped.

    The exchange carries (hash, id) pairs only; the anti-join's
    manifest side carries hashes only. Document text never shuffles.

    ``batch_partitions`` exists for the BUCKETED manifest path: when
    the manifest scan arrives pre-partitioned (HashPartitioning on
    ``content_hash`` with the bucket count), EnsureRequirements aligns
    the join's two sides to the LARGER partition count — so a batch
    side at ``spark.sql.shuffle.partitions`` > buckets makes Spark
    re-shuffle the MANIFEST (exactly the exchange the layout exists to
    delete; surfaced by the round-9 plan test when a session ran at 32
    shuffle partitions against 8 buckets). Passing the bucket count
    here pins the batch's hash exchange to it, so both sides arrive
    equal and the manifest side can never be the one re-shuffled. The
    repartition replaces (not adds to) the groupBy's own exchange: the
    aggregation runs on the already-hash-partitioned child."""
    hashed = new_docs.select(
        F.col(id_col), content_hash(text_col).alias("content_hash")
    )
    if batch_partitions is not None:
        hashed = hashed.repartition(batch_partitions, F.col("content_hash"))
    batch_keepers = hashed.groupBy("content_hash").agg(
        F.min(id_col).alias(id_col)
    )
    return batch_keepers.join(
        manifest.select("content_hash"), "content_hash", "left_anti"
    ).select(id_col, "content_hash")


def read_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Load the manifest PINNED to the files present right now; a
    missing/empty path yields an empty manifest (first run bootstraps
    from nothing, the ``assets.js`` pattern where an absent file means
    "download everything").

    The pinning is load-bearing, not hygiene: the daily step reads the
    manifest, anti-joins, then APPENDS to the same path. A plain
    ``read.parquet(path)`` plan is lazy over the DIRECTORY, so any
    recompute of the survivor frame after the append (task retry,
    executor loss, a second action on the returned DataFrame) would see
    the batch's own freshly-appended hashes and anti-join the batch
    against itself — silently emptying the result. Enumerating the
    files once and reading exactly that list makes every recompute see
    the same pre-append snapshot."""
    from pyspark.errors import AnalysisException

    try:
        snapshot = spark.read.schema(MANIFEST_SCHEMA).parquet(path)
        files = snapshot.inputFiles()
    except AnalysisException as e:
        # ONLY path-absent means first-run bootstrap. Anything else — a
        # transient storage error, permissions, a corrupt footer — must
        # RAISE: swallowing it would return an empty manifest, the
        # anti-join would pass the entire previously-kept corpus, and
        # the run would silently re-ship and re-append everything
        # (round-8 review finding).
        if _is_path_absent(e):
            return spark.createDataFrame([], MANIFEST_SCHEMA)
        raise
    if not files:
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.read.schema(MANIFEST_SCHEMA).parquet(*files)


def append_survivors(
    survivors: DataFrame, path: str, *, run_id: str
) -> None:
    """Append the batch's surviving hashes to the manifest. Semantics
    make this idempotent across re-runs of an applied batch (the
    survivors of a replayed batch are empty — see module docstring)."""
    (
        survivors.select(
            "content_hash", F.lit(run_id).cast("string").alias("first_seen_run")
        )
        .write.mode("append")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Bucketed saved-table variant (VERDICT r8 #4): the daily-loop fast path
# ---------------------------------------------------------------------------

#: single source of truth for the bucketed manifest's bucket column —
#: the bucket spec is part of the table's on-disk contract, and every
#: writer (bootstrap + appends) must agree with it forever.
BUCKET_COL = "content_hash"


def build_manifest_bucketed(
    df: DataFrame,
    *,
    table: str,
    path: str,
    buckets: int = 64,
    text_col: str = "text",
    run_id: str | None = None,
) -> None:
    """Bootstrap the manifest as a saved table BUCKETED by
    ``content_hash`` — the one-line layout change the module docstring
    promises, made real. The plain-parquet manifest costs every daily
    run a full manifest-side shuffle (anti-join on ``content_hash``
    re-Exchanges the entire kept-corpus hash set — ~70 GB at a trillion
    docs — to probe a batch a thousandth its size); the bucketed layout
    pays one shuffle at bootstrap and NONE afterwards: the scan reports
    ``HashPartitioning(content_hash, buckets)``, so EnsureRequirements
    shuffles only the (small) batch side to the bucket count.
    Plan-asserted in ``tests/test_manifest_dedup.py`` (zero
    manifest-side Exchange, the ``test_jdbc_bucketing`` pattern).

    ``path`` is required (external table): warehouse.dir is a static
    conf and must not default into the working directory. ``buckets``
    is part of the table's permanent contract — appends validate
    against the stored spec and fail loudly on mismatch."""
    (
        build_manifest(df, text_col=text_col, run_id=run_id)
        .write.bucketBy(buckets, BUCKET_COL)
        .sortBy(BUCKET_COL)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_manifest_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Load the bucketed manifest via the catalog — the ONLY read that
    preserves the bucket spec (reading the parquet files directly, as
    the snapshot-pinned ``read_manifest`` does, drops the bucketing
    metadata and re-introduces the manifest-side Exchange). A missing
    table bootstraps empty, same as ``read_manifest``.

    Snapshot pinning is therefore handled DIFFERENTLY here: a catalog
    read is lazy over the table's current file listing, so
    ``incremental_dedup_run_bucketed`` materializes the survivor frame
    with an EAGER localCheckpoint before appending — the returned
    frame's lineage is truncated at materialized blocks computed
    strictly pre-append, and a lost-block failure raises (localCheckpoint
    cannot silently recompute through truncated lineage) rather than
    ever anti-joining the batch against its own append."""
    if not spark.catalog.tableExists(table):
        return spark.createDataFrame([], MANIFEST_SCHEMA)
    return spark.table(table)


def append_survivors_bucketed(
    survivors: DataFrame, table: str, *, run_id: str, buckets: int = 64
) -> None:
    """Append surviving hashes INTO THE BUCKET LAYOUT: each appended
    file lands in its hash bucket, so tomorrow's scan partitioning (and
    the zero-Exchange plan) survives every append. The bucket spec must
    match the table's stored spec — Spark validates and fails loudly on
    drift. Per-file sort within a bucket is kept (``sortBy``); once a
    bucket holds multiple files Spark conservatively drops the
    sorted-scan property and plans a local Sort before the merge join —
    cheap, and the Exchange elimination (the 70 GB item) is unaffected."""
    (
        survivors.select(
            BUCKET_COL, F.lit(run_id).cast("string").alias("first_seen_run")
        )
        .write.bucketBy(buckets, BUCKET_COL)
        .sortBy(BUCKET_COL)
        .mode("append")
        .saveAsTable(table)
    )


def incremental_dedup_run_bucketed(
    spark: SparkSession,
    new_docs: DataFrame,
    *,
    table: str,
    path: str,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    run_id: str,
) -> DataFrame:
    """The daily step on the bucketed layout: catalog read (bucket spec
    intact → manifest never shuffles) → anti-join → EAGER checkpoint of
    the survivors → append into the buckets → return the survivors.

    The eager checkpoint replaces ``read_manifest``'s file pinning
    (which is unavailable here — see ``read_manifest_bucketed``): the
    survivor rows are fully materialized from the pre-append snapshot
    before the append begins, and any post-append action reads those
    blocks. The failure mode under executor loss is a LOUD lost-block
    error, never a silent self-anti-join. On a multi-node cluster,
    substitute a reliable ``checkpoint()`` (checkpoint dir on shared
    storage) for the same guarantee across executor deaths."""
    if not spark.catalog.tableExists(table):
        build_manifest_bucketed(
            new_docs.limit(0),
            table=table,
            path=path,
            buckets=buckets,
            text_col=text_col,
            run_id=run_id,
        )
    manifest = read_manifest_bucketed(spark, table)
    survivors = manifest_dedup(
        new_docs,
        manifest,
        text_col=text_col,
        id_col=id_col,
        # pin the batch exchange to the bucket count so the manifest is
        # never the side EnsureRequirements re-shuffles (see
        # manifest_dedup's batch_partitions note)
        batch_partitions=buckets,
    ).localCheckpoint(eager=True)
    append_survivors_bucketed(
        survivors, table, run_id=run_id, buckets=buckets
    )
    return survivors


def build_neardup_manifest(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 2,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    run_id: str | None = None,
) -> DataFrame:
    """The NEAR-dup analogue of ``build_manifest``: one row per
    (kept doc, band) holding the doc's flat MinHash signature columns
    plus its (band, bucket) LSH key — exactly the frame the candidate
    join consumes, so tomorrow's batch probes it with one equi-join and
    no recomputation over the kept corpus. ~``bands x (8*num_hashes +
    24)`` bytes per doc (304 B at the 16/2 defaults — the signature
    repeats per band row; at web scale, normalize into a signature
    table + a band table if bands is large). Text is never stored.

    The (num_hashes, bands, shingle_k, shingle_mode) configuration is
    BAKED INTO the stored signatures: probing with a different
    configuration silently finds nothing, so the parameters must be
    pinned for the manifest's lifetime (store them alongside the path).
    """
    from .dedup import minhash_banded

    banded = minhash_banded(
        df,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        shingle_mode=shingle_mode,
    )
    return banded.withColumn("first_seen_run", F.lit(run_id).cast("string"))


def neardup_manifest_dedup(
    new_docs: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 2,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    min_est_jaccard: float = 0.9,
    max_bucket_size: int | None = 200_000,
) -> DataFrame:
    """New-batch ids that are NOT near-duplicates of the kept corpus:
    the daily batch-vs-manifest step that replaces re-running all-pairs
    LSH over corpus+batch (at 100 TB the kept corpus dwarfs any daily
    batch — recomputing its signatures daily is the cost this operator
    deletes).

    Plan: batch signatures once (lazy localCheckpoint — consumed by
    both the candidate join and the survivor anti-join), equi-join
    against the manifest on (band, bucket), estimate Jaccard from the
    two flat signatures (codegen sum of 16 primitive equalities, the
    ``minhash_lsh_candidates`` shape), drop batch ids with any match >=
    ``min_est_jaccard``. Output: one row per surviving batch id
    (``id_col``) — join back to the payload on the caller side.
    ``max_bucket_size`` drops pathological manifest buckets before the
    join (the boilerplate-bucket quadratic guard, same rationale as the
    LSH self-join's cap).

    Within-batch near-dups are OUT of scope by design: run the
    standard exact→LSH→cluster-keepers pipeline over the survivors
    before appending them (composition keeps each stage's oracle).
    """
    _probe, survivors = _neardup_probe_and_survivors(
        new_docs,
        manifest,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        shingle_mode=shingle_mode,
        min_est_jaccard=min_est_jaccard,
        max_bucket_size=max_bucket_size,
    )
    return survivors


def _neardup_probe_and_survivors(
    new_docs: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str,
    id_col: str,
    num_hashes: int,
    bands: int,
    shingle_k: int,
    shingle_mode: str,
    min_est_jaccard: float,
    max_bucket_size: int | None,
) -> tuple[DataFrame, DataFrame]:
    """Core of ``neardup_manifest_dedup``, also returning the
    checkpointed probe frame so ``incremental_neardup_run`` can append
    the SAME banded rows the dedup decision used — re-deriving
    signatures from ``new_docs`` would be a second evaluation, both
    wasteful and (for a non-deterministic source) able to append
    signatures for different content than the returned ids
    (round-8 review finding)."""
    from .dedup import minhash_banded

    probe = minhash_banded(
        new_docs,
        text_col,
        id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        shingle_mode=shingle_mode,
    ).localCheckpoint(eager=False)

    m = manifest
    if max_bucket_size is not None:
        small = (
            m.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("band", "bucket")
        )
        m = m.join(small, ["band", "bucket"], "left_semi")
    m = m.select(
        F.col("band"),
        F.col("bucket"),
        *[F.col(f"h{i}").alias(f"mh{i}") for i in range(num_hashes)],
    )

    matches = None
    for i in range(num_hashes):
        piece = (F.col(f"h{i}") == F.col(f"mh{i}")).cast("int")
        matches = piece if matches is None else matches + piece
    est = matches / F.lit(num_hashes)

    dropped = (
        probe.join(m, ["band", "bucket"])
        .filter(est >= F.lit(min_est_jaccard))
        .select(F.col("id"))
        .distinct()
    )
    survivors = (
        probe.select("id")
        .distinct()
        .join(dropped, "id", "left_anti")
        .select(F.col("id").alias(id_col))
    )
    return probe, survivors


def incremental_dedup_run(
    spark: SparkSession,
    new_docs: DataFrame,
    manifest_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    run_id: str,
) -> DataFrame:
    """The whole daily step: read manifest (pinned snapshot) →
    anti-join the batch → append the survivors' hashes → return the
    survivors. The returned frame stays lazy but recomputes against the
    PRE-append snapshot (see ``read_manifest``), so a caller action
    after the append returns the same rows that were appended."""
    manifest = read_manifest(spark, manifest_path)
    survivors = manifest_dedup(
        new_docs, manifest, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    # lazy localCheckpoint (the neardup twin's pattern): the append
    # materializes the survivor frame ONCE; caller actions afterwards
    # read the checkpointed blocks instead of re-running the batch
    # hash + anti-join — and, for a non-deterministic source, the
    # appended rows and the returned rows come from the SAME
    # evaluation (round-8 review finding).
    append_survivors(survivors, manifest_path, run_id=run_id)
    return survivors

def neardup_manifest_schema(num_hashes: int = 16) -> T.StructType:
    """Parquet schema of the persisted near-dup manifest: the flat
    signature columns plus (band, bucket) and provenance."""
    return T.StructType(
        [T.StructField("id", T.LongType(), False)]
        + [
            T.StructField(f"h{i}", T.LongType(), True)
            for i in range(num_hashes)
        ]
        + [
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bucket", T.LongType(), True),
            T.StructField("first_seen_run", T.StringType(), True),
        ]
    )


def read_neardup_manifest(
    spark: SparkSession, path: str, *, num_hashes: int = 16
) -> DataFrame:
    """Load the signature manifest, snapshot-pinned for the same
    read-probe-append reason as ``read_manifest`` (a post-append
    recompute must not probe the batch's own signatures)."""
    from pyspark.errors import AnalysisException

    schema = neardup_manifest_schema(num_hashes)
    try:
        snapshot = spark.read.schema(schema).parquet(path)
        files = snapshot.inputFiles()
    except AnalysisException as e:
        if _is_path_absent(e):
            return spark.createDataFrame([], schema)
        raise
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def incremental_neardup_run(
    spark: SparkSession,
    new_docs: DataFrame,
    manifest_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 2,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    min_est_jaccard: float = 0.9,
    max_bucket_size: int | None = 200_000,
    run_id: str,
) -> DataFrame:
    """The daily NEAR-dup step, symmetric with
    ``incremental_dedup_run``: read the signature manifest (pinned
    snapshot) → probe with the batch → append the SURVIVORS' banded
    signatures → return the surviving ids. The signature parameters
    must match the manifest's for its whole lifetime (see
    ``build_neardup_manifest``); survivors should additionally be
    near-deduped among themselves (the standard exact→LSH→keepers
    pipeline) before downstream use — their signatures are appended
    as-is, so tomorrow's batch dedups against ALL of today's keepers.
    """
    manifest = read_neardup_manifest(
        spark, manifest_path, num_hashes=num_hashes
    )
    probe, survivors = _neardup_probe_and_survivors(
        new_docs,
        manifest,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        shingle_mode=shingle_mode,
        min_est_jaccard=min_est_jaccard,
        max_bucket_size=max_bucket_size,
    )
    # Append the survivors' rows FROM THE CHECKPOINTED PROBE — the very
    # signatures the dedup decision consumed — never a fresh
    # minhash_banded over new_docs (a second evaluation: wasteful, and
    # able to diverge from the returned ids on a non-deterministic
    # source). Ids are stored as `id` (minhash_banded's convention).
    new_rows = probe.join(
        survivors.select(F.col(id_col).alias("id")), "id", "left_semi"
    ).withColumn("first_seen_run", F.lit(run_id).cast("string"))
    new_rows.write.mode("append").parquet(path=manifest_path)
    return survivors


# ---------------------------------------------------------------------------
# Bucketed NEAR-dup manifest (round 9): the (band, bucket) probe join
# gets the same zero-manifest-shuffle treatment as the exact path
# ---------------------------------------------------------------------------

#: bucket columns of the bucketed signature manifest — the probe join's
#: equi-keys, so co-partitioning by them is what deletes the
#: manifest-side Exchange from the daily run.
NEARDUP_BUCKET_COLS = ("band", "bucket")


def build_neardup_manifest_bucketed(
    df: DataFrame,
    *,
    table: str,
    path: str,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 2,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    run_id: str | None = None,
) -> None:
    """Bootstrap the signature manifest as a saved table BUCKETED by
    ``(band, bucket)`` — the probe join's equi-keys. The daily
    candidate join then reads the manifest pre-partitioned: only the
    (small) batch probe shuffles, and the ``max_bucket_size`` skew
    guard's groupBy + semi-join run exchange-free too (both sides of
    that semi-join derive from the same bucketed scan). At web scale
    the signature table is ~304 B/doc — hundreds of GB for a trillion
    docs — and this layout is the difference between re-shuffling it
    every day and never. Same contract notes as
    ``build_manifest_bucketed``: ``path`` required (external table),
    ``buckets`` and the signature parameters are permanent; appends
    validate the bucket spec."""
    banded = build_neardup_manifest(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        shingle_mode=shingle_mode,
        run_id=run_id,
    )
    (
        banded.write.bucketBy(buckets, *NEARDUP_BUCKET_COLS)
        .sortBy(*NEARDUP_BUCKET_COLS)
        .option("path", path)
        .mode("overwrite")
        .saveAsTable(table)
    )


def read_neardup_manifest_bucketed(
    spark: SparkSession, table: str, *, num_hashes: int = 16
) -> DataFrame:
    """Catalog read of the bucketed signature manifest (the only read
    that keeps the bucket spec — see ``read_manifest_bucketed`` for why
    snapshot pinning moves to the eager survivor checkpoint here). A
    missing table bootstraps empty."""
    if not spark.catalog.tableExists(table):
        return spark.createDataFrame([], neardup_manifest_schema(num_hashes))
    return spark.table(table)


def incremental_neardup_run_bucketed(
    spark: SparkSession,
    new_docs: DataFrame,
    *,
    table: str,
    path: str,
    buckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 2,
    shingle_k: int = 3,
    shingle_mode: str = "word",
    min_est_jaccard: float = 0.9,
    max_bucket_size: int | None = 200_000,
    run_id: str,
) -> DataFrame:
    """The daily NEAR-dup step on the bucketed layout, symmetric with
    ``incremental_dedup_run_bucketed``: catalog read (bucket spec
    intact → manifest never shuffles) → probe → EAGER checkpoint of the
    survivors (the snapshot-pinning mechanism; loud lost-block failure,
    never a silent self-probe) → append the survivors' banded
    signatures INTO the buckets → return the surviving ids."""
    if not spark.catalog.tableExists(table):
        build_neardup_manifest_bucketed(
            new_docs.limit(0),
            table=table,
            path=path,
            buckets=buckets,
            text_col=text_col,
            id_col=id_col,
            num_hashes=num_hashes,
            bands=bands,
            shingle_k=shingle_k,
            shingle_mode=shingle_mode,
            run_id=run_id,
        )
    manifest = read_neardup_manifest_bucketed(
        spark, table, num_hashes=num_hashes
    )
    probe, survivors = _neardup_probe_and_survivors(
        new_docs,
        manifest,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        shingle_mode=shingle_mode,
        min_est_jaccard=min_est_jaccard,
        max_bucket_size=max_bucket_size,
    )
    survivors = survivors.localCheckpoint(eager=True)
    # Appended rows come from the checkpointed probe, exactly as in the
    # plain-parquet run (same single-evaluation argument); the write
    # lands them in their (band, bucket) buckets so the layout survives
    # every append.
    new_rows = probe.join(
        survivors.select(F.col(id_col).alias("id")), "id", "left_semi"
    ).withColumn("first_seen_run", F.lit(run_id).cast("string"))
    (
        new_rows.write.bucketBy(buckets, *NEARDUP_BUCKET_COLS)
        .sortBy(*NEARDUP_BUCKET_COLS)
        .mode("append")
        .saveAsTable(table)
    )
    return survivors


# ---------------------------------------------------------------------------
# PORTABLE (md5) cross-run NEAR-dup manifest (round 12, VERDICT r11 #4):
# the persisted signatures become a cross-engine artifact
# ---------------------------------------------------------------------------


def neardup_manifest_portable_schema(num_hashes: int = 16) -> T.StructType:
    """Parquet schema of the PORTABLE signature manifest: md5 hex
    signature strings instead of xxhash64 longs — ~4x the bytes of the
    throughput manifest (32-char hex per position), bought for engine
    neutrality: any system with an md5 recomputes identical signatures
    and probes the same parquet, and the whole daily loop becomes
    hash-verifiable instead of recall-measured."""
    return T.StructType(
        [T.StructField("id", T.LongType(), False)]
        + [
            T.StructField(f"h{i}", T.StringType(), True)
            for i in range(num_hashes)
        ]
        + [
            T.StructField("band", T.IntegerType(), False),
            T.StructField("bucket", T.StringType(), True),
            T.StructField("first_seen_run", T.StringType(), True),
        ]
    )


def build_neardup_manifest_portable(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    run_id: str | None = None,
) -> DataFrame:
    """Banded PORTABLE manifest rows for the kept docs — one row per
    (doc, band) carrying the flat md5 signature plus its LSH key,
    exactly the frame `minhash_portable_pairs` banded internally
    (shared builders ``minhash_portable_signatures`` /
    ``portable_band_struct``, so operator and artifact cannot drift).
    Docs with fewer than ``shingle_k`` tokens have no signature and no
    manifest row — they carry no similarity signal (the portable pair
    family's documented convention)."""
    from .dedup import minhash_portable_signatures, portable_band_struct

    sigs = minhash_portable_signatures(
        df,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        shingle_k=shingle_k,
    )
    return (
        sigs.select(
            "id",
            *[f"h{i}" for i in range(num_hashes)],
            F.explode(portable_band_struct(num_hashes, bands)).alias("bb"),
        )
        .select(
            "id",
            *[f"h{i}" for i in range(num_hashes)],
            F.col("bb.band").alias("band"),
            F.col("bb.bucket").alias("bucket"),
        )
        .withColumn("first_seen_run", F.lit(run_id).cast("string"))
    )


def read_neardup_manifest_portable(
    spark: SparkSession, path: str, *, num_hashes: int = 16
) -> DataFrame:
    """Snapshot-pinned load of the portable signature manifest (same
    read-probe-append rationale as ``read_manifest``); a missing path
    bootstraps empty."""
    from pyspark.errors import AnalysisException

    schema = neardup_manifest_portable_schema(num_hashes)
    try:
        snapshot = spark.read.schema(schema).parquet(path)
        files = snapshot.inputFiles()
    except AnalysisException as e:
        if _is_path_absent(e):
            return spark.createDataFrame([], schema)
        raise
    if not files:
        return spark.createDataFrame([], schema)
    return spark.read.schema(schema).parquet(*files)


def neardup_probe_portable(
    new_docs: DataFrame,
    manifest: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_agree: int = 8,
    max_bucket_size: int | None = 50,
) -> tuple[DataFrame, DataFrame]:
    """Probe the batch against the portable manifest. Returns
    ``(probe_rows, scored)``: ``probe_rows`` are the batch's would-be
    manifest rows (lazily checkpointed — the append step reuses the
    SAME evaluation, the round-8 single-evaluation discipline), and
    ``scored`` is one row per batch doc: (id_col, max_agree,
    is_survivor) — ``max_agree`` the best signature agreement against
    any colliding manifest doc (0 when no bucket collision, including
    docs too short to sign), ``is_survivor = max_agree < min_agree``.
    Integer agreement, never a float threshold.

    Plan shape at 100 TB: collisions join COMPACT (band, bucket)
    frames — the 16x32-char signatures never ride the bucket exchange
    (review r11 #6's rule applied to the probe); the deduped collision
    pair set joins back to one-signature-row-per-doc frames on both
    sides, so signatures cross the wire once per colliding pair. The
    ``max_bucket_size`` cap drops pathological MANIFEST buckets whole
    before the join (the non-portable probe's guard, mirrored in the
    oracle as part of the semantics)."""
    probe_rows = build_neardup_manifest_portable(
        new_docs,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
    ).localCheckpoint(eager=False)

    m_band = manifest.select("id", "band", "bucket")
    if max_bucket_size is not None:
        small = (
            m_band.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__n"))
            .filter(F.col("__n") <= max_bucket_size)
            .select("band", "bucket")
        )
        m_band = m_band.join(small, ["band", "bucket"], "left_semi")

    coll = (
        probe_rows.select(F.col("id").alias("bid"), "band", "bucket")
        .join(m_band.select(F.col("id").alias("mid"), "band", "bucket"),
              ["band", "bucket"])
        .select("bid", "mid")
        .distinct()
    )
    bsig = probe_rows.dropDuplicates(["id"]).select(
        F.col("id").alias("bid"),
        *[F.col(f"h{i}").alias(f"__p{i}") for i in range(num_hashes)],
    )
    msig = manifest.dropDuplicates(["id"]).select(
        F.col("id").alias("mid"),
        *[F.col(f"h{i}").alias(f"__m{i}") for i in range(num_hashes)],
    )
    agree = None
    for i in range(num_hashes):
        piece = (F.col(f"__p{i}") == F.col(f"__m{i}")).cast("int")
        agree = piece if agree is None else agree + piece
    best = (
        coll.join(bsig, "bid")
        .join(msig, "mid")
        .select("bid", agree.alias("__agree"))
        .groupBy("bid")
        .agg(F.max("__agree").cast("long").alias("max_agree"))
    )
    scored = (
        new_docs.select(F.col(id_col))
        .join(best.select(F.col("bid").alias(id_col), "max_agree"),
              id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("max_agree"), F.lit(0).cast("long")).alias(
                "max_agree"
            ),
            (
                F.coalesce(F.col("max_agree"), F.lit(0).cast("long"))
                < F.lit(min_agree)
            ).alias("is_survivor"),
        )
    )
    return probe_rows, scored


def incremental_neardup_run_portable(
    spark: SparkSession,
    new_docs: DataFrame,
    manifest_path: str,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    shingle_k: int = 3,
    min_agree: int = 8,
    max_bucket_size: int | None = 50,
    run_id: str,
) -> DataFrame:
    """The daily PORTABLE near-dup step: read the manifest (pinned
    snapshot) → probe → EAGER checkpoint of the scores → append the
    survivors' signature rows → return the scored frame (id, max_agree,
    is_survivor). Because the artifact stores md5 signatures, ANY
    engine can audit the manifest, recompute a batch's signatures, and
    reproduce today's keep/drop decisions bit-for-bit — the property
    the registry gate `incremental_neardup_portable` hash-verifies
    against DuckDB across the full write → read → probe round trip."""
    manifest = read_neardup_manifest_portable(
        spark, manifest_path, num_hashes=num_hashes
    )
    probe_rows, scored = neardup_probe_portable(
        new_docs,
        manifest,
        text_col=text_col,
        id_col=id_col,
        num_hashes=num_hashes,
        bands=bands,
        shingle_k=shingle_k,
        min_agree=min_agree,
        max_bucket_size=max_bucket_size,
    )
    scored = scored.localCheckpoint(eager=True)
    survivors = scored.filter(F.col("is_survivor")).select(
        F.col(id_col).alias("id")
    )
    new_rows = probe_rows.join(survivors, "id", "left_semi").withColumn(
        "first_seen_run", F.lit(run_id).cast("string")
    )
    new_rows.write.mode("append").parquet(path=manifest_path)
    return scored


# ---------------------------------------------------------------------------
# Incremental SEMANTIC dedup manifest (round 9): the daily SemDeDup loop
# ---------------------------------------------------------------------------

SEMDEDUP_MANIFEST_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("cell", T.IntegerType(), False),
        T.StructField("unit", T.ArrayType(T.DoubleType()), False),
        T.StructField("first_seen_run", T.StringType(), True),
    ]
)


def _unit_vector(vec):
    """L2-normalized copy as a Column expression (zero vectors stay
    zero — cosine 0 to everything, the semdedup convention, so they can
    never be dropped as a dup of anything). The cast vector is
    let-bound and the norm rides an array_repeat argument (evaluated
    once): a computed ``n`` inside the per-element lambda re-ran the
    O(d) dot product per ELEMENT — O(d^2) per row (the round-11 HOF
    hazard; similarity.unit dodged it the same way)."""
    from ..functions.expr import let as _let
    from .similarity import _as_double, dot

    def body(v):
        n = F.sqrt(dot(v, v))
        return F.when(
            n > 0,
            F.zip_with(v, F.array_repeat(n, F.size(v)), lambda x, y: x / y),
        ).otherwise(v)

    return _let(_as_double(vec), body)


def build_semdedup_manifest(
    vectors: DataFrame,
    *,
    centers,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_cell_rows: int = 500_000,
    run_id: str | None = None,
) -> DataFrame:
    """Bootstrap the semantic-dedup manifest: SemDeDup the initial
    corpus under PREFIT ``centers`` (persist them with
    ``similarity.save_ann_index`` — the cell layout is part of the
    manifest's identity; see ``semdedup(centers=...)``) and emit one
    manifest row per survivor: (vec_id, cell, unit vector). Unit
    vectors are stored so the daily probe is a plain dot product —
    ~8·dim bytes per kept row, text/payload never stored.
    """
    from . import similarity as sim

    kept = sim.semdedup(
        vectors,
        id_col=id_col,
        vec_col=vec_col,
        n_cells=len(centers),
        threshold=threshold,
        max_cell_rows=max_cell_rows,
        centers=centers,
    ).filter(F.col("keep"))
    return (
        vectors.select(
            F.col(id_col).alias("vec_id"), _unit_vector(F.col(vec_col)).alias("unit")
        )
        .join(kept.select(F.col(id_col).alias("vec_id"), "cell"), "vec_id")
        .select(
            "vec_id",
            "cell",
            "unit",
            F.lit(run_id).cast("string").alias("first_seen_run"),
        )
    )


def read_semdedup_manifest(spark: SparkSession, path: str) -> DataFrame:
    """Load the semantic manifest, snapshot-pinned for the same
    read-probe-append reason as ``read_manifest`` (a post-append
    recompute must not probe the batch's own survivors)."""
    from pyspark.errors import AnalysisException

    try:
        snapshot = spark.read.schema(SEMDEDUP_MANIFEST_SCHEMA).parquet(path)
        files = snapshot.inputFiles()
    except AnalysisException as e:
        if _is_path_absent(e):
            return spark.createDataFrame([], SEMDEDUP_MANIFEST_SCHEMA)
        raise
    if not files:
        return spark.createDataFrame([], SEMDEDUP_MANIFEST_SCHEMA)
    return spark.read.schema(SEMDEDUP_MANIFEST_SCHEMA).parquet(*files)


def semdedup_manifest_dedup(
    batch: DataFrame,
    manifest: DataFrame,
    *,
    centers,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_cell_rows: int = 500_000,
) -> DataFrame:
    """Batch rows that are NOT semantic duplicates of the kept corpus,
    then SemDeDup'd within the batch — the daily loop that never
    recomputes over the kept corpus (its unit vectors are read back,
    not re-embedded or re-clustered):

    1. assign batch cells under the SAME prefit centers (map-only) and
       L2-normalize;
    2. probe: ONE cell-keyed equi-join against the manifest, kill any
       batch row whose dot product with a kept unit vector is >=
       ``threshold`` (distinct batch-id semi-set, then anti-join);
    3. within-batch pass: ``semdedup(centers=...)`` over the remaining
       rows (a batch can contain its own semantic dups).

    Cost model matches semdedup itself: the probe join fans out
    |batch ∩ cell| x |kept ∩ cell| per cell — bounded by cell sizes,
    never corpus-quadratic; the manifest side carries (cell, unit)
    rows only. Output: manifest-schema rows for the batch's survivors
    (append with :func:`append_semdedup_survivors`).
    """
    from . import similarity as sim

    assigned = batch.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col),
        sim.cell_assign_pandas(vec_col, centers).alias("cell"),
        _unit_vector(F.col(vec_col)).alias("unit"),
    ).localCheckpoint(eager=False)
    kept_side = manifest.select(
        "cell", F.col("unit").alias("__kept_unit")
    )
    dup_ids = (
        assigned.join(kept_side, "cell")
        .filter(sim.dot(F.col("unit"), F.col("__kept_unit")) >= threshold)
        .select("vec_id")
        .distinct()
    )
    remaining = assigned.join(dup_ids, "vec_id", "left_anti")
    within = sim.semdedup(
        remaining.select("vec_id", F.col(vec_col)),
        id_col="vec_id",
        vec_col=vec_col,
        n_cells=len(centers),
        threshold=threshold,
        max_cell_rows=max_cell_rows,
        centers=centers,
    ).filter(F.col("keep"))
    return remaining.join(within.select("vec_id"), "vec_id").select(
        "vec_id", "cell", "unit", F.lit(None).cast("string").alias("first_seen_run")
    )


def append_semdedup_survivors(
    survivors: DataFrame, path: str, *, run_id: str
) -> None:
    """Append the batch's surviving (vec_id, cell, unit) rows. Same
    serial-runs contract as ``append_survivors`` (module docstring)."""
    (
        survivors.select(
            "vec_id", "cell", "unit",
            F.lit(run_id).cast("string").alias("first_seen_run"),
        )
        .write.mode("append")
        .parquet(path)
    )


def incremental_semdedup_run(
    spark: SparkSession,
    batch: DataFrame,
    path: str,
    *,
    centers,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    max_cell_rows: int = 500_000,
    run_id: str = "run",
) -> DataFrame:
    """One daily semantic-dedup step: read (snapshot-pinned) -> probe +
    within-batch prune -> append survivors -> return them. First run
    against an absent path bootstraps (the whole batch is the probe's
    trivial survivor set and seeds the manifest)."""
    manifest = read_semdedup_manifest(spark, path)
    survivors = semdedup_manifest_dedup(
        batch,
        manifest,
        centers=centers,
        id_col=id_col,
        vec_col=vec_col,
        threshold=threshold,
        max_cell_rows=max_cell_rows,
    ).localCheckpoint(eager=False)
    append_semdedup_survivors(survivors, path, run_id=run_id)
    return survivors


def manifest_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    key: str = "content_hash",
) -> DataFrame:
    """Snapshot diff between two manifest versions (round 15): one row
    per key present in either snapshot with its lifecycle ``status`` —
    ``added`` (new only), ``removed`` (old only), ``retained`` (both).

    This is the audit step the cross-run manifest family was missing:
    the incremental loops PROVE idempotence and survivor correctness
    per run, but a release review asks a between-release question —
    "what changed between snapshot N and N+1, and was anything
    removed?" (an append-only manifest must never produce ``removed``
    rows; a compaction or re-bootstrap legitimately does, and the diff
    is how that is signed off). Works over any of the family's
    manifests — the exact, bucketed and portable variants all carry
    ``content_hash``; pass ``key`` for the semantic manifest's id.

    Shape: distinct on each side (manifests are distinct-by-contract
    already; the projection keeps the diff safe over raw survivor
    logs too), then a full outer join on the key — one hash-keyed
    exchange per side, carrying 32-byte keys only. At 100 TB the
    snapshots are the SMALL data (one row per distinct content), and
    the join keys co-partition; nothing here touches document text.
    """
    o = old.select(F.col(key)).distinct().withColumn("__old", F.lit(True))
    n = new.select(F.col(key)).distinct().withColumn("__new", F.lit(True))
    j = o.join(n, key, "full_outer")
    return j.select(
        key,
        F.when(F.col("__old").isNull(), F.lit("added"))
        .when(F.col("__new").isNull(), F.lit("removed"))
        .otherwise(F.lit("retained"))
        .alias("status"),
    )
