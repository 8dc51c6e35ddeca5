"""Distributed linear algebra for embedding columns: exact Gramian
sufficient statistics + PCA whitening.

Embedding preprocessing at corpus scale (whitening before ANN/dedup,
PCA for dimension reduction, covariance drift monitoring) needs ONE
distributed quantity: the Gramian/mean sufficient statistics
``(Σ vᵢvⱼ, Σ vᵢ, n)``. Everything downstream — covariance, eigenvectors,
whitening transform — is a ``d x d`` problem the driver solves in
microseconds. The classic scalable shape (one pass, map-side partial
Gramians, tiny shuffle) — never a row-pair join, never a global
collect of vectors.

Exactness discipline: vectors are integer-scaled ``floor(x * 2^scale_bits)``
BEFORE any product (exact in every engine, the registry's float
doctrine), so partial Gramians are exact longs and their sum is
combine-order-free — the statistics are bit-identical on any engine,
any partitioning, any retry. Overflow bound (documented, asserted):
``n * 2^(2*scale_bits + 2) < 2^63`` — at scale_bits=20 that allows
~2^21 rows; drop scale_bits as n grows (at 10^9 rows, scale_bits=10
still gives ~3 decimal digits of per-coordinate precision, and the
driver-side covariance divides the scale back out).

Stages:

- :func:`gram_stats` — Arrow-batched partial Gramians (numpy int64
  matmul per batch: d x d work per row batch, emitted as the d(d+1)/2
  upper triangle + d sums + count), then one tiny aggregation keyed on
  (i, j): the shuffle carries ~2k rows per PARTITION, independent of
  row count.
- :func:`pca_components` — driver-side covariance eigendecomposition
  from the collected statistics frame (a bounded d(d+1)/2-row collect,
  same contract as the IVF fit-sample collect).
- :func:`pca_project` — broadcast the (k x d) component matrix back
  into an Arrow-batched projection (optionally whitened:
  eigenvalue-normalized), map-only.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["gram_stats", "pca_components", "pca_project"]

_STATS_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType(), False),
        T.StructField("j", T.IntegerType(), False),
        T.StructField("val", T.LongType(), False),
    ]
)


def gram_stats(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    dim: int,
    scale_bits: int = 20,
) -> DataFrame:
    """Exact integer Gramian sufficient statistics of an
    ``array<float>`` column.

    Output rows (i, j, val):
      - ``0 <= i <= j < dim``: ``Σ_rows v_i * v_j`` (upper triangle of
        the scaled Gramian),
      - ``(i, -1)``: ``Σ_rows v_i`` (per-dimension scaled sums),
      - ``(-1, -1)``: row count.
    with ``v = floor(x * 2^scale_bits)`` per coordinate — exact longs,
    combine-order-free, engine-portable. Rows whose vector is NULL, of
    the wrong length, or containing a non-finite value (NaN/Inf would
    floor to int64 garbage and silently poison every cell) are SKIPPED
    and excluded from the count (documented; the oracle applies the
    same filters). An all-skipped/empty input yields an EMPTY frame
    (no zero-statistics rows — "no data" and "statistics of nothing"
    must not alias). The int64 bound is ENFORCED: each partition
    raises if any accumulated statistic passes 2^62 (margin below the
    wrap point), so an oversized corpus/scale_bits combination fails
    loudly instead of wrapping — lower ``scale_bits`` as n grows (the
    cross-partition combine is covered by the session's ANSI mode,
    which raises on long-sum overflow instead of wrapping).
    """
    scale = 1 << scale_bits
    iu = np.triu_indices(dim)
    limit = 1 << 62

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        gram = np.zeros((dim, dim), dtype=np.int64)
        sums = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            vecs = [
                v for v in pdf[vec_col] if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            x = np.asarray(vecs, dtype=np.float64)
            finite = np.isfinite(x).all(axis=1)
            if not finite.all():
                x = x[finite]
            if x.shape[0] == 0:
                continue
            v = np.floor(x * scale).astype(np.int64)
            # bound check BEFORE accumulating, in exact Python ints: a
            # single batch's matmul can wrap int64 internally, so a
            # post-hoc check would inspect already-corrupt values. The
            # worst-case increment is rows * max|v|^2 per cell.
            mx = int(np.abs(v).max()) if v.size else 0
            cur = int(np.abs(gram).max()) if n else 0
            if cur + v.shape[0] * mx * mx >= limit:
                raise OverflowError(
                    f"gram_stats int64 bound exceeded near {n} rows/partition "
                    f"with scale_bits={scale_bits}; lower scale_bits"
                )
            gram += v.T @ v
            sums += v.sum(axis=0)
            n += v.shape[0]
        if n == 0:
            return
        out_i = np.concatenate([iu[0], np.arange(dim), [-1]])
        out_j = np.concatenate([iu[1], np.full(dim, -1), [-1]])
        out_v = np.concatenate([gram[iu], sums, [n]])
        yield pd.DataFrame(
            {
                "i": out_i.astype("int32"),
                "j": out_j.astype("int32"),
                "val": out_v.astype("int64"),
            }
        )

    partial = df.select(vec_col).mapInPandas(run, _STATS_SCHEMA)
    return partial.groupBy("i", "j").agg(F.sum("val").cast("long").alias("val"))


def pca_components(
    stats: DataFrame, *, dim: int, scale_bits: int = 20, k: int | None = None
):
    """Driver-side eigendecomposition of the covariance implied by
    :func:`gram_stats` output. Returns ``(eigvals desc, components
    (k x dim), mean (dim,))`` as numpy float64 — a d x d problem, the
    one place a bounded collect (d(d+1)/2 + d + 1 rows) is the right
    call, mirroring the IVF fit-sample contract."""
    rows = {(r["i"], r["j"]): r["val"] for r in stats.collect()}
    n = rows.get((-1, -1), 0)  # empty stats frame == zero vectors
    if n < 2:
        raise ValueError(f"need >= 2 vectors, got {n}")
    scale = float(1 << scale_bits)
    mean = np.array([rows[(i, -1)] for i in range(dim)], dtype=np.float64) / n
    gram = np.zeros((dim, dim), dtype=np.float64)
    for i in range(dim):
        for j in range(i, dim):
            gram[i, j] = gram[j, i] = rows[(i, j)]
    cov = (gram - np.outer(mean, mean) * n) / (n - 1) / (scale * scale)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1]
    eigvals = eigvals[order]
    comps = eigvecs[:, order].T  # (dim, dim), row per component
    if k is not None:
        eigvals, comps = eigvals[:k], comps[:k]
    return eigvals, comps, mean / scale


def pca_project(
    df: DataFrame,
    components: np.ndarray,
    mean: np.ndarray,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    eigvals: np.ndarray | None = None,
    eps: float = 1e-9,
) -> DataFrame:
    """Project embeddings onto the component rows (center → matmul),
    whitened (unit variance per component) when ``eigvals`` is given.
    The (k x d) matrix rides the closure to every executor — a few KB —
    and the work is one numpy matmul per Arrow batch, map-only, no
    shuffle. Output: (``id_col``, projection array<double>); rows with
    a NULL id or malformed vector are skipped (gram_stats' discipline —
    a NULL id arrives as pandas NaN and int() on it would otherwise
    fail the task)."""
    comp = np.asarray(components, dtype=np.float64)
    mu = np.asarray(mean, dtype=np.float64)
    if eigvals is not None:
        comp = comp / np.sqrt(np.asarray(eigvals, dtype=np.float64) + eps)[:, None]

    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("projection", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = [
                (i, v)
                for i, v in zip(pdf[id_col], pdf[vec_col])
                if not pd.isna(i) and v is not None and len(v) == mu.shape[0]
            ]
            if not keep:
                continue
            ids = [int(i) for i, _ in keep]
            v = np.asarray([x for _, x in keep], dtype=np.float64)
            proj = (v - mu) @ comp.T
            yield pd.DataFrame(
                {id_col: pd.Series(ids, dtype="int64"), "projection": list(proj)}
            )

    return df.select(id_col, vec_col).mapInPandas(run, out_schema)
