"""Similarity search over embedding columns (array<float>).

Two paths:

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Cost is |Q| x |C|; fine when the query set is small (it's a broadcast
  nested-loop with per-row vector math in codegen), wrong when both sides
  are huge.
- ``lsh_topk``: random-hyperplane LSH bucketing — the scale path. Vectors
  only compare within matching signature buckets; multiple hash tables
  recover recall. At 100 TB the bucket join is a shuffle on small integer
  keys, never all-pairs.

Vector math uses built-in higher-order functions (zip_with/aggregate) in
double precision — JVM-side, deterministic left-to-right summation (which
the DuckDB oracle reproduces bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    ad, bd = _as_double(a), _as_double(b)
    return dot(ad, bd) / (l2_norm(ad) * l2_norm(bd))


def cosine_topk(
    queries: DataFrame,
    candidates: DataFrame,
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    Plan shape: broadcast the (small) query side, nested-loop join against
    candidates, per-query top-k via window. The candidate scan stays fully
    partitioned; only k rows per query survive to the final (tiny) sort.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = candidates.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv")
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        cosine(F.col("qv"), F.col("cv")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )


def hyperplane_signature(
    vec: Column, planes: list[list[float]]
) -> Column:
    """Random-hyperplane LSH signature: bit i = sign(dot(vec, plane_i)).

    ``planes`` is a driver-side list (seeded numpy), compiled into literal
    array expressions — broadcast by the plan, no side channel.
    """
    vd = _as_double(vec)
    bits = [
        F.when(
            dot(vd, F.array(*[F.lit(float(p)) for p in plane])) >= 0, F.lit(1)
        ).otherwise(F.lit(0))
        for plane in planes
    ]
    sig = bits[0]
    for b in bits[1:]:
        sig = sig * 2 + b
    return sig


def lsh_topk(
    queries: DataFrame,
    candidates: DataFrame,
    planes_tables: list[list[list[float]]],
    *,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates must share an LSH bucket with the
    query in at least one hash table, then exact cosine re-rank.

    ``planes_tables`` is a list of hash tables, each a list of hyperplanes.
    More tables -> higher recall, proportionally more candidate pairs.
    """
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"))
    c = candidates.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    q_b = q.select(
        "query_id",
        "qv",
        F.array(
            *[
                F.struct(F.lit(t).alias("t"), hyperplane_signature(F.col("qv"), planes).alias("sig"))
                for t, planes in enumerate(planes_tables)
            ]
        ).alias("sigs"),
    ).select("query_id", "qv", F.explode("sigs").alias("s"))
    c_b = c.select(
        "neighbor_id",
        "cv",
        F.array(
            *[
                F.struct(F.lit(t).alias("t"), hyperplane_signature(F.col("cv"), planes).alias("sig"))
                for t, planes in enumerate(planes_tables)
            ]
        ).alias("sigs"),
    ).select("neighbor_id", "cv", F.explode("sigs").alias("s"))

    paired = (
        q_b.join(
            c_b,
            (q_b["s.t"] == c_b["s.t"])
            & (q_b["s.sig"] == c_b["s.sig"])
            & (F.col("query_id") != F.col("neighbor_id")),
        )
        .select("query_id", "qv", "neighbor_id", "cv")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = paired.select(
        "query_id", "neighbor_id", cosine(F.col("qv"), F.col("cv")).alias("cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cos_sim", 6).alias("cos_sim"))
    )
