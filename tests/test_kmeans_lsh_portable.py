"""Round-12 additions: the portable sign-plane LSH top-k and the
distributed exact-contract Lloyd k-means.

Both operators' REAL gate is the DuckDB oracle (registry entries
``ann_lsh_portable`` / ``kmeans_lloyd``, hash-compared by the driver);
these tests pin the properties the oracle cannot see — agreement with
an independent plain-Python reference (different evaluation substrate,
same contract), recall against the exact path, determinism across
re-runs, and the Lloyd descent invariant.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators import similarity as sim

SF_DIR = "/root/testdata/sf0.001"
SCALE = 2**20


@pytest.fixture(scope="module")
def vectors(spark):
    return (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
    )


def _pyvecs(vectors) -> dict[int, list[float]]:
    return {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in vectors.collect()
    }


def _sgn(t: int, p: int, d: int) -> int:
    return 1 if hashlib.md5(f"{t}:{p}:{d}".encode()).hexdigest()[0] in "89abcdef" else -1


def _py_bucket(v: list[float], t: int, num_planes: int) -> str:
    bits = []
    for p in range(num_planes):
        acc = 0
        for d, x in enumerate(v):
            acc += _sgn(t, p, d) * math.floor(float(x) * SCALE)
        bits.append("1" if acc >= 0 else "0")
    return "".join(bits)


def test_sign_planes_match_hashlib_reference():
    planes = sim.portable_sign_planes(2, 3, 5)
    for t in range(2):
        for p in range(3):
            for d in range(5):
                assert planes[t][p][d] == _sgn(t, p, d)
                assert planes[t][p][d] in (-1, 1)


def test_lsh_portable_topk_properties(spark, vectors):
    dim = len(vectors.select("embedding").first()["embedding"])
    q = vectors.filter(F.col("vec_id") < 5)
    out = sim.lsh_topk_portable(q, vectors, dim=dim, k=5).collect()
    pv = _pyvecs(vectors)

    # every returned neighbor genuinely collides with its query in >= 1
    # table under the plain-Python bucket definition (the cross-engine
    # contract re-derived on a third substrate)
    for r in out:
        qid, nid = int(r["query_id"]), int(r["neighbor_id"])
        assert qid != nid
        assert any(
            _py_bucket(pv[qid], t, 4) == _py_bucket(pv[nid], t, 4)
            for t in range(8)
        ), (qid, nid)

    # ranks are 1..n contiguous per query, ordered by descending cosine
    by_q: dict[int, list] = {}
    for r in out:
        by_q.setdefault(int(r["query_id"]), []).append(r)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        assert [int(r["rank"]) for r in rows] == list(range(1, len(rows) + 1))
        sims = [float(r["cos_sim"]) for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert len(rows) <= 5


def test_lsh_portable_recall_floor_vs_exact(spark, vectors):
    """Measured recall@5 of the shipped 4x8 sign-plane geometry vs the
    exact brute-force top-5, on the sf0.001 fixture (500 Gaussian
    vectors): measured 0.72 at authoring time (0.73 at sf0.01, 0.75 at
    sf0.1 — on par with the Gaussian-plane lsh_gate's 0.73, i.e. the
    ±1 sign degradation costs nothing at this geometry); pinned at 0.6
    so a plane-family regression trips loudly while normal fixture
    drift does not."""
    dim = len(vectors.select("embedding").first()["embedding"])
    q = vectors.filter(F.col("vec_id") < 20)
    approx = sim.lsh_topk_portable(q, vectors, dim=dim, k=5).collect()
    exact = sim.cosine_topk(q, vectors, k=5).collect()
    ap = {(int(r["query_id"]), int(r["neighbor_id"])) for r in approx}
    ex = {(int(r["query_id"]), int(r["neighbor_id"])) for r in exact}
    recall = len(ap & ex) / len(ex)
    assert recall >= 0.6, recall


def test_lsh_portable_is_deterministic(spark, vectors):
    dim = len(vectors.select("embedding").first()["embedding"])
    q = vectors.filter(F.col("vec_id") < 5)

    def snap():
        return sorted(
            (int(r["query_id"]), int(r["neighbor_id"]), int(r["rank"]), float(r["cos_sim"]))
            for r in sim.lsh_topk_portable(q, vectors, dim=dim, k=5).collect()
        )

    assert snap() == snap()


def _py_lloyd(pv: dict[int, list[float]], k: int, iters: int):
    """Plain-Python replica of the exact contract: sequential dot folds,
    integer-scaled centroid sums, (dist, cluster) lexicographic argmin.
    Every arithmetic step mirrors the operator's, so agreement is exact
    — not approximate — by construction."""

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    cents = {j: (list(pv[j]), dot(pv[j], pv[j])) for j in sorted(pv)[:k]}

    def assign():
        out = {}
        for vid, v in pv.items():
            vv = dot(v, v)
            best = None
            for j, (c, cc) in sorted(cents.items()):
                dist = (vv - 2.0 * dot(v, c)) + cc
                key = (dist, j)
                if best is None or key < best:
                    best = key
            out[vid] = best
        return out

    for _ in range(iters):
        a = assign()
        sums: dict[int, list[int]] = {}
        ns: dict[int, int] = {}
        for vid, (_, j) in a.items():
            sv = [math.floor(x * SCALE) for x in pv[vid]]
            if j not in sums:
                sums[j] = [0] * len(sv)
                ns[j] = 0
            ns[j] += 1
            for d, s in enumerate(sv):
                sums[j][d] += s
        cents = {}
        for j, s in sums.items():
            c = [float(x) / ns[j] / float(SCALE) for x in s]
            cents[j] = (c, dot(c, c))
    return assign()


def test_kmeans_matches_python_reference_exactly(spark, vectors):
    pv = _pyvecs(vectors)
    ref = _py_lloyd(pv, k=8, iters=2)
    got = {
        int(r["vec_id"]): (float(r["sq_dist"]), int(r["cluster"]))
        for r in sim.kmeans_lloyd_distributed(vectors, k=8, iters=2).collect()
    }
    assert set(got) == set(ref)
    for vid in ref:
        assert got[vid][1] == ref[vid][1], vid
        # bit-identical distances: both substrates run the same
        # correctly-rounded op sequence on the same operands
        assert got[vid][0] == ref[vid][0], vid


def test_kmeans_descends_and_is_deterministic(spark, vectors):
    def mean_dist(iters: int) -> float:
        rows = sim.kmeans_lloyd_distributed(vectors, k=8, iters=iters).collect()
        return sum(float(r["sq_dist"]) for r in rows) / len(rows)

    d0, d2 = mean_dist(0), mean_dist(2)
    # Lloyd descent; the 2^-20 centroid quantization can cost at most a
    # hair, so allow an epsilon rather than asserting strict decrease
    assert d2 <= d0 + 1e-6, (d0, d2)

    a = sorted(
        (int(r["vec_id"]), int(r["cluster"]))
        for r in sim.kmeans_lloyd_distributed(vectors, k=8, iters=2).collect()
    )
    b = sorted(
        (int(r["vec_id"]), int(r["cluster"]))
        for r in sim.kmeans_lloyd_distributed(vectors, k=8, iters=2).collect()
    )
    assert a == b


def test_kmeans_partitioning_invariance(spark, vectors):
    """The exact integer-sum contract's whole point: assignments and
    distances must be identical under a different physical partitioning
    (combine-order wobble in a naive double-avg update would flip
    boundary assignments by iteration 2)."""
    one = vectors.coalesce(1)
    many = vectors.repartition(7)
    ra = sorted(
        (int(r["vec_id"]), int(r["cluster"]), float(r["sq_dist"]))
        for r in sim.kmeans_lloyd_distributed(one, k=8, iters=2).collect()
    )
    rb = sorted(
        (int(r["vec_id"]), int(r["cluster"]), float(r["sq_dist"]))
        for r in sim.kmeans_lloyd_distributed(many, k=8, iters=2).collect()
    )
    assert ra == rb


def test_ivf_portable_full_probe_equals_exact(spark, vectors):
    """With nprobe == kcells the probe covers every cell, so the
    'approximate' result must EQUAL the brute-force top-k bit-for-bit —
    the IVF machinery proven lossless, isolating approximation to the
    probe truncation alone."""
    q = vectors.filter(F.col("vec_id") < 10)
    ivf = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]), float(r["cos_sim"]))
        for r in sim.ivf_topk_portable(
            q, vectors, kcells=8, iters=2, nprobe=8, k=5
        ).collect()
    )
    exact = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]), float(r["cos_sim"]))
        for r in sim.cosine_topk(q, vectors, k=5).collect()
    )
    assert ivf == exact


def test_ivf_portable_recall_floor_vs_exact(spark, vectors):
    """Measured recall@5 at the shipped geometry (kcells=8, iters=2,
    nprobe=2 — a 2/8 probe fraction) on the clusterless Gaussian
    fixtures: 0.71 (sf0.001) / 0.62 (sf0.01) / 0.66 (sf0.1) at
    authoring time, in line with the xxhash-era ivf gate's 0.76.
    Floor 0.5 trips on a quantizer/probe regression, not fixture
    drift."""
    q = vectors.filter(F.col("vec_id") < 20)
    ap = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.ivf_topk_portable(
            q, vectors, kcells=8, iters=2, nprobe=2, k=5
        ).collect()
    }
    ex = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.cosine_topk(q, vectors, k=5).collect()
    }
    recall = len(ap & ex) / len(ex)
    assert recall >= 0.5, recall


def test_ivf_portable_is_deterministic(spark, vectors):
    q = vectors.filter(F.col("vec_id") < 5)

    def snap():
        return sorted(
            (int(r["query_id"]), int(r["neighbor_id"]), int(r["rank"]), float(r["cos_sim"]))
            for r in sim.ivf_topk_portable(
                q, vectors, kcells=8, iters=2, nprobe=2, k=5
            ).collect()
        )

    assert snap() == snap()


def test_kmeans_seed_contract_is_smallest_ids_not_dense_zero_based(spark, vectors):
    """Review r12b #1: ids need not be dense 0-based. Shifting every id
    by +1000 must yield the SAME clustering — seeds are the k smallest
    ids (the same vectors), cluster labels are those seed ids (shifted
    by +1000), distances bit-identical. The old `id < k` filter would
    find zero seeds here and raise."""
    shifted = vectors.select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    base = {
        int(r["vec_id"]): (int(r["cluster"]), float(r["sq_dist"]))
        for r in sim.kmeans_lloyd_distributed(vectors, k=8, iters=2).collect()
    }
    got = {
        int(r["vec_id"]): (int(r["cluster"]), float(r["sq_dist"]))
        for r in sim.kmeans_lloyd_distributed(shifted, k=8, iters=2).collect()
    }
    assert set(got) == {vid + 1000 for vid in base}
    for vid, (c, d) in base.items():
        assert got[vid + 1000] == (c + 1000, d), vid


def test_pq_portable_full_rerank_equals_exact(spark, vectors):
    """With rerank >= |corpus| the ADC stage prunes nothing, so the
    result must EQUAL brute-force top-k bit-for-bit — the PQ machinery
    proven lossless, isolating approximation in the ADC truncation."""
    n = vectors.count()
    q = vectors.filter(F.col("vec_id") < 5)
    pq = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]), float(r["cos_sim"]))
        for r in sim.pq_topk_portable(
            q, vectors, dim=64, m=8, ncodes=16, iters=1, rerank=n, k=5
        ).collect()
    )
    exact = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]), float(r["cos_sim"]))
        for r in sim.cosine_topk(q, vectors, k=5).collect()
    )
    assert pq == exact


def test_pq_portable_recall_floor_vs_exact(spark, vectors):
    """Measured recall@5 at the shipped geometry (m=8 x 16 codes,
    1 update, rerank=64): 0.86 (sf0.001) / 0.77 (sf0.01) / 0.68
    (sf0.1) at authoring time. Floor 0.6 on the sf0.001 fixture."""
    q = vectors.filter(F.col("vec_id") < 20)
    ap = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.pq_topk_portable(
            q, vectors, dim=64, m=8, ncodes=16, iters=1, rerank=64, k=5
        ).collect()
    }
    ex = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.cosine_topk(q, vectors, k=5).collect()
    }
    recall = len(ap & ex) / len(ex)
    assert recall >= 0.6, recall


def test_pq_portable_rejects_bad_geometry(spark, vectors):
    with pytest.raises(ValueError):
        sim.pq_topk_portable(vectors, vectors, dim=64, m=7)
    with pytest.raises(ValueError):
        sim.pq_topk_portable(vectors, vectors, dim=64, m=8, k=10, rerank=5)


def test_pq_portable_validates_scale_bits_and_finite_literals(spark, vectors):
    """Review r12d: the batched training re-checks the
    embedding_centroids scale_bits bound, and _dlit refuses non-finite
    components loudly instead of emitting unparseable SQL."""
    with pytest.raises(ValueError):
        sim.pq_topk_portable(vectors, vectors, dim=64, m=8, scale_bits=31)
    with pytest.raises(ValueError):
        sim._dlit(float("inf"))
    with pytest.raises(ValueError):
        sim._dlit(float("nan"))
    assert sim._dlit(0.5) == "0.5D"


def test_ivfpq_portable_lossless_composition_equals_exact(spark, vectors):
    """Round 13 (VERDICT r12 #3): with nprobe = kcells the IVF
    restriction prunes nothing and with rerank >= |corpus| the ADC
    order is fully re-ranked — so the COMPOSITION must equal
    brute-force top-k bit-for-bit, proving each half contributes only
    its own, independently-dialable approximation."""
    n = vectors.count()
    q = vectors.filter(F.col("vec_id") < 5)
    got = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]), float(r["cos_sim"]))
        for r in sim.ivfpq_topk_portable(
            q, vectors, dim=64, kcells=8, coarse_iters=2, nprobe=8,
            m=8, ncodes=16, iters=1, rerank=n, k=5,
        ).collect()
    )
    exact = sorted(
        (int(r["query_id"]), int(r["rank"]), int(r["neighbor_id"]), float(r["cos_sim"]))
        for r in sim.cosine_topk(q, vectors, k=5).collect()
    )
    assert got == exact


def test_ivfpq_portable_candidates_are_ivf_restricted(spark, vectors):
    """Every IVF+PQ neighbor must come from a probed cell — the result
    set is a subset of the full-rerank IVF result at the same coarse
    geometry (the PQ stage can only drop candidates, never add)."""
    n = vectors.count()
    q = vectors.filter(F.col("vec_id") < 5)
    ivfpq = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.ivfpq_topk_portable(
            q, vectors, dim=64, kcells=8, coarse_iters=2, nprobe=2,
            m=8, ncodes=16, iters=1, rerank=n, k=n,
        ).collect()
    }
    ivf = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.ivf_topk_portable(
            q, vectors, kcells=8, iters=2, nprobe=2, k=n,
        ).collect()
    }
    assert ivfpq <= ivf
    assert ivfpq == ivf  # full rerank + k=n keeps every probed candidate


def test_ivfpq_portable_recall_floor_vs_exact(spark, vectors):
    """Measured recall@5 at the shipped geometry (kcells=8 / nprobe=2 /
    m=8 x 16 / rerank=64): 0.92 on the sf0.001 fixture at authoring
    time. Floor 0.6 — the composed index must not be worse than its
    weaker half's floor."""
    q = vectors.filter(F.col("vec_id") < 20)
    ap = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.ivfpq_topk_portable(
            q, vectors, dim=64, kcells=8, coarse_iters=2, nprobe=2,
            m=8, ncodes=16, iters=1, rerank=64, k=5,
        ).collect()
    }
    ex = {
        (int(r["query_id"]), int(r["neighbor_id"]))
        for r in sim.cosine_topk(q, vectors, k=5).collect()
    }
    recall = len(ap & ex) / len(ex)
    assert recall >= 0.6, recall


def test_ivfpq_portable_rejects_bad_geometry(spark, vectors):
    with pytest.raises(ValueError):
        sim.ivfpq_topk_portable(vectors, vectors, dim=64, m=7)
    with pytest.raises(ValueError):
        sim.ivfpq_topk_portable(vectors, vectors, dim=64, nprobe=9, kcells=8)
    with pytest.raises(ValueError):
        sim.ivfpq_topk_portable(vectors, vectors, dim=64, k=10, rerank=5)
    with pytest.raises(ValueError):
        sim.ivfpq_topk_portable(vectors, vectors, dim=64, scale_bits=31)


def test_lsh_portable_guards_dim_and_scale_bits(spark, vectors):
    """ADVICE r13: a wrong ``dim`` used to NULL-pad the zip_with, NULL
    the sign sums, and silently collide every mismatched row in the
    all-zero bucket (while the mirror diverged) — now it raises from
    the scaled-vector expression; and scale_bits is bounds-checked like
    the PQ family."""
    q = vectors.filter(F.col("vec_id") < 2)
    with pytest.raises(Exception, match="vector length"):
        sim.lsh_topk_portable(q, vectors, dim=63).collect()
    with pytest.raises(ValueError, match="scale_bits"):
        sim.lsh_topk_portable(q, vectors, dim=64, scale_bits=31)


def test_pq_family_guards_dim_mismatch(spark, vectors):
    """Review r13 #3: a wrong dim used to make Spark encode from a
    PREFIX of each vector while the mirror slices by len(v)//m — a
    silent cross-engine divergence. Both PQ entry points now raise
    loudly from the guarded vector projection."""
    q = vectors.filter(F.col("vec_id") < 2)
    with pytest.raises(Exception, match="vector length"):
        sim.pq_topk_portable(q, vectors, dim=32, m=8).collect()
    with pytest.raises(Exception, match="vector length"):
        sim.ivfpq_topk_portable(q, vectors, dim=32, m=8).collect()
