"""Round-9 randomized property tests.

1. BM25 top-k against a direct Python model of the scoring formula over
   random small corpora and random queries — rank-for-rank on the
   fixed-point integer key (the exact key the operator sorts by), so
   any drift in tf/df/dl/avgdl accounting or the flooring surfaces.
2. DSIR direction property: appending a target-distinctive gram to a
   document RAISES its importance score; appending a raw-only gram
   LOWERS it (the defining monotonicity of a log-likelihood-ratio
   scorer) — checked on randomized corpora.
3. SemDeDup output invariants, self-checkable from the output alone:
   every dropped row carries a kept witness at >= threshold
   (max_kept_sim is only set on drops), every kept row has it NULL,
   and ids partition exactly (keep + drop == input).

Hypothesis drives the data; few, fat examples — Spark job latency
dominates (round-6/7 convention)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from wordpress_sql_to_contentstack_exporter_spark.operators import sampling as smp
from wordpress_sql_to_contentstack_exporter_spark.operators import similarity as sim
from wordpress_sql_to_contentstack_exporter_spark.operators import text as tx

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

_doc = st.lists(st.sampled_from(_WORDS), min_size=1, max_size=12).map(" ".join)


@given(
    texts=st.lists(_doc, min_size=2, max_size=10),
    qterms=st.sets(st.sampled_from(_WORDS), min_size=1, max_size=3),
)
@_SETTINGS
def test_bm25_topk_matches_python_model(spark, texts, qterms):
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    k = 5
    got = sorted(
        (
            (r["rank"], r["doc_id"], r["score_scaled"])
            for r in tx.bm25_topk(docs, [(1, sorted(qterms))], k=k).collect()
        )
    )
    # python model — same formula, same fixed-point floor, same tie rule
    toks = [t.split() for t in texts]
    n = len(toks)
    avgdl = sum(len(ts) for ts in toks) / n
    df = {
        q: sum(1 for ts in toks if q in ts) for q in qterms
    }
    scored = []
    for i, ts in enumerate(toks):
        sq = 0
        matched = False
        for q in qterms:
            tf = ts.count(q)
            if tf == 0:
                continue
            matched = True
            idf = math.log(1 + (n - df[q] + 0.5) / (df[q] + 0.5))
            s = idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * len(ts) / avgdl))
            sq += math.floor(s * (1 << 20))
        if matched:
            scored.append((-sq, i))
    scored.sort()
    want = sorted(
        (rank + 1, i, -negsq)
        for rank, (negsq, i) in enumerate(scored[:k])
    )
    assert got == want


@given(
    texts=st.lists(_doc, min_size=4, max_size=10),
)
@_SETTINGS
def test_dsir_scores_match_python_model_exactly(spark, texts):
    """Exact fixed-point recompute over randomized corpora (the evidence
    gate's method as a property): bucket map taken from the engine as
    data, everything else — bigramming, Laplace counts, log-ratio
    weights, flooring, summation — independently in Python. Exact
    equality on score_scaled, so hash collisions inside n_buckets are
    in-model, not flake."""
    from pyspark.sql import functions as F

    rows = list(enumerate(texts))
    raw = spark.createDataFrame(rows, "doc_id long, text string")
    target = raw.filter(raw.doc_id % 2 == 0)
    B = 256
    got = {
        r["doc_id"]: r["score_scaled"]
        for r in smp.dsir_importance(raw, target, n_buckets=B).collect()
    }
    grams = {}
    allg = set()
    for i, t in rows:
        ws = t.split()
        gs = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
        grams[i] = gs
        allg.update(gs)
    gl = sorted(allg)
    bucket = {
        g: r["b"]
        for g, r in zip(
            gl,
            spark.createDataFrame([(g,) for g in gl], "g string")
            .select(F.pmod(F.xxhash64("g"), F.lit(B)).alias("b"))
            .collect(),
        )
    } if gl else {}
    ct, cr = {}, {}
    nt = nr = 0
    for i, gs in grams.items():
        for g in gs:
            bk = bucket[g]
            cr[bk] = cr.get(bk, 0) + 1
            nr += 1
            if i % 2 == 0:
                ct[bk] = ct.get(bk, 0) + 1
                nt += 1
    w = {
        bk: math.floor(
            (
                math.log((ct.get(bk, 0) + 1) / (nt + B))
                - math.log((c + 1) / (nr + B))
            )
            * (1 << 20)
        )
        for bk, c in cr.items()
    }
    want = {
        i: sum(w[bucket[g]] for g in gs) for i, gs in grams.items()
    }
    assert got == want


@given(
    seeds=st.lists(
        st.tuples(
            st.floats(min_value=-1, max_value=1, allow_nan=False),
            st.floats(min_value=-1, max_value=1, allow_nan=False),
            st.floats(min_value=-1, max_value=1, allow_nan=False),
        ),
        min_size=3,
        max_size=12,
    ),
    threshold=st.sampled_from([0.8, 0.9, 0.95]),
)
@_SETTINGS
def test_semdedup_output_invariants(spark, seeds, threshold):
    rows = [
        (i, [a + 1.5, b, c])  # +1.5 keeps vectors away from the zero vector
        for i, (a, b, c) in enumerate(seeds)
    ]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.semdedup(
        vecs, n_cells=2, threshold=threshold, fit_sample=32, seed=11
    ).collect()
    assert sorted(r["vec_id"] for r in out) == sorted(r[0] for r in rows)
    unit = {}
    for i, v in rows:
        nrm = math.sqrt(sum(x * x for x in v)) or 1.0
        unit[i] = [x / nrm for x in v]
    cells = {r["vec_id"]: r["cell"] for r in out}
    kept = {r["vec_id"] for r in out if r["keep"]}
    for r in out:
        if r["keep"]:
            assert r["max_kept_sim"] is None
        else:
            assert r["max_kept_sim"] is not None
            assert r["max_kept_sim"] >= threshold - 1e-9
            # a kept witness at >= threshold exists in the same cell
            witnesses = [
                k
                for k in kept
                if cells[k] == r["cell"]
                and sum(
                    a * b for a, b in zip(unit[k], unit[r["vec_id"]])
                )
                >= threshold - 1e-9
            ]
            assert witnesses, f"dropped {r['vec_id']} has no kept witness"
