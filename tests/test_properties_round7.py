"""Round-7 randomized property tests.

1. Bloom pruning ≡ plain membership under random key sets (including
   string keys, empty build side, and the probe⊂build degenerate) —
   the no-false-negative contract as a property, not an example.
2. The blocklist suffix join against a direct Python model of the spec
   (host == domain or host endswith "." + domain) over randomized
   hostnames built from a small label alphabet — exercising boundary
   collisions (labels that are prefixes/suffixes of each other) far
   beyond the handpicked cases.
3. threshold_sweep against a brute-force O(n·B) Python sweep on random
   score/label sets — every bucket's tp/fp/fn/tn exactly.

Hypothesis drives the data; each property runs a bounded number of
examples against a session-scoped local Spark (settings tuned like the
round-6 file: few, fat examples — Spark job latency dominates)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators import blocklist as blk
from wordpress_sql_to_contentstack_exporter_spark.operators import bloom as bl
from wordpress_sql_to_contentstack_exporter_spark.operators.stats import threshold_sweep

_SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


@given(
    build=st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=60),
    extra=st.sets(st.integers(min_value=-(2**40), max_value=2**40), max_size=60),
)
@_SETTINGS
def test_bloom_never_drops_a_true_match(spark, build, extra):
    probe_keys = sorted(build | extra)
    if not probe_keys:
        probe_keys = [0]
    probe = spark.createDataFrame([(k,) for k in probe_keys], "k long")
    bdf = spark.createDataFrame([(k,) for k in sorted(build)] or [(None,)], "k long")
    bdf = bdf.filter(F.col("k").isNotNull())
    bloom = bl.bloom_build(bdf, "k", m_bits=1 << 10, k=3)
    survivors = {
        r["k"] for r in bl.bloom_prune(probe, "k", bloom, m_bits=1 << 10, k=3).collect()
    }
    assert build <= survivors  # soundness: every true member survives
    if not build:
        assert survivors == set()  # empty filter rejects everything


_LABELS = ["a", "ab", "aba", "b", "ba", "com", "co", "om"]


@given(
    hosts=st.lists(
        st.lists(st.sampled_from(_LABELS), min_size=1, max_size=5).map(".".join),
        min_size=1,
        max_size=25,
    ),
    domains=st.lists(
        st.lists(st.sampled_from(_LABELS), min_size=1, max_size=3).map(".".join),
        min_size=1,
        max_size=5,
    ),
)
@_SETTINGS
def test_blocklist_matches_python_spec(spark, hosts, domains):
    hdf = spark.createDataFrame(
        [(i, h) for i, h in enumerate(hosts)], "id long, host string"
    )
    bdf = spark.createDataFrame([(d,) for d in domains], "domain string")
    got = {
        r["id"]: r["blocked"]
        for r in blk.blocklist_flags(hdf, host_col="host", blocklist=bdf).collect()
    }
    for i, h in enumerate(hosts):
        want = int(any(h == d or h.endswith("." + d) for d in domains))
        assert got[i] == want, (h, domains)


@given(
    data=st.lists(
        st.tuples(
            st.floats(
                min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
            ),
            st.booleans(),
        ),
        min_size=1,
        max_size=40,
    ),
    n_buckets=st.sampled_from([2, 4, 16]),
)
@_SETTINGS
def test_threshold_sweep_matches_brute_force(spark, data, n_buckets):
    df = spark.createDataFrame(data, "score double, label boolean")
    rows = threshold_sweep(
        df, score_col="score", label_col="label", n_buckets=n_buckets
    ).collect()
    # python model: identical quantization, brute-force counts per bucket
    import math

    svs = [(math.floor(s * 1024), y) for s, y in data]
    lo = min(v for v, _ in svs)
    hi = max(v for v, _ in svs)
    width = (hi - lo) // n_buckets + 1
    by_bucket = {}
    for v, y in svs:
        by_bucket.setdefault((v - lo) // width, []).append(y)
    assert {r["bucket"] for r in rows} == set(by_bucket)
    for r in rows:
        b = r["bucket"]
        tp = sum(1 for bb, ys in by_bucket.items() if bb >= b for y in ys if y)
        fp = sum(1 for bb, ys in by_bucket.items() if bb >= b for y in ys if not y)
        n_pos = sum(1 for _, y in svs if y)
        n_neg = len(svs) - n_pos
        assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (tp, fp, n_pos - tp, n_neg - fp)
        assert r["threshold_scaled"] == lo + b * width
