"""Round-13 property tests: first-fit-decreasing packing vs a
plain-Python FFD reference (different substrate, same contract), and
the strict-budget / coverage invariants under random corpora.

Hypothesis drives the data; few, fat examples — Spark job latency
dominates (round-6/7 convention).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators.sampling import (
    pack_sequences_ffd,
)

_SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)


def _py_ffd(rows, budget):
    """Independent sequential FFD: sort by (capped desc, key asc),
    first bin that fits else a new bin. Returns {key: bin_index}."""
    order = sorted(rows, key=lambda r: (-min(r[1], budget), r[0]))
    loads, out = [], {}
    for key, t in order:
        t = min(t, budget)
        for i, load in enumerate(loads):
            if load + t <= budget:
                loads[i] = load + t
                out[key] = i
                break
        else:
            loads.append(t)
            out[key] = len(loads) - 1
    return out


@_SETTINGS
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=60),
    budget=st.integers(min_value=1, max_value=256),
)
def test_ffd_matches_python_reference_exactly(spark, lengths, budget):
    rows = [(i, n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    got = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences_ffd(
            df, token_col="n_tokens", max_tokens=budget, key_col="doc_id",
            shard_expr=F.lit(0),
        ).collect()
    }
    ref = _py_ffd(rows, budget)
    assert got == {k: f"0-{b}" for k, b in ref.items()}
    # strict budget: per-bin capped sums never exceed it
    sums: dict[str, int] = {}
    for k, n in rows:
        sums[got[k]] = sums.get(got[k], 0) + min(n, budget)
    assert all(s <= budget for s in sums.values())
    # coverage: every doc assigned exactly once
    assert len(got) == len(rows)


@_SETTINGS
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=120), min_size=4, max_size=40),
)
def test_ffd_sharding_is_a_partition(spark, lengths):
    """Hash sharding must partition the corpus: per-shard assignments
    are independent, every doc lands in exactly one shard-prefixed
    pack, and re-running is deterministic."""
    rows = [(i, n) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out1 = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences_ffd(
            df, token_col="n_tokens", max_tokens=128, key_col="doc_id", n_shards=3
        ).collect()
    }
    out2 = {
        r["doc_id"]: r["pack_id"]
        for r in pack_sequences_ffd(
            df, token_col="n_tokens", max_tokens=128, key_col="doc_id", n_shards=3
        ).collect()
    }
    assert out1 == out2
    assert len(out1) == len(rows)
