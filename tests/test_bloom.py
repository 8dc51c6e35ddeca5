"""Distributed Bloom-filter join pruning (operators/bloom.py): the
soundness contract (NEVER drops a true match), the measured
effectiveness (pruning factor + false-positive rate within theory),
and the plan shape (k broadcast joins, no added shuffle)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators import bloom as bl

SF_DIR = "/root/testdata/sf0.001"


def test_pruned_join_equals_plain_join(spark):
    """No false negatives: the Bloom-pruned join must equal the plain
    inner join row-for-row on real data (the registry gate's contract,
    asserted here at sf0.001 with a multiset compare)."""
    l = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_totalprice") > 400000)
        .select("o_orderkey", "o_totalprice")
    )
    pruned = bl.bloom_prune_join(
        l, o, probe_key="l_orderkey", build_key="o_orderkey", m_bits=1 << 12, k=4
    ).select("l_orderkey", "l_linenumber", "o_totalprice")
    plain = l.join(o, l["l_orderkey"] == o["o_orderkey"]).select(
        "l_orderkey", "l_linenumber", "o_totalprice"
    )
    assert pruned.exceptAll(plain).count() == 0
    assert plain.exceptAll(pruned).count() == 0
    assert plain.count() > 0  # the fixture exercises the path


def test_all_inserted_keys_pass(spark):
    """Membership soundness in isolation: every key inserted at build
    time must survive the prune."""
    keys = spark.range(1000).select((F.col("id") * 3).alias("k"))
    bloom = bl.bloom_build(keys, "k", m_bits=1 << 12, k=4)
    survivors = bl.bloom_prune(keys, "k", bloom, m_bits=1 << 12, k=4)
    assert survivors.count() == 1000


def test_pruning_factor_and_fp_rate(spark):
    """Effectiveness: a probe of 10k keys against a 100-key build must
    shrink to ~100 rows; the false-positive tail must stay within 3x
    the theoretical (1 - e^(-kn/m))^k bound (slack for hash clumping).
    """
    probe = spark.range(10_000).select(F.col("id").alias("k"))
    build = spark.range(100).select((F.col("id") * 100).alias("k"))
    m_bits, k = 1 << 12, 4
    bloom = bl.bloom_build(build, "k", m_bits=m_bits, k=k)
    survivors = bl.bloom_prune(probe, "k", bloom, m_bits=m_bits, k=k).count()
    true_hits = 100  # multiples of 100 in [0, 10000)
    fp = survivors - true_hits
    assert fp >= 0
    import math

    fp_theory = (1 - math.exp(-k * 100 / m_bits)) ** k
    assert fp <= max(3 * fp_theory * (10_000 - true_hits), 10)


def test_prune_plan_is_broadcast_only(spark):
    """The prune must add k BroadcastHashJoins and NO shuffle to the
    probe plan — the whole point is testing rows before any exchange."""
    probe = spark.range(1000).select(F.col("id").alias("k"))
    build = spark.range(50).select((F.col("id") * 7).alias("k"))
    bloom = bl.bloom_build(build, "k", m_bits=1 << 10, k=3)
    pruned = bl.bloom_prune(probe, "k", bloom, m_bits=1 << 10, k=3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
    # shuffles may appear only inside the (tiny) bloom-build subtree —
    # its word_idx/__pos aggregation — never on the probe lineage
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "word_idx" in line or "__pos" in line or "__bk" in line, line


def test_m_bits_must_be_multiple_of_64(spark):
    keys = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="multiple of 64"):
        bl.bloom_build(keys, "k", m_bits=1000, k=3)


def test_key_dtype_mismatch_rejected(spark):
    """xxhash64 hashes typed values — an int probe key against a long
    build key would silently drop true matches; the join must refuse."""
    probe = spark.range(10).select(F.col("id").cast("int").alias("k"))
    build = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="dtype mismatch"):
        bl.bloom_prune_join(probe, build, probe_key="k", build_key="k")


def test_same_named_keys_yield_unambiguous_schema(spark):
    """probe_key == build_key must not leave two identically-named
    columns in the output (ADVICE r7): the build-side key is dropped,
    downstream F.col references resolve."""
    probe = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "k long, pv string")
    build = spark.createDataFrame([(1, 10.0), (3, 30.0)], "k long, bv double")
    out = bl.bloom_prune_join(probe, build, probe_key="k", build_key="k")
    assert out.columns.count("k") == 1
    rows = {r["k"]: (r["pv"], r["bv"]) for r in out.select("k", "pv", "bv").collect()}
    assert rows == {1: ("a", 10.0), 3: ("c", 30.0)}
