"""Relational operators: EAV pivot drop semantics, decorrelated
group-concat, hierarchy self-join, ID-list semi/anti joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.operators.relational import (
    decorrelated_group_concat,
    eav_pivot,
    hierarchy_parent_join,
)
from wordpress_sql_to_contentstack_exporter_spark.sources.idlist import (
    exclude_ids,
    filter_by_ids,
    read_id_list,
)


def test_eav_pivot_drops_entities_missing_keys(wp_catalog):
    meta = wp_catalog.table("usermeta")
    piv = eav_pivot(meta, "user_id", ["first_name", "last_name", "description"])
    rows = {r["user_id"]: r for r in piv.collect()}
    assert set(rows) == {1, 3}  # bob (2) lacks description -> dropped
    assert rows[1]["first_name"] == "Alice"
    assert rows[3]["description"] == "bassist"


def test_eav_pivot_keep_partial(wp_catalog):
    meta = wp_catalog.table("usermeta")
    piv = eav_pivot(meta, "user_id", ["first_name", "description"], require_all=False)
    rows = {r["user_id"]: r for r in piv.collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[2]["description"] is None


def test_decorrelated_group_concat_null_when_no_match(spark):
    outer = spark.createDataFrame([(1,), (2,)], "k long")
    inner = spark.createDataFrame([(1, "b"), (1, "a")], "ik long, v string")
    out = decorrelated_group_concat(
        outer, inner, "k", "ik", F.col("v"), alias="vals"
    )
    rows = {r["k"]: r["vals"] for r in out.collect()}
    assert rows[1] == "a,b"  # sorted
    assert rows[2] is None  # MySQL group_concat semantics: NULL, not ''


def test_hierarchy_parent_join(spark):
    nodes = spark.createDataFrame(
        [(1, 0, "root-a"), (2, 1, "child-a"), (3, 99, "dangling"), (4, 0, "root-b")],
        "id long, parent long, slug string",
    )
    out = hierarchy_parent_join(
        nodes, id_col="id", parent_col="parent", slug_col="slug"
    )
    rows = {r["id"]: r["parent_slug"] for r in out.collect()}
    assert rows[1] is None and rows[4] is None  # roots
    assert rows[2] == "root-a"
    assert rows[3] is None  # dangling parent id -> no slug (fixed vs reference)


def test_id_list_roundtrip(spark, tmp_path):
    p = tmp_path / "ids.txt"
    p.write_text("10, 11,\n12,10")
    ids = read_id_list(spark, str(p))
    assert sorted(r["id"] for r in ids.collect()) == [10, 11, 12]

    df = spark.createDataFrame([(i,) for i in range(9, 14)], "ID long")
    kept = filter_by_ids(df, ids, "ID")
    assert sorted(r["ID"] for r in kept.collect()) == [10, 11, 12]
    dropped = exclude_ids(df, ids, "ID")
    assert sorted(r["ID"] for r in dropped.collect()) == [9, 13]


def test_upsert_latest_merge_semantics(spark):
    """Latest-wins upsert: updates overwrite, inserts append, unmatched
    base rows survive, ties on order_col prefer the update side, and
    mismatched schemas fail fast."""
    import pytest

    from wordpress_sql_to_contentstack_exporter_spark.operators.relational import upsert_latest

    base = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1), (3, "c", 5)], "id long, v string, ver long"
    )
    updates = spark.createDataFrame(
        [(2, "B", 2),   # overwrite (higher version)
         (4, "d", 1),   # insert (new key)
         (3, "TIE", 5)],  # same version as base -> update wins the tie
        "id long, v string, ver long",
    )
    out = {r["id"]: r["v"] for r in upsert_latest(
        base, updates, keys=["id"], order_col="ver"
    ).collect()}
    assert out == {1: "a", 2: "B", 3: "TIE", 4: "d"}

    with pytest.raises(ValueError, match="schemas differ"):
        upsert_latest(base, updates.drop("ver"), keys=["id"], order_col="ver")

    # stale update (lower version) must NOT overwrite
    stale = spark.createDataFrame([(3, "old", 1)], "id long, v string, ver long")
    out2 = {r["id"]: r["v"] for r in upsert_latest(
        base, stale, keys=["id"], order_col="ver"
    ).collect()}
    assert out2[3] == "c"


def test_table_diff_statuses_and_null_safety(spark):
    import pytest

    from wordpress_sql_to_contentstack_exporter_spark.operators.relational import table_diff

    a = spark.createDataFrame(
        [(1, "x", None), (2, "y", "s"), (3, "z", "t"), (5, None, None)],
        "id long, v string, w string",
    )
    b = spark.createDataFrame(
        [(1, "x", None),       # unchanged (null == null must be SAME)
         (2, "Y", "s"),        # changed
         (4, "new", "u"),      # added
         (5, None, "now")],    # changed (null -> value)
        "id long, v string, w string",
    )
    out = {r["id"]: r["diff_status"] for r in table_diff(a, b, keys=["id"]).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added", 5: "changed"}

    # compare_cols restriction: only v considered -> 5 becomes unchanged
    out2 = {r["id"]: r["diff_status"] for r in
            table_diff(a, b, keys=["id"], compare_cols=["v"]).collect()}
    assert out2[5] == "unchanged" and out2[2] == "changed"

    with pytest.raises(ValueError, match="schemas differ"):
        table_diff(a, b.drop("w"), keys=["id"])


def test_join_blowup_profile_counts_and_order(spark):
    from wordpress_sql_to_contentstack_exporter_spark.operators.relational import join_blowup_profile

    left = spark.createDataFrame(
        [(1,)] * 5 + [(2,)] * 2 + [(3,)] * 1, "k long"
    )
    right = spark.createDataFrame(
        [(1,)] * 4 + [(2,)] * 10 + [(9,)] * 3, "k long"
    )
    out = join_blowup_profile(left, right, left_key="k", right_key="k", top=10).collect()
    rows = [(r["key"], r["c_left"], r["c_right"], r["pairs"]) for r in out]
    # only common keys appear, ordered by fan-out
    assert rows == [(1, 5, 4, 20), (2, 2, 10, 20)] or rows == [(2, 2, 10, 20), (1, 5, 4, 20)]
    # deterministic tie-break: equal pairs -> key asc
    assert rows[0][0] == 1


def test_salted_join_equals_plain_join(spark):
    """salted_join's contract: row-for-row identical to the plain join
    — every (fact, dim) pair meets on exactly one salt — while hot keys
    spread over n_salts reducer slots. Checked for inner and left on a
    pathologically skewed fact side (90% of rows on one key), with a
    duplicate-keyed dim row to prove multiplicity survives."""
    from wordpress_sql_to_contentstack_exporter_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(i, 1 if i % 10 else 2, f"e{i}") for i in range(1000)]
        + [(9999, 7, "orphan")],  # key with no dim partner
        "row_id long, k long, payload string",
    )
    dim = spark.createDataFrame(
        [(1, "hot"), (2, "cold"), (2, "cold-dup"), (3, "unused")],
        "k long, label string",
    )
    for how in ("inner", "left"):
        plain = fact.join(dim, "k", how)
        salted = salted_join(fact, dim, "k", n_salts=4, hot_threshold=100, how=how)
        cols = ["k", "row_id", "payload", "label"]
        a = sorted(tuple(r) for r in plain.select(*cols).collect())
        b = sorted(tuple(r) for r in salted.select(*cols).collect())
        assert a == b, f"{how} join diverged"


def test_salted_join_spreads_hot_key_and_bounds_replication(spark):
    from pyspark.sql import functions as F

    from wordpress_sql_to_contentstack_exporter_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(i, 1) for i in range(500)] + [(1000 + i, i) for i in range(2, 50)],
        "row_id long, k long",
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(1, 50)], "k long, label string")
    hot = spark.createDataFrame([(1,)], "k long")
    out = salted_join(fact, dim, "k", n_salts=8, hot_keys=hot)
    # correctness on explicit hot list
    assert out.count() == 500 + 48
    # the hot key's fact rows really landed on multiple salts (spread),
    # and dim replication happened only for the hot key: visible via the
    # salt distribution of an instrumented rebuild
    f_salt = F.pmod(F.xxhash64("row_id", "k"), F.lit(8))
    n_distinct_salts = (
        fact.filter(F.col("k") == 1).select(f_salt.alias("s")).distinct().count()
    )
    assert n_distinct_salts > 1


def test_salted_join_rejects_bad_args(spark):
    import pytest as _pytest

    from wordpress_sql_to_contentstack_exporter_spark.operators.skew import salted_join

    df = spark.createDataFrame([(1, 1)], "a long, k long")
    with _pytest.raises(ValueError):
        salted_join(df, df, "k", how="full")
    with _pytest.raises(ValueError):
        salted_join(df, df, "k", n_salts=1)


def test_global_rank_equals_naive_window(spark):
    """The range-bucket + offset decomposition must equal the naive
    global row_number row-for-row, including heavy duplicate values
    that straddle bucket boundaries and a skewed distribution."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from wordpress_sql_to_contentstack_exporter_spark.operators.relational import global_rank

    rows = [(i, float(v)) for i, v in enumerate(
        [5] * 50 + list(range(100)) + [999] * 10 + [0] * 20
    )]
    df = spark.createDataFrame(rows, "event_id long, value double")
    naive = df.withColumn(
        "rank",
        F.row_number().over(
            Window.orderBy(
                F.round(F.col("value") * 1000).cast("long").asc(),
                F.col("event_id").asc(),
            )
        ),
    )
    fancy = global_rank(df, value_col="value", tiebreak=["event_id"], n_buckets=8)
    a = sorted((r["event_id"], r["rank"]) for r in naive.collect())
    b = sorted((r["event_id"], r["rank"]) for r in fancy.collect())
    assert a == b
    # degenerate single-value input: all in one bucket, still exact
    one = spark.createDataFrame([(i, 7.0) for i in range(5)], "event_id long, value double")
    got = sorted(r["rank"] for r in global_rank(one, value_col="value", tiebreak=["event_id"]).collect())
    assert got == [1, 2, 3, 4, 5]


def test_global_rank_scale1_rejects_fractional_dtype(spark):
    """scale=1 declares the value column integral; a double column
    would be silently cast-truncated (values in (-1,1) all collapse to
    0), so it must be rejected loudly (ADVICE r7)."""
    import pytest as _pytest
    from wordpress_sql_to_contentstack_exporter_spark.operators.relational import global_rank

    df = spark.createDataFrame([(1, 0.5), (2, -0.25)], "id long, v double")
    with _pytest.raises(ValueError, match="integral"):
        global_rank(df, value_col="v", tiebreak=["id"], scale=1)
