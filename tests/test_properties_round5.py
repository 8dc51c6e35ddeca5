"""Model-based property tests for the round-5 operators: interval
merging, SCD2 history, and deletion-neighborhood fuzzy pairing, each
checked against a trivially-correct in-Python reference model over
randomized inputs."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from wordpress_sql_to_contentstack_exporter_spark.operators.relational import scd2_history
from wordpress_sql_to_contentstack_exporter_spark.operators.temporal import merge_intervals


def _merge_model(ivs):
    """Reference: sort, sweep, merge overlap-or-touch; returns
    [(start, end, n_rows)]."""
    out = []
    for s, e in sorted(ivs):
        if out and s <= out[-1][1]:
            ps, pe, n = out[-1]
            out[-1] = (ps, max(pe, e), n + 1)
        else:
            out.append((s, e, 1))
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=0, max_value=30),
        ),
        min_size=1,
        max_size=25,
    )
)
def test_merge_intervals_matches_sweep_model(spark, raw):
    ivs = [(s, s + d) for s, d in raw]
    df = spark.createDataFrame([("k", s, e) for s, e in ivs], "k string, s long, e long")
    got = sorted(
        (r["interval_start"], r["interval_end"], r["n_rows"])
        for r in merge_intervals(df, keys=["k"], start_col="s", end_col="e").collect()
    )
    assert got == sorted(_merge_model(ivs))


def _scd2_model(rows):
    """Reference replay: rows are (id, t, attr) for one key; returns
    [(attr, valid_from, valid_to)]."""
    ordered = sorted(rows, key=lambda r: (r[1], r[0]))
    kept = []
    sentinel = object()
    prev = sentinel
    for rid, t, attr in ordered:
        if prev is sentinel or attr != prev:
            kept.append((attr, t))
        prev = attr
    out = []
    for i, (attr, t) in enumerate(kept):
        vt = kept[i + 1][1] if i + 1 < len(kept) else None
        out.append((attr, t, vt))
    return out


@settings(max_examples=20, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=100),
            st.sampled_from(["a", "b", "c", None]),
        ),
        min_size=1,
        max_size=20,
        unique_by=lambda r: r[0],
    )
)
def test_scd2_history_matches_replay_model(spark, raw):
    rows = [(i, t, attr) for i, (t, attr) in enumerate(raw)]
    df = spark.createDataFrame(
        [(1, rid, t, a) for rid, t, a in rows], "k long, id long, t long, attr string"
    )
    out = scd2_history(df, keys=["k"], ts_col="t", attrs=["attr"], tiebreak=["id"])
    got = sorted(
        ((r["attr"], r["valid_from"], r["valid_to"]) for r in out.collect()),
        key=lambda x: x[1],
    )
    # model replays with plain != on attrs (None == None is a no-op,
    # matching the operator's null-safe compare)
    expect = sorted(_scd2_model(rows), key=lambda x: x[1])
    assert got == expect
    # intervals tile: each valid_to equals the next valid_from
    for (_, _, vt), (_, nvf, _) in zip(got, got[1:]):
        assert vt == nvf
    assert got[-1][2] is None


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
    return dp[-1]


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abc", min_size=0, max_size=5),
        min_size=2,
        max_size=12,
    )
)
def test_fuzzy_pairs_d1_matches_bruteforce_model(spark, words):
    import itertools

    from wordpress_sql_to_contentstack_exporter_spark.operators.dedup import fuzzy_pairs_d1

    df = spark.createDataFrame([(w,) for w in words], "s string")
    expect = {
        tuple(sorted(p))
        for p in itertools.combinations(set(words), 2)
        if _lev(*p) == 1
    }
    got = {(r["s_a"], r["s_b"]) for r in fuzzy_pairs_d1(df, text_col="s").collect()}
    assert got == expect
