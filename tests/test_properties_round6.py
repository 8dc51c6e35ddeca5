"""Round-6 randomized property tests.

1. The portable-text contract under RANDOM unicode (not just the
   handpicked adversarial corpus of test_portable_text.py): hypothesis
   draws corpora over an alphabet deliberately seeded with every hazard
   class — ASCII, control whitespace (VT/FF/CR), NBSP, ideographic
   space, Greek sigma forms, Turkish İ/ı, ß, combining marks, astral
   emoji — and the full tokenize/normalize/fingerprint chains must agree
   between Spark and DuckDB row-for-row.

2. salted_join ≡ plain join under random key distributions (including
   degenerate all-one-key and empty-dim cases).
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.functions.portable import (
    PORTABLE_WS_PLUS,
    portable_lower,
    sql_portable_lower,
)

HAZARD_ALPHABET = (
    "abcXYZ019 .,!?"
    "\t\n\r\x0b\x0c"
    "\xa0　"
    "ΣσςΑΒ"
    "İıiI"
    "ßẞﬁﬂŉև"
    "é́"
    "\U0001f600\U0001f680"
)

corpus_strategy = st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet=HAZARD_ALPHABET, min_size=0, max_size=40),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=8, deadline=None)
@given(texts=corpus_strategy)
def test_portable_chain_parity_on_random_unicode(spark, texts):
    """tokens (filtered portable split of portable_lower) and the
    fingerprint canonical (collapse of portable_lower) agree between
    engines on arbitrary hazard-alphabet text, including NULLs."""
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "i long, t string"
    )
    canon = F.regexp_replace(portable_lower(F.trim(F.col("t"))), PORTABLE_WS_PLUS, " ")
    toks = F.filter(
        F.split(portable_lower(F.trim(F.col("t"))), PORTABLE_WS_PLUS),
        lambda x: x != "",
    )
    got = {
        r["i"]: (r["canon"], r["toks"], r["md5"])
        for r in df.select(
            "i",
            canon.alias("canon"),
            toks.alias("toks"),
            F.md5(canon).alias("md5"),
        ).collect()
    }
    pl = sql_portable_lower("trim(?, ' ')")
    for i, t in enumerate(texts):
        [(want_canon, want_toks, want_md5)] = con.execute(
            rf"""
            SELECT regexp_replace({pl}, '[ \t\n\r\f\x0b]+', ' ', 'g'),
                   list_filter(string_split_regex({pl},
                               '[ \t\n\r\f\x0b]+'), x -> x != ''),
                   md5(regexp_replace({pl}, '[ \t\n\r\f\x0b]+', ' ', 'g'))
            """,
            [t, t, t],
        ).fetchall()
        assert got[i][0] == want_canon, (i, t, got[i][0], want_canon)
        assert got[i][1] == want_toks, (i, t, got[i][1], want_toks)
        assert got[i][2] == want_md5, (i, t)


@settings(max_examples=10, deadline=None)
@given(
    fact_keys=st.lists(st.integers(min_value=0, max_value=5), min_size=0, max_size=60),
    dim_keys=st.lists(st.integers(min_value=0, max_value=8), min_size=0, max_size=12),
    n_salts=st.integers(min_value=2, max_value=6),
    how=st.sampled_from(["inner", "left"]),
)
def test_salted_join_random_equivalence(spark, fact_keys, dim_keys, n_salts, how):
    from wordpress_sql_to_contentstack_exporter_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(i, k) for i, k in enumerate(fact_keys)], "row_id long, k long"
    )
    dim = spark.createDataFrame(
        [(k, f"d{j}") for j, k in enumerate(dim_keys)], "k long, label string"
    )
    plain = fact.join(dim, "k", how)
    salted = salted_join(fact, dim, "k", n_salts=n_salts, hot_threshold=3, how=how)
    cols = ["k", "row_id", "label"]
    a = sorted(tuple(r) for r in plain.select(*cols).collect())
    b = sorted(tuple(r) for r in salted.select(*cols).collect())
    assert a == b


@settings(max_examples=8, deadline=None)
@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=120),
        min_size=1,
        max_size=12,
    ),
    span=st.integers(min_value=4, max_value=16),
)
def test_repeated_spans_matches_python_model(spark, texts, span):
    """Model-based check: the Spark span detector equals a direct
    in-Python computation of word-boundary-anchored span document
    frequencies, over random space-heavy strings (maximal anchor
    density) and arbitrary span sizes."""
    from collections import defaultdict

    from wordpress_sql_to_contentstack_exporter_spark.operators import text as tx

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["span"]: (r["n_docs"], r["n_total"])
        for r in tx.repeated_spans(
            docs, span=span, min_docs=2, top=1000
        ).collect()
    }

    per_doc = defaultdict(lambda: defaultdict(int))
    for i, t in enumerate(texts):
        if len(t) < span:
            continue
        for p in range(len(t) - span + 1):
            if p == 0 or t[p - 1] == " ":
                per_doc[t[p : p + span]][i] += 1
    want = {
        s: (len(d), sum(d.values()))
        for s, d in per_doc.items()
        if len(d) >= 2
    }
    assert got == want
