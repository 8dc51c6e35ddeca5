"""Adversarial cross-engine text-semantics contract (VERDICT r5 #3).

The two-round `repetition` driver red taught that the risk class for
oracle hash contracts is TEXT SEMANTICS (regex classes, Unicode case
mapping, NULL propagation, engine-version-sensitive constructs), not
float rounding. This suite makes that a tested contract:

1. pins the three measured JVM/utf8proc divergences (``\\s`` vs U+000B,
   final-sigma lowercase, Turkish İ lowercase) and proves the portable
   primitives in ``functions/portable.py`` erase them;
2. drives REAL registry text queries end-to-end over an adversarial
   documents corpus — NULL / empty / whitespace-only / CRLF / VT /
   NBSP / ideographic space / Greek Σ...Σ / İ / ß / combining marks /
   supplementary-plane rows — comparing Spark against the DuckDB
   oracle with the driver's own fingerprint (sorted columns, canonical
   rows), so any construct that would red in a driver environment with
   adversarial data reds HERE first.
"""

from __future__ import annotations

import datetime
import math

import duckdb
import pytest
from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.functions.portable import (
    PORTABLE_WS_PLUS,
    portable_lower,
    sql_portable_lower,
)
from wordpress_sql_to_contentstack_exporter_spark.operators import text as tx
from wordpress_sql_to_contentstack_exporter_spark.plans import registry as reg

# ---------------------------------------------------------------------------
# the adversarial corpus
# ---------------------------------------------------------------------------

HAZARD_DOCS: list[tuple[int, str | None, str, str]] = [
    (1, None, "en", "src0"),                      # NULL text
    (2, "", "en", "src0"),                        # empty
    (3, "   ", "en", "src0"),                     # whitespace-only
    (4, "line one\r\nline one\r\nline two", "en", "src1"),   # CRLF + dup lines
    (5, "alpha\x0bbeta gamma", "en", "src1"),     # vertical tab (the \s trap)
    (6, "alpha\x0cbeta gamma", "en", "src1"),     # form feed
    (7, "non\xa0breaking space here", "en", "src1"),         # NBSP
    (8, "full　width space", "ja", "src2"),   # ideographic space
    (9, "ΑΣ ΒΣΤ ΣΟΦΟΣ", "el", "src2"),            # final-sigma positions
    (10, "İstanbul I ı İİ", "tr", "src2"),        # Turkish dotted İ
    (11, "STRASSE straße ß", "de", "src2"),       # sharp s
    (12, "éclair café", "fr", "src2"),  # combining vs precomposed
    (13, "emoji \U0001f600 mid \U0001f680 text", "en", "src3"),  # astral
    (14, "the the the the the the", "en", "src3"),  # repetition trigger
    (15, "a\nb\nc\na\nb\nc", "en", "src3"),       # duplicate lines
    (16, "tab\tseparated\ttokens here", "en", "src3"),
    (17, "Mixed ΣΤΡΑΤΟΣ and İzmir\x0btogether", "und", "src3"),
    (18, "trailing spaces   \nand\n  leading", "en", "src4"),
    (19, "the quick brown fox jumps", "en", "src4"),
    (20, "\n\n\nonly\n\n\nnewlines\n\n\n", "en", "src4"),
    # EDGE-position unicode spaces: DuckDB's default trim() strips
    # Unicode Zs (NBSP, U+3000) while Spark's strips ASCII space only —
    # found by the round-6 hypothesis sweep; oracles now pin
    # trim(x, ' ') explicitly
    (21, "\xa0nbsp at edges\xa0", "en", "src4"),
    (22, "　ideographic edges　", "ja", "src4"),
]


@pytest.fixture(scope="module")
def hazard_sf_dir(spark, tmp_path_factory):
    """Materialize the adversarial corpus as a documents.parquet laid
    out like a driver sf dir, so registry queries and oracle SQL run on
    it unchanged."""
    d = tmp_path_factory.mktemp("hazard_sf")
    rows = [
        (i, t, lang, src, len(t) if t is not None else None)
        for (i, t, lang, src) in HAZARD_DOCS
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def hazard_con(hazard_sf_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{hazard_sf_dir}/documents.parquet/*.parquet')"
    )
    return con


# ---------------------------------------------------------------------------
# driver-fingerprint compare (mirrors tools/oracle_check.py)
# ---------------------------------------------------------------------------


def _canon(value) -> str:
    if value is None:
        return "∅"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        if value == 0:
            return "0"
        return repr(round(value, 9))
    if isinstance(value, datetime.datetime):
        return value.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(value, list):
        return "[" + ",".join(_canon(v) for v in value) + "]"
    return str(value)


def _fingerprint(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return (
        len(rows),
        [cols[i] for i in order],
        sorted("|".join(_canon(r[i]) for i in order) for r in rows),
    )


def _assert_parity(spark, con, name, sf_dir):
    sdf = reg.SPARK_QUERIES[name](spark, sf_dir)
    s_fp = _fingerprint(sdf.columns, [tuple(r) for r in sdf.collect()])
    res = con.execute(reg.ORACLE_SQL[name])
    d_fp = _fingerprint([d[0] for d in res.description], res.fetchall())
    assert s_fp[0] == d_fp[0], f"{name}: row count {s_fp[0]} vs {d_fp[0]}"
    assert s_fp[1] == d_fp[1], f"{name}: columns {s_fp[1]} vs {d_fp[1]}"
    mism = [
        (a, b) for a, b in zip(s_fp[2], d_fp[2]) if a != b
    ]
    assert not mism, f"{name}: {len(mism)} row mismatches, first: {mism[0]}"


# ---------------------------------------------------------------------------
# 1. the pinned divergence map + portable-primitive parity
# ---------------------------------------------------------------------------

HAZARD_STRINGS = [
    "a\x0bb c", "a\x0cb", "a\r\nb", "a\xa0b", "a　b",
    "ΑΣ ΒΣΤ ΣΟΦΟΣ", "İstanbul I ı", "STRASSE straße",
    "éclair", "a\U0001f600b", "  padded  ", "",
    "ﬁle ﬂow oﬀer suﬃx ﬆop", "ŉ ǰ ΐ ΰ", "ﬓեծ և ﬗառ",
]


def test_raw_divergences_exist_in_this_engine_pair(spark):
    """Document WHY portable.py exists: the raw constructs measurably
    diverge between the JVM and utf8proc/RE2 on at least the known
    hazard inputs (if a future engine pair agrees, this test tells us
    the shims are droppable)."""
    con = duckdb.connect()
    [(duck_sigma, duck_dotted)] = con.execute(
        "SELECT lower('ΑΣ'), lower('İ')"
    ).fetchall()
    row = (
        spark.range(1)
        .select(
            F.lower(F.lit("ΑΣ")).alias("sigma"),
            F.lower(F.lit("İ")).alias("dotted"),
            F.size(F.split(F.lit("a\x0bb"), r"\s+")).alias("vt_tokens"),
        )
        .first()
    )
    [(duck_vt,)] = con.execute(
        r"SELECT len(string_split_regex('a' || chr(11) || 'b', '\s+'))"
    ).fetchall()
    assert row["sigma"] != duck_sigma          # ας vs ασ
    assert row["dotted"] != duck_dotted        # i+U+0307 vs i
    assert row["vt_tokens"] == 2 and duck_vt == 1   # Java \s has VT, RE2 not


def test_portable_lower_parity(spark):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(HAZARD_STRINGS)], "i long, t string"
    )
    got = {
        r["i"]: r["lo"]
        for r in df.select("i", portable_lower(F.col("t")).alias("lo")).collect()
    }
    for i, s in enumerate(HAZARD_STRINGS):
        [(want,)] = con.execute(
            f"SELECT {sql_portable_lower('?')}", [s]
        ).fetchall()
        assert got[i] == want, f"portable_lower({s!r}): {got[i]!r} vs {want!r}"


def test_portable_upper_parity(spark):
    """Every SpecialCasing expansion codepoint (ligatures, ŉ, Greek
    precomposed, Armenian ﬓ-family, ß) uppercases identically through
    the portable fold on both engines — found by round-6 code review:
    the original shim patched only ß."""
    from wordpress_sql_to_contentstack_exporter_spark.functions.portable import (
        portable_upper,
        sql_portable_upper,
    )

    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(HAZARD_STRINGS)], "i long, t string"
    )
    got = {
        r["i"]: r["up"]
        for r in df.select("i", portable_upper(F.col("t")).alias("up")).collect()
    }
    for i, s in enumerate(HAZARD_STRINGS):
        [(want,)] = con.execute(
            f"SELECT {sql_portable_upper('?')}", [s]
        ).fetchall()
        assert got[i] == want, f"portable_upper({s!r}): {got[i]!r} vs {want!r}"


def test_portable_ws_split_parity(spark):
    con = duckdb.connect()
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(HAZARD_STRINGS)], "i long, t string"
    )
    got = {
        r["i"]: r["toks"]
        for r in df.select(
            "i", F.split(F.col("t"), PORTABLE_WS_PLUS).alias("toks")
        ).collect()
    }
    for i, s in enumerate(HAZARD_STRINGS):
        [(want,)] = con.execute(
            r"SELECT string_split_regex(?, '[ \t\n\r\f\x0b]+')", [s]
        ).fetchall()
        assert got[i] == want, f"ws_split({s!r}): {got[i]!r} vs {want!r}"


# ---------------------------------------------------------------------------
# 2. end-to-end: real registry text queries over the adversarial corpus
# ---------------------------------------------------------------------------

#: Every oracle-gated query whose chain reads only `documents` text.
#: Each must hold its hash contract on the adversarial corpus, not just
#: the driver's clean ASCII fixture.
TEXT_GATES = [
    "repetition_corpus_echo",
    "repetition_lines",
    "repetition_grams",
    "repetition",
    "text_quality",
    "lang_id",
    "fingerprint",
    "dedup_exact",
    "token_topk",
    "tfidf_topterms",
    "inverted_index",
    "doc_chunks",
    "paragraph_dedup",
    "quality_filter",
    "boilerplate_removal",
    "pmi_collocations",
    "ngram_lm",
    "vocab_drift",
    "source_overlap",
    "tfidf_pairs",
    "setsim_join",
    "ngram_jaccard",
    "decontaminate",
    "pii_redact",
    "array_hof",
    "tokenizer_fertility",
    "bm25_score",
    "bm25_topk",
]


@pytest.mark.parametrize("name", TEXT_GATES)
def test_text_gate_on_adversarial_corpus(spark, hazard_con, hazard_sf_dir, name):
    _assert_parity(spark, hazard_con, name, hazard_sf_dir)


def test_upper_expansions_table_is_exhaustive(spark):
    """Round-7: the expansion table is generated from the full BMP, so
    EVERY codepoint whose full uppercase expands (not just the original
    hand-picked 18) must roundtrip identically through both engines —
    including the families the round-6 review flagged as missing
    (U+1E96-U+1E9A and the Greek polytonic iota-subscript/breathing
    blocks). Also pins the table's size and spot contents so a Python
    Unicode-table change shows up as a loud diff, not silent drift."""
    from wordpress_sql_to_contentstack_exporter_spark.functions.portable import (
        UPPER_EXPANSIONS,
        portable_upper,
        sql_portable_upper,
    )

    srcs = [src for src, _ in UPPER_EXPANSIONS]
    assert len(srcs) == 102
    for must in ["ß", "ẖ", "ẚ", "ὐ", "ᾳ", "ῼ", "ﬗ"]:
        assert must in srcs, hex(ord(must))
    # every table entry, embedded mid-word, through both engines
    rows = [(i, f"ab{s}cd") for i, s in enumerate(srcs)]
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["up"]
        for r in df.select("i", portable_upper(F.col("t")).alias("up")).collect()
    }
    con = duckdb.connect()
    for i, s in rows:
        [(want,)] = con.execute(f"SELECT {sql_portable_upper('?')}", [s]).fetchall()
        assert got[i] == want, f"portable_upper({s!r}): {got[i]!r} vs {want!r}"
        # and the result matches Python's full (SpecialCasing) uppercase,
        # i.e. the semantics Java's toUpperCase implements
        assert got[i] == s.upper(), f"{s!r}: {got[i]!r} != {s.upper()!r}"


class TestBM25:
    """BM25 primitives (text.bm25_term_scores / bm25_topk): formula vs
    hand computation, filtered-before-shuffle token flow, fixed-point
    rank determinism."""

    @pytest.fixture(scope="class")
    def corpus(self, spark):
        rows = [
            (1, "merge join merge sort"),
            (2, "merge scan scan scan scan scan"),
            (3, "join filter window"),
            (4, "no relevant words here at all"),
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_term_scores_match_hand_bm25(self, corpus):
        import math

        rows = tx.bm25_term_scores(corpus, ["merge", "join"]).collect()
        got = {(r["doc_id"], r["term"]): r for r in rows}
        # corpus stats: N=4, dl = [4, 6, 3, 6], avgdl = 19/4
        assert set(got) == {(1, "merge"), (1, "join"), (2, "merge"), (3, "join")}
        n, avgdl = 4, 19 / 4
        def ref(tf, dl, df):
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            return idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
        r = got[(1, "merge")]
        assert (r["tf"], r["dl"], r["df_t"], r["n_docs"]) == (2, 4, 2, 4)
        assert abs(r["score_term"] - ref(2, 4, 2)) < 1e-12
        r = got[(3, "join")]
        assert (r["tf"], r["dl"], r["df_t"]) == (1, 3, 2)
        assert abs(r["score_term"] - ref(1, 3, 2)) < 1e-12

    def test_topk_ranking_and_tie_break(self, corpus):
        out = tx.bm25_topk(corpus, [(1, ["merge", "join"])], k=3).collect()
        ranked = sorted(out, key=lambda r: r["rank"])
        # doc 1 matches both terms with high tf/short doc: rank 1
        assert ranked[0]["doc_id"] == 1
        assert [r["rank"] for r in ranked] == [1, 2, 3]
        assert ranked[1]["score_scaled"] >= ranked[2]["score_scaled"]
        # determinism: identical rerun
        again = sorted(
            tx.bm25_topk(corpus, [(1, ["merge", "join"])], k=3).collect(),
            key=lambda r: r["rank"],
        )
        assert [(r["doc_id"], r["score_scaled"]) for r in again] == [
            (r["doc_id"], r["score_scaled"]) for r in ranked
        ]

    def test_multi_query_batch_isolated(self, corpus):
        out = tx.bm25_topk(
            corpus, [(1, ["merge"]), (2, ["join"]), (3, ["absentterm"])], k=10
        ).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r["doc_id"])
        assert set(by_q[1]) == {1, 2}
        assert set(by_q[2]) == {1, 3}
        assert 3 not in by_q  # no matches -> no rows, not an error

    def test_guards(self, corpus):
        with pytest.raises(ValueError, match="non-empty"):
            tx.bm25_term_scores(corpus, [])
        with pytest.raises(ValueError, match="distinct"):
            tx.bm25_term_scores(corpus, ["a", "a"])
        with pytest.raises(ValueError, match="queries"):
            tx.bm25_topk(corpus, [])
        with pytest.raises(ValueError, match="k >= 1"):
            tx.bm25_topk(corpus, [(1, ["a"])], k=0)


class TestExtractHrefs:
    def test_all_three_forms_in_document_order(self, spark):
        from wordpress_sql_to_contentstack_exporter_spark.functions import urls as U

        html = (
            '<p><a href="https://a.com/1">x</a>'
            " <a class='k' href='http://b.org/2'>y</a>"
            " <A HREF=https://c.net/3>z</A>"
            ' <a name="no-href">skip</a>'
            ' <area href="https://not-an-anchor.io/"><a href="">empty</a></p>'
        )
        d = spark.createDataFrame([(1, html)], "id long, html string")
        got = d.select(U.extract_hrefs(F.col("html")).alias("h")).collect()[0]["h"]
        assert got == [
            "https://a.com/1",
            "http://b.org/2",
            "https://c.net/3",
            "",
        ]

    def test_no_links_empty_array(self, spark):
        from wordpress_sql_to_contentstack_exporter_spark.functions import urls as U

        d = spark.createDataFrame([(1, "<p>plain</p>")], "id long, html string")
        got = d.select(U.extract_hrefs(F.col("html")).alias("h")).collect()[0]["h"]
        assert got == []
