"""URL parsing functions: component extraction edge cases and the
registrable-domain heuristic."""

from __future__ import annotations

from pyspark.sql import functions as F

from wordpress_sql_to_contentstack_exporter_spark.functions import urls as U


def _parse(spark, url):
    row = (
        spark.range(1)
        .select(
            U.url_scheme(F.lit(url)).alias("scheme"),
            U.url_host(F.lit(url)).alias("host"),
            U.url_port(F.lit(url)).alias("port"),
            U.url_path(F.lit(url)).alias("path"),
            U.url_query(F.lit(url)).alias("query"),
            U.url_fragment(F.lit(url)).alias("fragment"),
            U.query_param(F.lit(url), "q").alias("q"),
        )
        .collect()[0]
    )
    return row.asDict()


def test_full_url_components(spark):
    r = _parse(spark, "https://user:pw@sub.example.co.uk:8443/a/b.html?q=1&r=2#frag")
    assert r == {
        "scheme": "https",
        "host": "sub.example.co.uk",
        "port": "8443",
        "path": "/a/b.html",
        "query": "q=1&r=2",
        "fragment": "frag",
        "q": "1",
    }


def test_minimal_and_junk_urls(spark):
    r = _parse(spark, "http://example.com")
    assert (r["host"], r["path"], r["query"], r["port"]) == ("example.com", "", "", "")
    junk = _parse(spark, "hello world not a url")
    assert all(v == "" for v in junk.values())


def test_query_param_escapes_regex_name(spark):
    r = (
        spark.range(1)
        .select(U.query_param(F.lit("http://x.com/?a.b=7&ab=9"), "a.b").alias("v"))
        .collect()[0]["v"]
    )
    assert r == "7"  # '.' matched literally, not as a wildcard


def test_registrable_domain_heuristic(spark):
    cases = {
        "www.example.co.uk": "example.co.uk",
        "a.b.deep.example.com": "example.com",
        "example.org": "example.org",
        "localhost": "localhost",
        "EXAMPLE.COM": "example.com",
        "": "",
    }
    rows = (
        spark.createDataFrame([(h,) for h in cases], "host string")
        .select("host", U.registrable_domain(F.col("host")).alias("d"))
        .collect()
    )
    got = {r["host"]: r["d"] for r in rows}
    assert got == cases


def test_url_normalize_rules(spark):
    from wordpress_sql_to_contentstack_exporter_spark.functions.urls import url_normalize
    from pyspark.sql import functions as F

    cases = [
        # case-fold + default port + tracking drop + query sort + fragment drop
        ("HTTP://Ex.COM:80/a?utm_source=x&b=2&a=1#f", "http://ex.com/a?a=1&b=2"),
        ("https://site.org:443/p", "https://site.org/p"),
        # non-default port kept; userinfo dropped; empty path -> /
        ("https://u:p@shop.net:8443?z=9&ref=feed", "https://shop.net:8443/?z=9"),
        # every param tracked -> no query part at all
        ("http://a.io/x?utm_a=1&utm_b=2", "http://a.io/x"),
        # ftp default port is NOT stripped (only http/https defaults)
        ("ftp://files.net:21/pub", "ftp://files.net:21/pub"),
        ("not a url", ""),
        # idempotence: normalizing a normal form is a no-op
        ("http://ex.com/a?a=1&b=2", "http://ex.com/a?a=1&b=2"),
    ]
    df = spark.createDataFrame(cases, "url string, expect string")
    out = df.select("url", "expect", url_normalize(F.col("url")).alias("got")).collect()
    for r in out:
        assert r["got"] == r["expect"], (r["url"], r["got"], r["expect"])


def test_url_normalize_collapses_dedup_keys(spark):
    from wordpress_sql_to_contentstack_exporter_spark.functions.urls import url_normalize
    from pyspark.sql import functions as F

    variants = [
        "HTTP://Site.com:80/page?b=2&a=1&utm_campaign=x#top",
        "http://site.com/page?a=1&b=2",
        "http://site.com:80/page?utm_source=y&b=2&a=1",
    ]
    df = spark.createDataFrame([(v,) for v in variants], "url string")
    n = df.select(url_normalize(F.col("url")).alias("u")).distinct().count()
    assert n == 1  # all three variants collapse to one dedup key
