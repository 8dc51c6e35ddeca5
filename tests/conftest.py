from __future__ import annotations

import datetime as dt
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from wordpress_sql_to_contentstack_exporter_spark.session import get_spark
from wordpress_sql_to_contentstack_exporter_spark.sources.catalog import Catalog

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", master="local[4]", shuffle_partitions=4)
    yield s


def _ts(y, mo, d, h=0, mi=0, s=0, ms=0):
    return dt.datetime(y, mo, d, h, mi, s, ms * 1000)


@pytest.fixture(scope="session")
def wp_catalog(spark):
    """WordPress-shaped fixture tables (FIXTURES.md family A)."""
    cat = Catalog(spark)

    users = spark.createDataFrame(
        [(1, "alice", "alice@example.com"), (2, "Bob B", "bob@example.com"), (3, "carol", "carol@example.com")],
        "ID long, user_login string, user_email string",
    )
    usermeta = spark.createDataFrame(
        [
            (1, "first_name", "Alice"),
            (1, "last_name", "Liddell"),
            (1, "description", "writes things"),
            (2, "first_name", "Bob"),
            (2, "last_name", "Builder"),
            # bob has no description -> dropped by the EAV inner join
            (3, "first_name", "Carol"),
            (3, "last_name", "Kaye"),
            (3, "description", "bassist"),
            (3, "nickname", "cc"),  # irrelevant key, must be ignored
        ],
        "user_id long, meta_key string, meta_value string",
    )
    posts = spark.createDataFrame(
        [
            (10, 1, _ts(2018, 12, 17, 7, 36, 8, 594), _ts(2018, 12, 17, 7, 36, 8, 594),
             "Hello & World", "hello-world", "<p>hi</p>", "publish", "post",
             "http://example.com/blog/?p=10"),
            (11, 99, _ts(2019, 1, 2, 3, 4, 5, 0), _ts(2019, 1, 2, 3, 4, 5, 0),
             "Orphan", "orphan", "body", "publish", "post",
             "http://example.com/blog/?p=11"),
            (12, 1, _ts(2019, 2, 1), _ts(2019, 2, 1),
             "Draft", "draft", "x", "draft", "post", "http://example.com/blog/?p=12"),
            (13, 1, _ts(2019, 3, 1), _ts(2019, 3, 1),
             "A Page", "a-page", "x", "publish", "page", "http://example.com/blog/?page_id=13"),
            (20, 1, _ts(2018, 11, 1), _ts(2018, 11, 1),
             "img one", "img-one", "", "inherit", "attachment",
             "http://media.example.com/uploads/img one.png"),
            (21, 1, _ts(2018, 11, 2), _ts(2018, 11, 2),
             "bad", "bad", "", "inherit", "attachment",
             "http://media.example.com/uploads/fail.jpg"),
        ],
        "ID long, post_author long, post_date timestamp, post_date_gmt timestamp, "
        "post_title string, post_name string, post_content string, post_status string, "
        "post_type string, guid string",
    )
    postmeta = spark.createDataFrame(
        [(10, "_thumbnail_id", "20")],
        "post_id long, meta_key string, meta_value string",
    )
    terms = spark.createDataFrame(
        [(100, "Tech &amp; Sci", "tech-sci"), (101, "News", "news"), (102, "Sub News", "Sub-News")],
        "term_id long, name string, slug string",
    )
    term_taxonomy = spark.createDataFrame(
        [
            (1000, 100, "category", "desc &amp; more", 0),
            (1001, 101, "category", "", 0),
            (1002, 102, "category", None, 101),
            (1003, 100, "post_tag", "", 0),
        ],
        "term_taxonomy_id long, term_id long, taxonomy string, description string, parent long",
    )
    term_relationships = spark.createDataFrame(
        [(10, 1000), (10, 1001), (11, 1002), (13, 1000)],
        "object_id long, term_taxonomy_id long",
    )
    options = spark.createDataFrame(
        [("permalink_structure", "/%year%/%monthnum%/%postname%/"),
         ("siteurl", "http://example.com/blog")],
        "option_name string, option_value string",
    )

    for name, df in {
        "users": users,
        "usermeta": usermeta,
        "posts": posts,
        "postmeta": postmeta,
        "terms": terms,
        "term_taxonomy": term_taxonomy,
        "term_relationships": term_relationships,
        "options": options,
    }.items():
        df.cache()
        cat.register(name, lambda s, _df=df: _df)
    return cat
