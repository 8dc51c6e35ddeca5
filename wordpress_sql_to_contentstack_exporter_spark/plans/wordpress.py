"""The WordPress export pipeline — the reference's four modules rebuilt as
DataFrame plans (SURVEY.md §3).

Each ``build_*`` function is pure plan construction: Catalog in,
DataFrame(s) out — no I/O. ``export_*`` wrappers attach the keyed-JSON /
master / DLQ sinks. The module DAG and CLI-equivalent entry points live in
``pipeline.py``.

Logical input tables (Catalog names): ``posts users usermeta terms
term_taxonomy term_relationships postmeta options`` — physical prefix
(``wp_``) handled by the Catalog, never spliced into SQL
(cf. posts.js:179).

Deliberate fixes vs the reference (SURVEY.md §4 "known defects"):
- categories parent resolution is a real self-join, not a per-page dict
  (categories.js:47 bug);
- a post whose author is missing exports ``author: []`` instead of
  crashing on ``null.split`` (posts.js:150);
- permalink/siteurl options are read before planning — no async race
  (posts.js:39-53).
Preserved observable semantics: publish-only posts, EAV inner-join author
drop, ``[""]`` parent for root categories, master-file shapes.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import (
    conditional_array_wrap,
    decode_entities,
    host_strip,
    html_to_text,
    iso8601,
    null_default_array,
    slugify,
)
from ..functions.permalink import compile_permalink
from ..operators.relational import eav_pivot, hierarchy_parent_join
from ..sources.catalog import Catalog
from ..sources.idlist import filter_by_ids


@dataclass
class SiteOptions:
    """The two scalar ``wp_options`` lookups (posts.js:27-28)."""

    permalink_structure: str
    siteurl: str


def read_site_options(cat: Catalog) -> SiteOptions:
    opts = (
        cat.table("options")
        .filter(F.col("option_name").isin(["permalink_structure", "siteurl"]))
        .collect()
    )
    values = {r["option_name"]: r["option_value"] for r in opts}
    return SiteOptions(
        permalink_structure=values.get("permalink_structure", ""),
        siteurl=values.get("siteurl", ""),
    )


def build_featured_image_map(cat: Catalog) -> DataFrame:
    """post ID -> thumbnail asset id (assets.js:46-67): published posts
    joined to postmeta ``_thumbnail_id``."""
    posts = cat.table("posts").filter(
        (F.col("post_type") == "post") & (F.col("post_status") == "publish")
    )
    meta = cat.table("postmeta").filter(F.col("meta_key") == "_thumbnail_id")
    return posts.join(meta, posts.ID == meta.post_id, "inner").select(
        posts.ID.alias("post_id"), F.col("meta_value").alias("featured_image")
    )


def build_post_categories(cat: Catalog) -> DataFrame:
    """Decorrelated form of the per-post category subquery (posts.js:25):
    post ID -> sorted array of category slugs."""
    rel = cat.table("term_relationships")
    tt = cat.table("term_taxonomy").filter(F.col("taxonomy") == "category")
    terms = cat.table("terms")
    return (
        rel.join(tt, "term_taxonomy_id")
        .join(terms, "term_id")
        .groupBy(F.col("object_id").alias("post_id"))
        .agg(F.array_sort(F.collect_list("slug")).alias("category"))
    )


def build_posts(
    cat: Catalog,
    site: SiteOptions,
    ids: DataFrame | None = None,
    *,
    clean_description: bool = False,
) -> DataFrame:
    """The posts module (posts.js:24-26,145-163): publish-only filter, left
    join users, category aggregation, featured image, scalar transforms.

    ``clean_description=True`` adds a ``clean_description`` field:
    ``post_content`` through ``functions.html_to_text`` (the reference
    ships ``full_description`` as verbatim HTML — posts.js:151 — which
    is useless to the text-analysis plane; the projection is the bridge
    between the export pipeline and the quality/dedup operators it
    feeds, VERDICT r8 #6). Map-only codegen — the option adds zero
    shuffles. Default off: the reference's own output schema has no
    such field, and the golden parity fixtures pin that shape."""
    posts = cat.table("posts").filter(
        (F.col("post_type") == "post") & (F.col("post_status") == "publish")
    )
    if ids is not None:
        posts = filter_by_ids(posts, ids, "ID")
    users = cat.table("users").select(
        F.col("ID").alias("__uid"), F.col("user_login")
    )
    # Broadcast ONLY the users dimension (genuinely small, O(authors)).
    # build_post_categories / build_featured_image_map are post-cardinality
    # (one row per post) — they grow with the fact table, so a forced
    # broadcast would OOM at scale. Left unhinted, AQE broadcasts them
    # while small and falls back to a shuffle join when not.
    joined = (
        posts.join(F.broadcast(users), posts.post_author == F.col("__uid"), "left")
        .join(build_post_categories(cat), posts.ID == F.col("post_id"), "left")
        .join(
            build_featured_image_map(cat).withColumnRenamed("post_id", "__fpid"),
            posts.ID == F.col("__fpid"),
            "left",
        )
    )
    guid_path = host_strip(F.col("guid"))
    # The reference passes the HOST-STRIPPED guid into getURL
    # (posts.js:149-150) — the empty-structure fallback splits that, not
    # the raw guid.
    url = compile_permalink(
        site.permalink_structure,
        site.siteurl,
        post_id=F.col("ID"),
        date_gmt=F.col("post_date_gmt"),
        post_name=F.col("post_name"),
        guid=guid_path,
    )
    fields = [
        F.col("post_title").alias("title"),
        url.alias("url"),
        null_default_array(F.split(F.col("user_login"), ",")).alias("author"),
        iso8601(F.col("post_date_gmt")).alias("date"),
        guid_path.alias("guid"),
        F.col("post_content").alias("full_description"),
        F.col("ID").alias("uid"),
        F.coalesce(F.col("category"), F.array().cast("array<string>")).alias("category"),
        F.col("featured_image").alias("featured_image"),
    ]
    if clean_description:
        fields.append(
            html_to_text(F.col("post_content")).alias("clean_description")
        )
    entry = F.struct(*fields)
    # No global orderBy: the keyed-JSON sink sorts by key anyway, so the
    # reference's ORDER BY post_date (a paging artifact) would only add a
    # full range-partition shuffle with no observable effect.
    return joined.select(F.col("ID").alias("key"), entry.alias("entry"))


def build_authors(cat: Catalog, ids: DataFrame | None = None) -> DataFrame:
    """The authors module (authors.js:22-24,51): EAV pivot with inner-join
    drop semantics — an author missing any of first_name/last_name/
    description is not exported (README.md:77)."""
    users = cat.table("users")
    if ids is not None:
        users = filter_by_ids(users, ids, "ID")
    meta = eav_pivot(
        cat.table("usermeta"),
        "user_id",
        ["first_name", "last_name", "description"],
        require_all=True,
    )
    joined = users.join(meta, users.ID == meta.user_id, "inner")
    entry = F.struct(
        F.col("ID"),
        F.col("user_login").alias("title"),
        slugify(F.col("user_login"), "/author/").alias("url"),
        F.col("user_email").alias("email"),
        F.col("first_name"),
        F.col("last_name"),
        F.col("description").alias("biographical_info"),
        F.col("user_login").alias("uid"),
    )
    return joined.select(F.col("user_login").alias("key"), entry.alias("entry"))


def build_categories(cat: Catalog, ids: DataFrame | None = None) -> DataFrame:
    """The categories module (categories.js:22-24,45-73): terms x taxonomy
    inner join, entity decode, parent slug via self-join (fixed semantics),
    ``[""]`` for roots."""
    terms = cat.table("terms")
    tt = cat.table("term_taxonomy").filter(F.col("taxonomy") == "category")
    all_nodes = terms.join(tt, "term_id").select(
        F.col("term_id").alias("id"),
        F.col("name"),
        F.col("slug"),
        F.col("description"),
        F.col("parent"),
    )
    nodes = filter_by_ids(all_nodes, ids, "id") if ids is not None else all_nodes
    # parents resolve against the UNFILTERED node set: a subset re-export
    # must still find parents outside the subset (via the shared
    # hierarchy operator, so the semantics cannot drift from
    # q_hierarchy_parent's conformance-tested implementation)
    resolved = hierarchy_parent_join(
        nodes,
        id_col="id",
        parent_col="parent",
        slug_col="slug",
        parent_nodes=all_nodes,
    )
    entry = F.struct(
        F.col("id"),
        decode_entities(F.col("name")).alias("title"),
        slugify(F.lower(F.col("slug")), "/category/").alias("url"),
        decode_entities(F.col("description")).alias("description"),
        conditional_array_wrap(F.col("parent") != 0, F.col("parent_slug")).alias("parent"),
        F.col("slug").alias("uid"),
    )
    return resolved.select(F.col("slug").alias("key"), entry.alias("entry"))


def build_attachments(cat: Catalog, ids: DataFrame | None = None) -> DataFrame:
    """The assets module's scan (assets.js:27): all attachment rows."""
    atts = cat.table("posts").filter(F.col("post_type") == "attachment")
    if ids is not None:
        atts = filter_by_ids(atts, ids, "ID")
    return atts
