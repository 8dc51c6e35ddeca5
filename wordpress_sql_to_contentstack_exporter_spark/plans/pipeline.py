"""Module DAG + export orchestration (SURVEY.md §2.g rows 42-46, §3).

The reference runs ``sequence([assets, authors, categories, posts])``
(app.js:9,39) with the cross-module dependency assets->posts carried via
the ``_featured.json`` side file. Here the DAG is explicit: stages are
functions over a Catalog; posts consume the featured-image *DataFrame*
directly, so single-module runs materialize their upstream dependencies on
demand instead of trusting a previous run's files (fix of SURVEY.md §3.2).

Output layout mirrors config/index.json:5-27:

    <data>/assets/<ID>/<filename>         downloaded binaries
    <data>/assets/wp_assets.json          asset entries (keyed by ID)
    <data>/entries/{posts,authors,categories}/en-us.json
    <data>/master/entries/{posts,authors,categories}.json  {"en-us": {uid: ""}}
    <data>/master/wp_assets.json          {uid: ""}
    <data>/master/wp_urls.json            {url: ""}   (masterfile of assets)
    <data>/master/wp_failed.json          DLQ {id: error}
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sinks.dlq import write_dlq
from ..sinks.keyed_json import merge_keyed_json, write_keyed_json, write_master_mapping


def _write_entries(df, key, value, path: str, *, partial: bool) -> None:
    """Full runs rewrite the document; ids-subset runs merge into it
    (the reference read-modify-writes every page — clobbering on a
    resume/DLQ re-drive would destroy all other entries)."""
    if partial:
        merge_keyed_json(df, key, value, path)
    else:
        write_keyed_json(df, key, value, path)
from ..sources.catalog import Catalog
from ..sources.http import download_assets
from . import wordpress as wp

MODULES = ["assets", "authors", "categories", "posts"]  # app.js:9 order

#: Reference graph between content types (contenttypes/__master.json:13-40):
#: posts reference authors and categories; categories self-reference (cycle).
REFERENCE_GRAPH: dict[str, list[str]] = {
    "authors": [],
    "categories": ["categories"],  # parent self-reference, isCycle=true
    "posts": ["authors", "categories"],
}


def topo_order(graph: dict[str, list[str]] | None = None) -> list[str]:
    """Topological load order of content types — recomputes the
    reference's hand-written ``__priority.json`` (["authors",
    "categories", "posts"]) from the reference graph. Self-cycles
    (categories.parent) are ignored: a type may depend on already-loaded
    rows of itself. Deterministic: ties resolve alphabetically."""
    g = graph if graph is not None else REFERENCE_GRAPH
    deps = {n: {d for d in ds if d != n and d in g} for n, ds in g.items()}
    out: list[str] = []
    while deps:
        ready = sorted(n for n, ds in deps.items() if not ds)
        if not ready:
            raise ValueError(f"cycle among {sorted(deps)}")
        out.extend(ready)
        for n in ready:
            del deps[n]
        for ds in deps.values():
            ds.difference_update(ready)
    return out


def export_posts(
    cat: Catalog, data_dir: str, ids: DataFrame | None = None, *, locale: str = "en-us"
) -> DataFrame:
    site = wp.read_site_options(cat)
    df = wp.build_posts(cat, site, ids)
    partial = ids is not None
    _write_entries(
        df, F.col("key"), F.col("entry"),
        f"{data_dir}/entries/posts/{locale}.json", partial=partial,
    )
    write_master_mapping(
        df, F.col("key"), f"{data_dir}/master/entries/posts.json",
        locale=locale, merge=partial,
    )
    return df


def export_authors(
    cat: Catalog, data_dir: str, ids: DataFrame | None = None, *, locale: str = "en-us"
) -> DataFrame:
    df = wp.build_authors(cat, ids)
    partial = ids is not None
    _write_entries(
        df, F.col("key"), F.col("entry"),
        f"{data_dir}/entries/authors/{locale}.json", partial=partial,
    )
    write_master_mapping(
        df, F.col("key"), f"{data_dir}/master/entries/authors.json",
        locale=locale, merge=partial,
    )
    return df


def export_categories(
    cat: Catalog, data_dir: str, ids: DataFrame | None = None, *, locale: str = "en-us"
) -> DataFrame:
    df = wp.build_categories(cat, ids)
    partial = ids is not None
    _write_entries(
        df, F.col("key"), F.col("entry"),
        f"{data_dir}/entries/categories/{locale}.json", partial=partial,
    )
    write_master_mapping(
        df, F.col("key"), f"{data_dir}/master/entries/categories.json",
        locale=locale, merge=partial,
    )
    return df


def export_assets(
    cat: Catalog,
    data_dir: str,
    ids: DataFrame | None = None,
    *,
    fetch: Optional[Callable] = None,
    parallelism: int = 2,
    timeout: float = 60.0,
    retries: int = 1,
) -> DataFrame:
    """Download attachments, write asset entries + mappings + DLQ
    (assets.js:70-140,214). Returns the download-result DataFrame."""
    atts = wp.build_attachments(cat, ids)
    # Eager localCheckpoint: the download is a side-effecting computation —
    # materialize its results exactly once (cache() would be lazy AND can
    # collide with a previous run's identical logical plan).
    results = download_assets(
        atts,
        f"{data_dir}/assets",
        fetch=fetch,
        parallelism=parallelism,
        timeout=timeout,
        retries=retries,
    ).localCheckpoint(eager=True)

    partial = ids is not None
    ok = results.filter(F.col("status") != "failed")
    entry = F.struct(
        F.col("id").alias("uid"),
        F.col("filename"),
        F.col("url"),
        F.lit(True).alias("status"),
    )
    _write_entries(ok, F.col("id"), entry, f"{data_dir}/assets/wp_assets.json", partial=partial)
    write_master_mapping(
        ok, F.col("id"), f"{data_dir}/master/wp_assets.json", locale=None, merge=partial
    )
    write_master_mapping(
        ok, F.col("url"), f"{data_dir}/master/wp_urls.json", locale=None, merge=partial
    )
    failures = results.filter(F.col("status") == "failed")
    # DLQ always merges (reference preloads wp_failed.json): successes
    # clear their entries, untouched prior failures survive
    write_dlq(failures, f"{data_dir}/master/wp_failed.json", succeeded=ok)

    os.makedirs(f"{data_dir}/assets", exist_ok=True)
    return results


def run_export(
    cat: Catalog,
    data_dir: str,
    *,
    modules: list[str] | None = None,
    ids: DataFrame | None = None,
    fetch: Optional[Callable] = None,
    locale: str = "en-us",
    asset_parallelism: int = 2,
    http_timeout_s: float = 60.0,
    http_retries: int = 1,
) -> dict[str, DataFrame]:
    """The ``npm run export [module] [ids-file]`` surface (app.js:11-39).

    ``modules=None`` runs all four in the reference's order; a subset runs
    just those (upstream deps are computed on demand, not read from prior
    runs). ``ids`` narrows every selected module — the resume path.
    The locale / HTTP knobs mirror ExportConfig (the reference's
    ``guard.n(2)`` / 60 s / 1-retry constants) and are threaded through
    here — config values must never be silently ignored.
    """
    selected = modules or MODULES
    unknown = set(selected) - set(MODULES)
    if unknown:
        raise ValueError(f"unknown modules: {sorted(unknown)} (valid: {MODULES})")
    out: dict[str, DataFrame] = {}
    for m in MODULES:
        if m not in selected:
            continue
        if m == "assets":
            out[m] = export_assets(
                cat, data_dir, ids, fetch=fetch,
                parallelism=asset_parallelism,
                timeout=http_timeout_s, retries=http_retries,
            )
        elif m == "authors":
            out[m] = export_authors(cat, data_dir, ids, locale=locale)
        elif m == "categories":
            out[m] = export_categories(cat, data_dir, ids, locale=locale)
        elif m == "posts":
            out[m] = export_posts(cat, data_dir, ids, locale=locale)
    return out
