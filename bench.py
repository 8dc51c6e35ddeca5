"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop-format write (full column
materialization — no count() short-circuits), timed individually after a
small warm-up action that amortizes JVM/codegen startup.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
from wordpress_sql_to_contentstack_exporter_spark.session import get_spark

#: Headline set: scan+multi-agg, 3-way join+topk, decorrelated group-concat,
#: EAV pivot, windows/sessionization, flagship ETL, dedup, text features,
#: similarity search.
HEADLINE = [
    "agg_stats",
    "top_revenue",
    "group_concat",
    "eav_pivot",
    "window_latest_event",
    "sessionize",
    "flagship_posts_export",
    "dedup_exact",
    "text_quality",
    "fingerprint",
    "minhash_neardup",
    "simhash_neardup",
    "ann_cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # Warm up the JVM + parquet footer cache outside the timed region.
    spark.read.parquet(f"{sf_dir}/orders.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = SPARK_QUERIES[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
