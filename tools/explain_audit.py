"""Physical-plan audit: assert the scale-critical plan properties hold.

Checks (per query): filters pushed to the parquet scan, column pruning
(ReadSchema only carries referenced columns), broadcast joins where a side
is known-small, whole-stage codegen coverage. Run:

    python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import io
import re
import sys

sys.path.insert(0, "/root/repo")

from contextlib import redirect_stdout


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import SPARK_QUERIES
    from wordpress_sql_to_contentstack_exporter_spark.session import get_spark

    spark = get_spark("explain_audit")
    failures = []

    def check(name: str, *preds: tuple[str, str]):
        plan = plan_of(SPARK_QUERIES[name](spark, sf_dir))
        for desc, pattern in preds:
            ok = re.search(pattern, plan) is not None
            print(f"{'ok  ' if ok else 'FAIL'}  {name}: {desc}")
            if not ok:
                failures.append((name, desc))
                print(plan[:4000])

    # Filter + projection push down to the parquet scan.
    check(
        "filter_project",
        ("status filter pushed to scan", r"PushedFilters: \[.*o_orderstatus.*\]"),
        ("price filter pushed to scan", r"PushedFilters: \[.*o_totalprice.*\]"),
        ("column pruning (3-col ReadSchema)", r"ReadSchema: struct<o_orderkey:bigint,o_custkey:bigint"),
        ("whole-stage codegen", r"\[codegen id : \d+\]"),
    )
    # IN-list pushdown.
    check("in_list_filter", ("IN filter pushed", r"PushedFilters: \[.*In\(o_orderkey"))
    # Small dimension joins go broadcast.
    check("broadcast_lookup", ("broadcast hash join", r"BroadcastHashJoin"))
    check("inner_join", ("broadcast hash join", r"BroadcastHashJoin"))
    check(
        "top_revenue",
        ("customer side broadcast", r"BroadcastHashJoin"),
        ("orderdate filter pushed", r"PushedFilters: \[.*o_orderdate"),
        ("shipdate filter pushed", r"PushedFilters: \[.*l_shipdate"),
    )
    # Aggregations do map-side partial aggregation.
    check(
        "agg_stats",
        ("partial aggregate", r"HashAggregate"),
        ("pruned lineitem scan (no l_orderkey)", r"ReadSchema: struct<l_quantity"),
    )
    # Flagship: left joins stay broadcast for the dim, group-concat aggregates pre-join.
    check(
        "flagship_posts_export",
        ("broadcast customer dim", r"BroadcastHashJoin.*LeftOuter|BroadcastHashJoin"),
        ("publish filter pushed", r"PushedFilters: \[.*o_orderstatus"),
    )
    # Dedup: shuffle carries 32-byte hashes, not bodies.
    check(
        "dedup_exact",
        ("hash aggregate", r"HashAggregate"),
        ("text not in shuffle output", r"Arguments: hashpartitioning\(content_hash"),
    )
    # Decontamination: the benchmark gram side broadcasts — the document
    # stream must not shuffle for the overlap join.
    check(
        "decontaminate",
        ("benchmark grams broadcast", r"BroadcastHashJoin"),
    )
    # PII redaction: pure map stage — no exchange anywhere in the plan.
    check(
        "pii_redact",
        ("no shuffle in redaction", r"\A(?s:(?!.*Exchange).*)\Z"),
        ("whole-stage codegen", r"\[codegen id : \d+\]"),
    )
    # Embedding near-dup gate: bucketed LSH join, never a nested loop.
    check(
        "embedding_neardup",
        ("no all-pairs join", r"\A(?s:(?!.*(?:CartesianProduct|BroadcastNestedLoopJoin)).*)\Z"),
    )

    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL PLAN CHECKS OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
