"""Registry ordering contract: the correctness driver snapshots the FIRST
50 entries of ``queries()``. Round 2 lost green evidence for 7 queries
because rows-only entries crowded oracle-backed ones out of that window;
these tests pin the invariant so it cannot regress silently."""

from __future__ import annotations

from wordpress_sql_to_contentstack_exporter_spark.plans.registry import ORACLE_SQL, SPARK_QUERIES

DRIVER_WINDOW = 50


def test_oracle_backed_queries_precede_rows_only():
    names = list(SPARK_QUERIES)
    first_rows_only = next(
        (i for i, n in enumerate(names) if n not in ORACLE_SQL), len(names)
    )
    trailing = names[first_rows_only:]
    assert all(n not in ORACLE_SQL for n in trailing), (
        "oracle-backed query listed after a rows-only one: "
        + str([n for n in trailing if n in ORACLE_SQL])
    )


def test_all_oracle_backed_queries_fit_driver_window():
    names = list(SPARK_QUERIES)
    outside = [n for n in names[DRIVER_WINDOW:] if n in ORACLE_SQL]
    assert not outside, f"oracle-backed queries outside the 50-entry window: {outside}"


def test_every_oracle_entry_has_a_query():
    missing = [n for n in ORACLE_SQL if n not in SPARK_QUERIES]
    assert not missing
