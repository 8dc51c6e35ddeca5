"""Local mirror of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB
over the same parquet tables, then compares row count, column names and an
order-insensitive value hash (columns sorted by name, rows sorted by their
canonical string form). Usage:

    python tools/oracle_check.py [sf_dir] [query ...]

When run over the FULL registry (no query filter), also writes
``CORRECTNESS_local.json`` at the repo root in the driver's row format —
the driver itself snapshots only the first 50 ``queries()`` entries, so
the committed local file is the evidence of record for anything past the
window (and for every rows-only query).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def canon(value) -> str:
    import datetime
    import math

    if value is None:
        return "∅"
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        # normalize -0.0 and float repr
        if value == 0:
            return "0"
        return repr(round(value, 9))
    if isinstance(value, datetime.datetime):
        return value.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(value, list):
        return "[" + ",".join(canon(v) for v in value) + "]"
    return str(value)


def frame_fingerprint(cols: list[str], rows: list[tuple]) -> tuple[int, list[str], int]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    sorted_cols = [cols[i] for i in order]
    canon_rows = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    return len(rows), sorted_cols, hash(tuple(canon_rows))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb

    import __spark_entry__ as entrymod
    from wordpress_sql_to_contentstack_exporter_spark.session import get_spark

    spark = get_spark("oracle_check")

    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {e}")
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": None, "oracle_rows": None,
                "err": f"spark:{type(e).__name__}",
            }
            continue
        if name not in oracles:
            print(f"rows  {name}: {len(srows)} rows (rows-only, {time.time()-t0:.1f}s)")
            report[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(srows), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            res = con.execute(oracles[name])
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {e}")
            report[name] = {
                "rows_match": False, "schema_match": False, "hash_match": False,
                "spark_rows": len(srows), "oracle_rows": None,
                "err": f"duckdb:{type(e).__name__}",
            }
            continue
        sn, sc, sh = frame_fingerprint(scols, srows)
        dn, dc, dh = frame_fingerprint(dcols, drows)
        status = "ok  " if (sn, sc, sh) == (dn, dc, dh) else "FAIL"
        report[name] = {
            "rows_match": sn == dn, "schema_match": sc == dc, "hash_match": sh == dh,
            "spark_rows": sn, "oracle_rows": dn, "err": None,
        }
        if status == "FAIL":
            failures.append(name)
        print(f"{status}  {name}: spark {sn} rows, duck {dn} rows, "
              f"cols {'=' if sc == dc else f'{sc} vs {dc}'}, "
              f"hash {'=' if sh == dh else '!='} ({time.time()-t0:.1f}s)")
        if status == "FAIL" and sn == dn and sc == dc:
            # show first differing canonical rows for debugging
            order_s = sorted(range(len(scols)), key=lambda i: scols[i])
            order_d = sorted(range(len(dcols)), key=lambda i: dcols[i])
            rs = sorted("|".join(canon(r[i]) for i in order_s) for r in srows)
            rd = sorted("|".join(canon(r[i]) for i in order_d) for r in drows)
            for a, b in zip(rs, rd):
                if a != b:
                    print(f"      spark: {a}\n      duck : {b}")
                    break
    if not only:
        import json
        import os

        out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "CORRECTNESS_local.json")
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": report}, f, indent=2)
        print(f"\nwrote {out} ({len(report)} queries)")
    print(f"\n{len(failures)} failures: {failures}" if failures else "\nALL OK")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
