"""Regenerate COVERAGE.md's driver-evidence provenance table from the
committed CORRECTNESS_r0*.json artifacts.

The table is evidence-derived by doctrine (VERDICT r5 #2): hand-editing
it is how provenance drifts from reality — round 8 ended with 50 driver
greens recorded in the artifact but the table still reading "driver row
pending" because the regeneration script lived only in a session
transcript (VERDICT r8 #3). This tool makes the regeneration a
committed, re-runnable step:

    python tools/provenance.py          # rewrite COVERAGE.md in place
    python tools/provenance.py --check  # exit 1 if the table is stale

Green = rows_match & schema_match & hash_match & no err, for
oracle-backed queries only (rows-only queries' evidence lives in the
no_oracle blocks of CORRECTNESS_local.json). Red rounds are listed so a
later green visibly supersedes them. The "in window" column reflects
the CURRENT registry order (the next driver snapshot), not any past
round's.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# "In current window", not a computed r{latest+1}: the latest committed
# artifact's round number does not track rounds whose driver run never
# materialized (r9 produced no CORRECTNESS file), so a computed
# next-round label goes stale (ADVICE r10 #1).
TABLE_HEADER = "| Query | Driver-green rounds | Driver-red rounds (resolved) | In current window |"

BEGIN = "| Query | Driver-green rounds |"


def load_rounds() -> dict[int, dict]:
    rounds = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rounds[int(m.group(1))] = json.load(open(path))
    return rounds


def is_green(entry: dict) -> bool:
    return bool(
        entry.get("rows_match")
        and entry.get("schema_match")
        and entry.get("hash_match")
        and not entry.get("err")
    )


def build_table() -> tuple[str, int]:
    sys.path.insert(0, REPO)
    from wordpress_sql_to_contentstack_exporter_spark.plans.registry import (
        DRIVER_SNAPSHOT_WINDOW,
        ORACLE_SQL,
        SPARK_QUERIES,
    )

    rounds = load_rounds()
    latest = max(rounds)
    names = list(SPARK_QUERIES)
    window = set(names[:DRIVER_SNAPSHOT_WINDOW])

    lines = [TABLE_HEADER, "|---|---|---|---|"]
    for name in names:
        if name not in ORACLE_SQL:
            # rows-only: hash/oracle evidence lives in
            # CORRECTNESS_local.json; the driver still records a
            # rows/err row when a rows-only query holds a window slot
            # (round-11 rotation, VERDICT r10 ask #3) — surface those
            # contacts so the table shows the driver environment has
            # executed the query at least once.
            # a contact is CLEAN when the query produced rows and the
            # only "error" is the absence of an oracle; any other err is
            # a RED — the env-divergence signal the deliberate rows-only
            # window slots exist to surface (review r11 #2: hiding an
            # errored contact as "pending" would defeat the rotation)
            contacts, reds = [], []
            for r in sorted(rounds):
                if name not in rounds[r]:
                    continue
                entry = rounds[r][name]
                clean = entry.get("spark_rows") is not None and entry.get(
                    "err"
                ) in (None, "", "no_oracle")
                (contacts if clean else reds).append(r)
            if not contacts and not reds and name not in window:
                continue
            if contacts:
                cell = "rows-only driver contact " + ",".join(
                    f"r{r}" for r in contacts
                )
            elif reds:
                cell = "rows-only (driver contact FAILED — see red column)"
            else:
                cell = "rows-only (in window; driver contact pending)"
            red_cell = ",".join(f"r{r}" for r in reds)
            win_cell = "yes" if name in window else ""
            lines.append(f"| `{name}` | {cell} | {red_cell} | {win_cell} |")
            continue
        greens = [r for r in sorted(rounds) if is_green(rounds[r].get(name, {}))]
        # a clean rows-only contact from BEFORE a rows-only -> oracle
        # conversion (err='no_oracle', rows produced) is neither a green
        # nor a red for the oracle gate — classify by the row's own
        # content, not by the query's CURRENT oracle membership
        # (round 13: kcore/sentence_chunks/dedup_calibration converted)
        pre_conv = [
            r
            for r in sorted(rounds)
            if name in rounds[r]
            and rounds[r][name].get("err") == "no_oracle"
            # spark_rows > 0, matching the rotation tests' cleanliness
            # bar — a zero-row pre-conversion contact is a real red for
            # a gate that must emit data, and must land in the red
            # column, not this cell (review r13c #5)
            and (rounds[r][name].get("spark_rows") or 0) > 0
        ]
        reds = [
            r
            for r in sorted(rounds)
            if name in rounds[r]
            and not is_green(rounds[r][name])
            and r not in pre_conv
        ]
        if greens:
            green_cell = ",".join(f"r{r}" for r in greens)
        elif pre_conv:
            green_cell = (
                "rows-only contact "
                + ",".join(f"r{r}" for r in pre_conv)
                + " (pre-conversion); oracle driver row pending"
                + (", in current window" if name in window else "")
            )
        elif name in window:
            # "current window", not r{latest+1}: the latest committed
            # artifact's round number does not track rounds whose driver
            # run never materialized (r9 produced no CORRECTNESS file),
            # so a computed next-round label goes stale and misattributes
            # later additions to an earlier window
            green_cell = "local-only (driver row pending, in current window)"
        else:
            green_cell = "local-only (driver row pending)"
        red_cell = ",".join(f"r{r}" for r in reds)
        win_cell = "yes" if name in window else ""
        lines.append(f"| `{name}` | {green_cell} | {red_cell} | {win_cell} |")
    return "\n".join(lines) + "\n", latest


def main() -> int:
    table, latest = build_table()
    cov_path = os.path.join(REPO, "COVERAGE.md")
    text = open(cov_path).read()
    start = text.index(BEGIN)
    # the table runs to the first non-table line after it
    rest = text[start:]
    mt = re.match(r"(?:\|[^\n]*\n)+", rest)
    old_table = rest[: mt.end()]
    new_text = text[:start] + table + rest[mt.end() :]
    if "--check" in sys.argv:
        if old_table != table:
            print("provenance table is STALE — run: python tools/provenance.py")
            return 1
        print("provenance table is current")
        return 0
    open(cov_path, "w").write(new_text)
    print(f"rewrote provenance table from rounds {sorted(load_rounds())} "
          f"(latest r{latest})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
