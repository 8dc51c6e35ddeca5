"""One-step round-open: end the recurring stale-provenance finding.

Six consecutive rounds (r8-r14) opened with the same judge finding: the
driver writes CORRECTNESS_r{N}.json / BENCH_r{N}.json AFTER the
builder's last commit, so the committed history never contains its own
round's evidence and ``tools/provenance.py --check`` fails at round
start by construction (VERDICT r14 "What's wrong" #1). This tool makes
the repair a single committed step instead of a remembered ritual:

    python tools/open_round.py            # stage + regen + scaffold
    python tools/open_round.py --check    # exit 1 if round-open needed

It, in order:

1. ``git add``s every untracked/modified driver artifact at the repo
   root (CORRECTNESS_r*.json, BENCH_r*.json, BENCH_COMPARE_r*.json,
   BENCH_detail.json, CORRECTNESS_local*.json).
2. Regenerates COVERAGE.md's provenance table (tools/provenance.py)
   and stages it.
3. Prints a window-rotation scaffold for the NEW round: the latest
   artifact's per-query outcomes grouped into green / rows-only / red,
   plus which current-window slots are rotation candidates (green on
   code the new round has not yet touched). The builder pastes the
   chosen sets into tests/test_registry_contract.py — the sets stay
   human-curated (the rotation is a judgment call), but the evidence
   they are curated FROM is now generated, not re-derived by hand.

The caller still runs ``git commit`` — this tool never commits, so a
round-open commit message stays a human decision.
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARTIFACT_GLOBS = [
    "CORRECTNESS_r*.json",
    "BENCH_r*.json",
    "BENCH_COMPARE_r*.json",
    "BENCH_detail.json",
    "CORRECTNESS_local.json",
    "CORRECTNESS_local_sf0.1.json",
]


def _git(*args: str) -> str:
    return subprocess.run(
        ["git", *args], cwd=REPO, capture_output=True, text=True, check=True
    ).stdout


def pending_artifacts() -> list[str]:
    """Driver artifacts that are untracked or modified vs HEAD."""
    status = _git("status", "--porcelain")
    dirty = {line[3:].strip() for line in status.splitlines() if line.strip()}
    out = []
    for pat in ARTIFACT_GLOBS:
        for path in sorted(glob.glob(os.path.join(REPO, pat))):
            rel = os.path.relpath(path, REPO)
            if rel in dirty:
                out.append(rel)
    return out


def latest_round() -> int:
    rounds = [
        int(m.group(1))
        for p in glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))
        if (m := re.search(r"CORRECTNESS_r(\d+)\.json$", p))
    ]
    return max(rounds) if rounds else 0


def scaffold(n: int) -> str:
    """Rotation scaffold from CORRECTNESS_r{n}.json for round n+1."""
    rows = json.load(open(os.path.join(REPO, f"CORRECTNESS_r{n}.json")))
    green, rows_only, red = [], [], []
    for name, e in rows.items():
        if e.get("err") == "no_oracle":
            # a rows-only slot is healthy only if it actually produced
            # rows — `>= 0` was always true and scaffolded empty/failed
            # results as healthy (review r15)
            (rows_only if (e.get("spark_rows") or 0) > 0 else red).append(name)
        elif e.get("hash_match") and e.get("rows_match") and not e.get("err"):
            green.append(name)
        else:
            red.append(name)
    lines = [
        f"# Window scaffold for round {n + 1} (from CORRECTNESS_r{n}.json)",
        f"# r{n} window: {len(green)} oracle-green, {len(rows_only)} rows-only, {len(red)} red.",
        "#",
        "# Rotation rule (standing): r{n} first contacts are retained one more".replace("{n}", str(n)),
        "# round; oracle-greens on code the new round does not touch are the",
        "# candidates that FUND new-gate slots. Reds must stay in until green.",
        "#",
        f"ROUND{n + 1}_WINDOW_GREEN_IN_R{n} = {{",
    ]
    for name in sorted(green):
        lines.append(f'    "{name}",')
    lines.append("}")
    lines.append(f"ROUND{n + 1}_WINDOW_ROWS_ONLY_IN_R{n} = {{")
    for name in sorted(rows_only):
        lines.append(f'    "{name}",')
    lines.append("}")
    if red:
        lines.append(f"# RED in r{n} — must be investigated before rotation:")
        for name in sorted(red):
            lines.append(f"#   {name}: {rows[name].get('err')}")
    return "\n".join(lines)


def main() -> int:
    # unknown flags must not fall through to the mutating default path:
    # `open_round.py --help` once git-staged a 0-byte artifact (r15 —
    # the same lesson as the stray `bench.py --help` full run)
    unknown = [a for a in sys.argv[1:] if a != "--check"]
    if unknown:
        print(__doc__)
        print(f"unknown argument(s): {unknown}; accepted: --check")
        return 2
    check_only = "--check" in sys.argv
    pend = pending_artifacts()
    prov_stale = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "provenance.py"), "--check"],
        capture_output=True,
    ).returncode != 0
    if check_only:
        if pend or prov_stale:
            print(f"round-open needed: pending={pend} provenance_stale={prov_stale}")
            return 1
        print("round-open clean: artifacts committed, provenance current")
        return 0

    if pend:
        _git("add", "--", *pend)
        print(f"staged {len(pend)} driver artifact(s): {', '.join(pend)}")
    else:
        print("no pending driver artifacts")
    subprocess.run([sys.executable, os.path.join(REPO, "tools", "provenance.py")], check=True)
    _git("add", "--", "COVERAGE.md")
    print("provenance regenerated + staged")

    n = latest_round()
    if n:
        print()
        print(scaffold(n))
    print()
    print('next: git commit -m "round open: commit r%d driver evidence, regen provenance"' % n)
    return 0


if __name__ == "__main__":
    sys.exit(main())
