"""bench.py stdout contract: the driver tail-captures ONE JSON line.

The primary compact line may outgrow the tail buffer as the registry
accumulates headline gates; when it does, bench falls back to
``fallback_line`` (ADVICE r7/r8). These tests pin that the fallback is
provably bounded — fixed scalar fields only, independent of how many
queries the registry holds (VERDICT r10 ask #6).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import bench  # noqa: E402


def _result(n_queries: int) -> dict:
    return {
        "metric": "headline_queries_total_runtime",
        "value": 12.345,
        "unit": "sec",
        "sf": 0.1,
        "queries": {f"q{i}": 0.123 for i in range(n_queries)},
        "total_cold": 45.678,
        "polluted": False,
    }


def test_fallback_line_is_bounded_and_parseable():
    small = bench.fallback_line(_result(1))
    huge = bench.fallback_line(_result(10_000))
    # independent of registry size: the per-query dict never leaks in
    assert small == huge
    assert len(huge) < 400
    parsed = json.loads(huge)
    assert parsed["truncated"] is True
    assert "queries" not in parsed
    # the driver's parse keys survive
    for key in ("metric", "value", "unit", "sf"):
        assert key in parsed
