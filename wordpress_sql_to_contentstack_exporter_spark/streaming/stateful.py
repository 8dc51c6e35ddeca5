"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState``.

The batch form (plans/registry.q_sessionize) is lag+running-sum; the
streaming form keeps one open session per user in the state store and
emits a session row when a later event closes it (gap exceeded). State
survives restarts via the checkpoint, so Trigger.AvailableNow micro-runs
compose: a session spanning two runs is stitched, not split.

Scale notes: state is (3 longs) per active user — shuffled by user_id
once; the state store scales horizontally with partitions. For
production add a watermark + event-time timeout to garbage-collect
abandoned sessions; kept NoTimeout here so AvailableNow runs never drop
an open session between runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, n_events long"
)
STATE_SCHEMA = "start long, last long, n long"

_US = 1_000_000


def _session_fn_factory(gap_seconds: int):
    gap_us = gap_seconds * _US

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(int(t.value // 1000) for t in pd.to_datetime(pdf["ts"]))
        ts_us.sort()

        if state.exists:
            start, last, n = state.get
        else:
            start = last = None
            n = 0

        closed: list[tuple[int, int, int, int]] = []
        for t in ts_us:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > gap_us:
                closed.append((user_id, start, last, n))
                start, last, n = t, t, 1
            else:
                last, n = t, n + 1
        state.update((start, last, n))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": [pd.Timestamp(c[1] * 1000) for c in closed],
                    "session_end": [pd.Timestamp(c[2] * 1000) for c in closed],
                    "n_events": [c[3] for c in closed],
                }
            )

    return fn


def sessionize_stream(
    events: DataFrame, *, gap_seconds: int = 1800
) -> DataFrame:
    """events(user_id, ts) [streaming] -> closed sessions [streaming].

    Emits a row per session once a later event proves the gap; the open
    tail session per user lives in state until then.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _session_fn_factory(gap_seconds),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


HH_OUTPUT_SCHEMA = "event_type string, item long, est_count long, max_err long"
#: Space-Saving state: parallel arrays of tracked items, their counters,
#: and per-item overestimation bounds (flattened — the state store takes
#: flat tuples, not dicts).
HH_STATE_SCHEMA = "items array<long>, counts array<long>, errs array<long>"


def _heavy_hitters_fn_factory(k: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (event_type,) = key
        if state.exists:
            items, counts, errs = state.get
            table = {i: [c, e] for i, c, e in zip(items, counts, errs)}
        else:
            table = {}
        for pdf in pdfs:
            for item in pdf["item"]:
                item = int(item)
                if item in table:
                    table[item][0] += 1
                elif len(table) < k:
                    table[item] = [1, 0]
                else:
                    # evict the min counter; the newcomer inherits its
                    # count as the overestimation bound (Space-Saving,
                    # Metwally et al. 2005 — public algorithm)
                    victim = min(table, key=lambda x: (table[x][0], x))
                    vc = table[victim][0]
                    del table[victim]
                    table[item] = [vc + 1, vc]
        items = sorted(table, key=lambda x: (-table[x][0], x))
        state.update((items, [table[i][0] for i in items], [table[i][1] for i in items]))
        yield pd.DataFrame(
            {
                "event_type": [event_type] * len(items),
                "item": items,
                "est_count": [table[i][0] for i in items],
                "max_err": [table[i][1] for i in items],
            }
        )

    return fn


def heavy_hitters_stream(events: DataFrame, *, k: int = 10) -> DataFrame:
    """Streaming top-k heavy hitters per event type via the
    Space-Saving sketch in ``applyInPandasWithState`` — O(k) state per
    key however long the stream runs, with the sketch's guarantee that
    any item with true frequency > stream_len/k is tracked, and each
    estimate overshoots by at most ``max_err``.

    The third custom stateful operator (after the sessionizer and the
    MinHash signature index): use it where exact per-item counts
    (unbounded state) are not affordable — per-entity trending items,
    hot-key detection feeding the salting operators. Emits the CURRENT
    top-k after each micro-batch per key (update-mode semantics).
    """
    return events.groupBy("event_type").applyInPandasWithState(
        _heavy_hitters_fn_factory(k),
        outputStructType=HH_OUTPUT_SCHEMA,
        stateStructType=HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
