"""Date/time scalar transforms (SURVEY.md §2.f rows 35-36).

The session timezone must be UTC (session.get_spark pins it) so that
formatting a stored-GMT timestamp reproduces JS ``Date.toISOString()``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: JS Date.toISOString() shape: ``2018-12-17T07:36:08.594Z`` (posts.js:151).
ISO8601_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def iso8601(ts: Column | str) -> Column:
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, ISO8601_FMT)


def year_str(ts: Column | str) -> Column:
    """``getFullYear()`` — posts.js:92."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "yyyy")


def padded_month(ts: Column | str) -> Column:
    """``getMonth()+1`` zero-padded — posts.js:94-99."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "MM")


def padded_day(ts: Column | str) -> Column:
    """``getDate()`` zero-padded — posts.js:101-106."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.date_format(c, "dd")


def epoch_day(ts: Column) -> Column:
    """Whole days since 1970-01-01 as a long (works for TIMESTAMP and
    TIMESTAMP_NTZ under the session's pinned UTC zone)."""
    return F.floor(
        F.unix_micros(ts.cast("timestamp")) / F.lit(86_400_000_000).cast("long")
    ).cast("long")


#: weekdays-in-[0, d) prefix table for a week starting at epoch day 0
#: (1970-01-01 was a THURSDAY): offsets 0..6 have Monday-based weekday
#: 3,4,5,6,0,1,2 -> weekday flags 1,1,0,0,1,1,1 -> cumulative prefix.
_WEEKDAY_PREFIX = [0, 1, 2, 2, 2, 3, 4, 5]


def weekdays_before(d: Column) -> Column:
    """Number of WEEKDAYS (Mon-Fri) in [1970-01-01, epoch day ``d``) —
    pure integer arithmetic from the epoch-day long, so any engine
    computing from the same long agrees exactly (dayofweek() builtins
    differ in week-start conventions across engines; this avoids them
    entirely). ``weekdays_before(b) - weekdays_before(a)`` is the
    business-day count in [a, b)."""
    arr = F.array(*[F.lit(x) for x in _WEEKDAY_PREFIX])
    return (
        F.floor(d / 7).cast("long") * 5
        + F.element_at(arr, (d % 7 + 1).cast("int")).cast("long")
    )
