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
