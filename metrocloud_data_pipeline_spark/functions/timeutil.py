"""Time-bucketing and timestamp arithmetic column helpers.

The reference leans on TimescaleDB's ``time_bucket`` (database/init.sql:179-209,
:293-321). We reproduce its epoch-aligned tumbling-bucket semantics with
explicit epoch arithmetic rather than ``F.window`` so that the bucket label
is a plain timestamp column (not a struct) and the computation is
timezone-free (session TZ is pinned to UTC by session.tune, matching
TIMESTAMPTZ behavior).

All sub-second-precision differences use integer microsecond arithmetic
(``unix_micros``) — exact, and identical to DuckDB's ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_UNIT_SECONDS = {
    "second": 1,
    "minute": 60,
    "hour": 3600,
    "day": 86400,
    "week": 7 * 86400,
}


def bucket_seconds(width: str) -> int:
    """Parse a bucket width like '15 minutes' / '1 hour' into seconds."""
    parts = width.strip().split()
    if len(parts) == 1:
        n, unit = 1, parts[0]
    else:
        n, unit = int(parts[0]), parts[1]
    unit = unit.rstrip("s").lower()
    if unit not in _UNIT_SECONDS:
        raise ValueError(f"unsupported bucket unit {unit!r} in {width!r}")
    return n * _UNIT_SECONDS[unit]


def time_bucket(ts: Column | str, width: str) -> Column:
    """Epoch-aligned tumbling bucket start (TimescaleDB time_bucket parity).

    floor(epoch(ts)/w)*w as a timestamp. For '1 hour'/'1 day' this equals
    ``date_trunc`` in UTC; for arbitrary widths ('15 minutes', '90 seconds')
    it matches time_bucket's epoch-aligned origin.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    w = bucket_seconds(width)
    return F.timestamp_seconds(F.floor(F.unix_timestamp(c) / w).cast("long") * w)


def micros(ts: Column | str) -> Column:
    """Integer microseconds since epoch (exact; DuckDB epoch_us parity).

    Defensively casts to TIMESTAMP first: unix_micros rejects
    TIMESTAMP_NTZ inputs, and under the UTC session TZ pinned by
    session.tune the NTZ->TIMESTAMP cast is an exact relabeling.
    """
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c.cast("timestamp"))


def seconds_between(a: Column | str, b: Column | str) -> Column:
    """(a - b) in fractional seconds via exact integer micros then one division."""
    return (micros(a) - micros(b)).cast("double") / F.lit(1000000.0)


def minutes_between(a: Column | str, b: Column | str) -> Column:
    return (micros(a) - micros(b)).cast("double") / F.lit(60000000.0)
