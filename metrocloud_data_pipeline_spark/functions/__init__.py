from .timeutil import time_bucket, micros, seconds_between, minutes_between
from .numeric import round6, safe_double, clamp, pct

__all__ = [
    "time_bucket",
    "micros",
    "seconds_between",
    "minutes_between",
    "round6",
    "safe_double",
    "clamp",
    "pct",
]
