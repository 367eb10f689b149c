"""Numeric column helpers shared across operators."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round6(c: Column) -> Column:
    """Canonical 6-decimal rounding for derived double outputs.

    Applied to every *computed* floating aggregate the engine exposes so
    that results are stable across aggregation orders (floating-point sums
    are not associative across partitions; see ARCHITECTURE notes).
    """
    return F.round(c, 6)


def safe_double(c: Column | str, default: float = 0.0) -> Column:
    """float(v)-or-default (reference _safe_float, ruuvitag_adapter.py:439-444)."""
    col = F.col(c) if isinstance(c, str) else c
    return F.coalesce(col.cast("double"), F.lit(float(default)))


def clamp(c: Column, lo: float, hi: float) -> Column:
    """least/greatest clamp (reference battery-% clamp, ruuvitag_adapter.py:446-468)."""
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi))


def pct(numer: Column, denom: Column) -> Column:
    """100.0 * numer / denom as double (anomaly_percentage, init.sql:261-290)."""
    return F.lit(100.0) * numer.cast("double") / denom.cast("double")
