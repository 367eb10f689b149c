"""Skew mitigation: salted aggregation and salted joins.

AQE already handles skewed SHUFFLE JOINS (spark.sql.adaptive.skewJoin
splits oversized post-shuffle partitions at runtime; enabled in
session.tune). These helpers cover the two cases AQE does NOT fix:

- a skewed groupBy key: one giant key's rows all land in one reducer
  regardless of partition splitting, because the aggregation needs
  them co-located. salted_agg splits every key across `buckets`
  sub-aggregates, then combines — legal for any algebraic aggregate
  (sum/count/min/max, and avg as sum+count).
- a shuffle join against a few hot keys where the dim side is too big
  to broadcast outright: salted_join spreads the hot big-side rows
  across `buckets` shuffle partitions and replicates the matching
  small-side rows across all salts (small side grows x buckets, so
  keep it for genuinely small-but-unbroadcastable sides or pre-filter
  to the hot keys).

At the reference's scale this never triggers (8 devices, uniform); at
100 TB with per-device grouping (OP-A1..A5) a chatty device or a
default/null device_id is exactly this shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# re-aggregation rule per metric: (partial agg fn, final combine fn)
_ALGEBRAIC = {
    "sum": ("sum", "sum"),
    "count": ("count", "sum"),
    "min": ("min", "min"),
    "max": ("max", "max"),
}


def salted_agg(
    df: DataFrame,
    keys: list[str],
    metrics: dict[str, tuple[str, str]],
    buckets: int = 32,
) -> DataFrame:
    """Two-phase aggregation with a synthetic salt on the group key.

    metrics: {output_name: (fn, column)} with fn in
    {sum, count, min, max, avg}; column "*" counts rows. Phase 1 groups
    by (keys + salt) — the hot key's rows split across `buckets`
    reducers; phase 2 combines the tiny per-salt partials. Results are
    identical to a plain groupBy for exact types (longs/decimals);
    double sums differ only by float summation order, same as any
    two-phase plan.

    Spark's own partial aggregation does the same split map-side, but
    only BEFORE the shuffle: when the per-key partial still exceeds one
    task (billions of rows for one key, or partial-agg fallback to
    sort-based), the salt is what keeps reducers balanced.
    """
    if not 1 < buckets:
        raise ValueError("buckets must be > 1")
    salted = df.withColumn("_salt", F.floor(F.rand(7) * buckets).cast("int"))
    partials: list = []
    finals: list = []
    for out, (fn, col) in metrics.items():
        c = F.lit(1) if col == "*" else F.col(col)
        if fn == "avg":
            partials.append(F.sum(c).alias(f"_s_{out}"))
            partials.append(F.count(c).alias(f"_c_{out}"))
            finals.append((F.sum(f"_s_{out}") / F.sum(f"_c_{out}")).alias(out))
        elif fn in _ALGEBRAIC:
            p_fn, f_fn = _ALGEBRAIC[fn]
            partials.append(getattr(F, p_fn)(c).alias(f"_p_{out}"))
            finals.append(getattr(F, f_fn)(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"{fn!r} is not algebraic; supported: sum/count/min/max/avg")
    return salted.groupBy(*keys, "_salt").agg(*partials).groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Each big-side row gets a random salt in [0, buckets); each
    small-side row is exploded across every salt, so matches land in
    `buckets` different shuffle partitions instead of one hot reducer.
    Correct for inner and left joins keyed on the salted condition
    (each big row matches exactly the one replica carrying its salt).
    """
    b = big.withColumn("_salt_b", F.floor(F.rand(11) * buckets).cast("int"))
    s = small.withColumn("_salt_s", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1))))
    joined = b.join(
        s,
        (F.col(big_key) == F.col(small_key)) & (F.col("_salt_b") == F.col("_salt_s")),
        how,
    )
    return joined.drop("_salt_b", "_salt_s")
