"""Scale-adaptive partitioning helpers.

The local bench reads single-file parquet tables that plan as ONE scan
split, so a map-only Python kernel downstream of such a scan runs on
one core no matter how many the session has. At production scale the
same scan has thousands of splits and needs nothing. `fan_out_scan`
closes that gap the way the optimization guide prescribes (§2: derive
partitioning from the input, never a constant tuned for one mode): it
inspects the frame's ACTUAL planned partitioning and round-robins it
up to the session's parallelism only when the scan is narrower — a
no-op exchange-free pass-through on any input already wide enough, so
a 100 TB corpus never pays the extra shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out_scan(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Round-robin `df` up to the session default parallelism iff its
    planned partitioning is narrower. Row-content preserving; used
    immediately before per-row-independent Arrow kernels."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
