"""Data-quality operators — integrity invariants and per-batch metrics.

The reference enforces quality operationally (database_utils.py:329-415
integrity checks; metrics.py counters). Here the same invariants are
cheap aggregates usable in batch or inside foreachBatch (OP-M2/§2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integrity_violations(df: DataFrame, id_col: str = "device_id", ts_col: str = "timestamp") -> DataFrame:
    """Row-level integrity tags (database_utils.py:341-379): null/empty id,
    future timestamp, out-of-range battery / coordinates. Returns only
    violating rows with a `violations` array column."""
    checks = [
        ((F.col(id_col).isNull()) | (F.col(id_col).cast("string") == ""), "null_or_empty_device_id"),
        (F.col(ts_col) > F.current_timestamp(), "future_timestamp"),
    ]
    if "battery_level" in df.columns:
        checks.append((F.col("battery_level").isNotNull() & ~F.col("battery_level").between(0, 100), "battery_out_of_range"))
    if "latitude" in df.columns:
        checks.append((F.col("latitude").isNotNull() & ~F.col("latitude").between(-90, 90), "latitude_out_of_range"))
    if "longitude" in df.columns:
        checks.append((F.col("longitude").isNotNull() & ~F.col("longitude").between(-180, 180), "longitude_out_of_range"))
    tagged = df.withColumn(
        "violations",
        F.array_compact(F.array(*[F.when(cond, F.lit(name)) for cond, name in checks])),
    )
    return tagged.where(F.size("violations") > 0)


def duplicate_pairs(df: DataFrame, keys=("device_id", "timestamp")) -> DataFrame:
    """Duplicate (device_id, ts) groups (database_utils.py:382-395)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)


def batch_metrics(df_in: DataFrame, df_valid: DataFrame, df_rejected: DataFrame) -> dict:
    """Per-batch pipeline metrics (§2.11): rows in/valid/rejected/anomalous.

    Single-action counts; intended for foreachBatch where the batch is
    small relative to cluster memory."""
    rows_in = df_in.count()
    rows_valid = df_valid.count()
    rows_rejected = df_rejected.count()
    anomalies = (
        df_valid.where(F.col("is_anomaly")).count() if "is_anomaly" in df_valid.columns else 0
    )
    return {
        "rows_in": rows_in,
        "rows_valid": rows_valid,
        "rows_rejected": rows_rejected,
        "anomalies": anomalies,
        "validation_failure_rate": (rows_rejected / rows_in) if rows_in else 0.0,
    }
