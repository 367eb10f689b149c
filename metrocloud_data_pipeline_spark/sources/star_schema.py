"""Parquet star-schema source (the driver's /root/testdata tables).

`events` plays the reference's `sensor_readings` hypertable
(user_id<->device_id, event_type<->device_type, ts, value,
props<->device_metadata JSON) per FIXTURES.md §4; TPC-H-ish tables
exercise the join/aggregate surface at bench scale.

At cluster scale these reads are partition-pruned, filter-pushed parquet
scans; nothing here materializes or caches by default.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimensions that should always broadcast in joins.
DIM_TABLES = frozenset({"region", "nation", "customer", "supplier", "part"})


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table as a DataFrame (lazy parquet scan)."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and isinstance(df.schema["ts"].dataType, LongType):
        # TIMESTAMP(NANOS) surfaced as long nanos: truncate to micros
        # (DuckDB's ns->us conversion also truncates).
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # timestamp[us] written without a timezone reads as TIMESTAMP_NTZ,
    # which unix_micros/date filters reject or misplan. The session TZ
    # is pinned to UTC (session.tune), so casting is an exact
    # relabeling. Applied to every table: the round-3 testdata drift hit
    # events.ts, but orders/lineitem date columns can drift identically.
    ntz = [f.name for f in df.schema.fields if isinstance(f.dataType, TimestampNTZType)]
    for c in ntz:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql access."""
    for t in TABLES:
        load(spark, sf_dir, t).createOrReplaceTempView(t)
