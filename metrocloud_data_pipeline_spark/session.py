"""SparkSession construction and runtime tuning.

The engine targets a multi-executor cluster reading ~100 TB; locally we
run ``local[N]``. Two layers of configuration:

- :func:`get_spark` — build-time confs (master, memory, serializer).
- :func:`tune` — runtime-mutable confs applied defensively at the top of
  every query builder, because the harness may hand us a session we did
  not build (session timezone must be UTC for TIMESTAMPTZ-parity with
  the reference, see SURVEY.md §7(f)).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Shuffle partition count for the local harness. At cluster scale this
# would be set to ~2-3x total executor cores (or left to AQE's
# coalescing with a high initial value); 32 matches local[32].
DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "metrocloud-spark", cpus: int | None = None) -> SparkSession:
    """Build a local SparkSession with scale-appropriate defaults.

    AQE is on (runtime re-planning, skew-join splitting, partition
    coalescing); broadcast threshold is raised so every dimension table
    in the star schema broadcasts instead of shuffling.
    """
    n = cpus or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{n}]")
        .config("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-mutable confs to a session we may not have built.

    Idempotent and cheap; called at the top of every query builder so
    results are deterministic (UTC timestamps) regardless of who
    constructed the session.
    """
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")
    # The driver's events.parquet carries TIMESTAMP(NANOS) which the
    # vectorized reader rejects; read as long and convert explicitly
    # (sources.star_schema normalizes back to TimestampType at micros).
    conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    try:
        conf.set("spark.sql.shuffle.partitions", str(DEFAULT_SHUFFLE_PARTITIONS))
    except Exception:
        pass  # static in some deployments; AQE coalescing still applies
    return spark
