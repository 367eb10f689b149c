"""SQL catalog: the reference's view layer as Spark temp views.

The reference exposes its analytics surface as SQL views and
continuous aggregates over sensor_readings (database/init.sql:149-209,
324-368); users query them by name. register_views replays that
catalog on a SparkSession so the same queries run via spark.sql:

    register_views(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT * FROM device_summary ORDER BY reading_count DESC")

Views are lazy logical plans — Catalyst inlines them into each query,
so filter pushdown/pruning still reach the parquet scan (a view is not
a materialization barrier). The hourly/daily aggregate views stand in
for both the plain views (init.sql:179-209) and the continuous
aggregates (init.sql:324-368); the incrementally-maintained variant is
operators/maintenance.refresh_bucket_aggregate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .operators import analytics as A
from .queries import readings

VIEW_NAMES = [
    "sensor_readings",
    "recent_sensor_readings",
    "anomalous_sensor_readings",
    "device_summary",
    "hourly_sensor_aggregates",
    "daily_sensor_aggregates",
]


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create the init.sql-shaped temp-view catalog over sf_dir's tables.

    Returns the view names registered. sensor_readings is the canonical
    readings mapping of the events table (FIXTURES.md §4) with the
    OP-T7 anomaly flag; the rest mirror database/init.sql:149-209."""
    r = readings(spark, sf_dir)
    r.createOrReplaceTempView("sensor_readings")
    A.recent_readings(r).createOrReplaceTempView("recent_sensor_readings")
    A.anomalous_readings(r).createOrReplaceTempView("anomalous_sensor_readings")
    A.device_summary(r).createOrReplaceTempView("device_summary")
    A.bucket_aggregates(r, "1 hour").createOrReplaceTempView("hourly_sensor_aggregates")
    A.bucket_aggregates(r, "1 day", with_first=True).createOrReplaceTempView(
        "daily_sensor_aggregates"
    )
    return list(VIEW_NAMES)
