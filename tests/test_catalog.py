"""SQL catalog: init.sql-shaped views queryable through spark.sql."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrocloud_data_pipeline_spark.catalog import VIEW_NAMES, register_views
from metrocloud_data_pipeline_spark.operators import analytics as A
from metrocloud_data_pipeline_spark.queries import readings

SF = "/root/testdata/sf0.001"


def test_register_views_creates_all(spark):
    names = register_views(spark, SF)
    assert names == VIEW_NAMES
    for n in names:
        assert spark.catalog.tableExists(n), n


def test_sql_device_summary_matches_builder(spark):
    register_views(spark, SF)
    via_sql = spark.sql(
        "SELECT device_id, reading_count FROM device_summary"
    ).collect()
    via_builder = (
        A.device_summary(readings(spark, SF)).select("device_id", "reading_count").collect()
    )
    assert sorted(via_sql) == sorted(via_builder)


def test_sql_query_over_view_composes(spark):
    register_views(spark, SF)
    row = spark.sql(
        """
        SELECT count(*) AS n FROM anomalous_sensor_readings
        WHERE device_type = 'click'
        """
    ).first()
    expected = (
        A.anomalous_readings(readings(spark, SF))
        .where(F.col("device_type") == "click")
        .count()
    )
    assert row.n == expected


def test_view_is_not_a_pushdown_barrier(spark):
    register_views(spark, SF)
    df = spark.sql("SELECT reading_id FROM sensor_readings WHERE device_id = 7")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the device filter must reach the parquet scan through the view
    assert "PushedFilters: [" in plan
    assert "user_id" in plan[plan.index("PushedFilters") :].split("]")[0], plan
