"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``metrocloud_data_pipeline_spark`` — see
SURVEY.md §2 for the operator inventory each query name maps to.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from metrocloud_data_pipeline_spark.queries import (
    a1_device_summary,
    get_oracle_sql,
    get_queries,
)

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-device lifetime summary (OP-A1, the reference's
    device_summary view) over the sf0.001 events table."""
    return a1_device_summary(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle twins for every SQL-expressible query."""
    return get_oracle_sql()
