"""Cross-engine edge parity for the EVENTS-table queries — the third
module of the family (documents: test_oracle_edge_parity.py,
embeddings: test_oracle_edge_parity_embeddings.py): the oracle-backed
events queries run over a PATHOLOGICAL events table instead of the
well-behaved driver fixtures.

Edge shapes: null value / null event_type / null user_id / null-and-
empty props, duplicate (user_id, ts) pairs, a user with one single
event, same-timestamp bursts, an isolated event far in the future
(gap/session/LOCF boundaries), negative and zero values. Keys the
driver generator always fills (event_id, ts) stay non-null — that is
the generator contract; everything nullable in the schema goes null
here.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from metrocloud_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES

EVENT_QUERIES = [
    "a1_device_summary",
    "a2_hourly_aggregates",
    "a3_daily_aggregates",
    "a4_device_stats",
    "a6_table_stats",
    "a8_duplicate_report",
    "a9_daily_quality",
    "a15_grouping_sets",
    "a16_mad_outliers",
    "a17_diurnal_profile",
    "a19_time_weighted_avg",
    "a20_counter_delta",
    "a21_value_histogram",
    "a22_trend_slope",
    "t2_pivot_event_values",
    "f1_recent_readings",
    "f2_type_filter",
    "f4_between_range",
    "f5_integrity_report",
    "q1_latest_readings",
    "q3_top3_per_device",
    "w1_gap_detection",
    "w2_moving_average",
    "w4_user_sessions",
    "w5_event_funnel",
    "w6_cohort_retention",
    "w9_event_transitions",
    "obs_throughput_5min",
    "obs_anomaly_rate_hourly",
    "obs_hot_keys",
    "dq_profile_events",
    "iv_error_windows",
    "asof_last_error",
    # r12 completeness sweep: the five oracle-backed events-only keys a
    # registry scan found absent from this list (a cube, a rollup, the
    # as-of twin, interval merge, native sessionization)
    "a11_type_daily_rollup",
    "a12_type_dow_cube",
    "asof_next_error",
    "iv_merged_outages",
    "w4b_sessions_native",
    # r12 sweep, second pass: the READINGS-family keys (events loaded
    # via the readings() helper, which the first load-pattern scan
    # missed) — the registry gate now counts helper loads too
    "a5_timeseries_15min",
    "a7_type_distribution",
    "a10_realtime_monitor",
    "a13_daily_from_hourly",
    "a13b_cascade_incremental",
    "a14_sliding_monitor",
    "a18_seasonal_deviation",
    "dq_expectations_report",
    "f3_anomalous_readings",
    "f6_metadata_lookup",
    "f6b_metadata_lookup_indexed",
    "f6c_tags_lookup_indexed",
    "f7_devices_gone_quiet",
    "f8_devices_in_both_windows",
    "obs_alert_firing",
    "q2_export_device_range",
    "w3_rate_of_change",
    "w7_locf_fill",
    "w8_gapfill_resample",
    "w8b_gapfill_interpolate",
    "w10_m4_downsample",
]

T0 = "2025-09-26 12:00:00"
EDGE_ROWS = [
    # (event_id, ts, user_id, event_type, value, props)
    (1, "2025-09-26 12:00:00", 1, "view", 1.5, '{"k":"a"}'),
    (2, "2025-09-26 12:00:00", 1, "view", 1.5, '{"k":"a"}'),   # exact dup burst
    (3, "2025-09-26 12:00:01", 1, "click", None, None),        # null value+props
    (4, "2025-09-26 12:30:00", 1, "purchase", -7.25, ""),      # negative, empty props
    (5, "2025-09-26 13:00:00", 1, "error", 0.0, '{"k":"b"}'),  # zero value
    (6, "2025-09-26 12:05:00", 2, None, 3.0, '{"k":"c"}'),     # null event_type
    (7, "2025-09-26 12:06:00", None, "view", 4.0, '{"k":"d"}'),  # null user
    (8, "2025-09-26 12:07:00", None, "view", None, None),        # null user+value
    (9, "2025-09-30 23:59:59", 3, "view", 9.0, '{"k":"e"}'),     # lone future event
    (10, "2025-09-26 12:00:00", 4, "error", 100.0, '{"k":"f"}'),  # single-event user
    (11, "2025-09-26 12:00:02", 1, "view", 2.5, '{"k":"g"}'),
    (12, "2025-09-26 14:00:00", 2, "purchase", 8.0, '{"k":"h"}'),
    # r12 second wave: shapes the f6/w10 findings suggested —
    # NUMERIC metadata (exercises the lookup's true branch, not just
    # the NULL path), malformed JSON props, and an extreme magnitude
    (13, "2025-09-26 12:40:00", 4, "view", 1.0, '{"k":54}'),
    (14, "2025-09-26 12:41:00", 4, "view", 2.0, "not json at all"),
    (15, "2025-09-26 12:42:00", 4, "view", 1.0e6, '{"k":"z"}'),  # large but double-exact
]


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("events_edge")
    df = spark.createDataFrame(
        EDGE_ROWS,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).select(
        "event_id",
        F.col("ts").cast("timestamp_ntz").alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    df.coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


def _canon(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    d = d.sort_values(by=cols).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name", EVENT_QUERIES)
def test_events_edge_parity(spark, events_dir, name):
    got = SPARK_QUERIES[name](spark, events_dir).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{events_dir}/events.parquet/*.parquet'"
    )
    want = con.execute(ORACLE_SQL[name]).df()
    # the driver's comparator sorts columns BY NAME before hashing, so
    # name-set equality (not order) is the contract (a15's oracle lists
    # gid first; the Spark frame lists it third — both valid)
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    assert _canon(got) == _canon(want), (
        got.sort_values(by=sorted(got.columns)).head(25),
        want.sort_values(by=sorted(want.columns)).head(25),
    )
