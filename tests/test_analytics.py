"""Analytics-builder unit tests on hand-built micro-DataFrames.

Covers the subtle parity bits called out in SURVEY.md §7: max_by/min_by
ordered-pick semantics (incl. null handling), epoch-aligned bucket
labels, window frames, and top-k determinism.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from metrocloud_data_pipeline_spark.functions.timeutil import time_bucket
from metrocloud_data_pipeline_spark.operators import analytics as A


def ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def readings(spark):
    rows = [
        # reading_id, device_id, device_type, ts, value
        (1, "dev1", "temp", ts("2024-01-01T00:10:00"), 10.0),
        (2, "dev1", "temp", ts("2024-01-01T00:40:00"), 20.0),
        (3, "dev1", "temp", ts("2024-01-01T02:00:00"), 200.0),  # anomaly, after 80-min gap
        (4, "dev2", "temp", ts("2024-01-01T00:05:00"), 5.0),
        (5, "dev2", "temp", ts("2024-01-01T00:20:00"), None),   # null value
        (6, "dev3", "hum", ts("2024-01-01T01:00:00"), 55.0),
    ]
    df = spark.createDataFrame(
        rows, "reading_id long, device_id string, device_type string, ts timestamp, value double"
    )
    return A.with_anomaly_flag(df, threshold=150.0).cache()


def test_device_summary_ordered_picks(readings):
    out = {r["device_id"]: r for r in A.device_summary(readings).collect()}
    d1 = out["dev1"]
    assert d1["reading_count"] == 3
    assert d1["last_value"] == 200.0  # max_by(value, ts)
    assert d1["first_reading"] == ts("2024-01-01T00:10:00")
    assert d1["anomaly_count"] == 1
    # last(x, ts) skips NULL values like every SQL arg_max (r10 _last_by:
    # bare max_by RESPECTED the null at the latest ts and hash-diverged
    # from the DuckDB oracle on null-valued readings — events edge
    # fixture): dev2's latest ts has null value, so the last NON-null
    # value wins; an all-null group would stay NULL
    d2 = out["dev2"]
    assert d2["reading_count"] == 2
    assert d2["last_value"] == 5.0  # latest non-null value (arg_max)
    assert d2["avg_value"] == 5.0  # avg ignores nulls


def test_time_bucket_labels(spark):
    df = spark.createDataFrame(
        [(ts("2024-01-01T10:37:22"),), (ts("2024-01-01T10:44:59"),), (ts("2024-01-01T10:45:00"),)],
        "t timestamp",
    )
    got = [r[0].isoformat() for r in df.select(time_bucket("t", "15 minutes")).collect()]
    assert got == ["2024-01-01T10:30:00", "2024-01-01T10:30:00", "2024-01-01T10:45:00"]
    hour = [r[0].isoformat() for r in df.select(time_bucket("t", "1 hour")).collect()]
    assert hour == ["2024-01-01T10:00:00"] * 3


def test_bucket_aggregates_hourly(readings):
    out = A.bucket_aggregates(readings, "1 hour", by_device=True).collect()
    k = {(r["bucket"].isoformat(), r["device_id"]): r for r in out}
    b = k[("2024-01-01T00:00:00", "dev1")]
    assert b["reading_count"] == 2
    assert b["last_value"] == 20.0
    assert b["anomaly_count"] == 0
    assert k[("2024-01-01T02:00:00", "dev1")]["anomaly_count"] == 1


def test_device_stats_anomaly_pct(readings):
    out = {r["device_id"]: r for r in A.device_stats(readings).collect()}
    assert out["dev1"]["anomaly_pct"] == pytest.approx(100.0 / 3, abs=1e-6)
    assert out["dev3"]["anomaly_pct"] == 0.0


def test_gap_detection(readings):
    gaps = A.gap_detection(readings, min_gap_minutes=30.0).collect()
    assert len(gaps) == 1
    g = gaps[0]
    assert g["device_id"] == "dev1"
    assert g["gap_minutes"] == pytest.approx(80.0)


def test_moving_average_frame(readings):
    out = {r["reading_id"]: r for r in A.moving_average(readings, frame=11).collect()}
    assert out[1]["moving_avg"] == 10.0
    assert out[2]["moving_avg"] == 15.0
    assert out[3]["moving_avg"] == pytest.approx(76.666667, abs=1e-6)
    assert out[1]["delta"] is None
    assert out[3]["delta"] == 180.0


def test_rate_of_change(readings):
    out = {r["reading_id"]: r for r in A.rate_of_change(readings).collect()}
    # dev1: (20-10)/(30min) * 3600 = 20/hr
    assert out[2]["rate_per_hour"] == pytest.approx(20.0)
    assert 1 not in out  # first row per device has no rate


def test_latest_readings_topk_deterministic(readings):
    out = A.latest_readings(readings, n=3).collect()
    assert [r["reading_id"] for r in out] == [3, 6, 2]


def test_recent_and_distribution_anchor(readings):
    # anchor = max ts = 02:00; 24h window covers everything
    assert A.recent_readings(readings, hours=24).count() == 6
    dist = {r["device_type"]: r["reading_count"] for r in A.type_distribution(readings, days=7).collect()}
    assert dist == {"temp": 5, "hum": 1}


def test_duplicate_report(spark):
    df = spark.createDataFrame(
        [
            (1, "d", "t", ts("2024-01-01T00:00:00"), 1.0),
            (2, "d", "t", ts("2024-01-01T00:00:00"), 2.0),
            (3, "d", "t", ts("2024-01-01T00:01:00"), 3.0),
        ],
        "reading_id long, device_id string, device_type string, ts timestamp, value double",
    )
    r = A.duplicate_report(df).first()
    assert r["dup_groups"] == 1
    assert r["surplus_rows"] == 1


def test_table_stats_and_approx(readings):
    r = A.table_stats(readings).first()
    assert r["total_readings"] == 6
    assert r["distinct_devices"] == 3
    ra = A.table_stats_approx(readings).first()
    assert ra["distinct_devices"] == 3  # HLL exact at tiny cardinality


def test_integrity_report_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "d", "t", ts("2024-01-01T00:00:00"), 1.0),
            (2, None, "t", ts("2024-01-01T00:01:00"), 2.0),
            (3, "d", "t", ts("2024-01-01T00:02:00"), 999.0),
        ],
        "reading_id long, device_id string, device_type string, ts timestamp, value double",
    )
    r = A.integrity_report(df, value_lo=0.0, value_hi=500.0).first()
    assert r["null_device_count"] == 1
    assert r["out_of_range_count"] == 1
    assert r["duplicate_rows"] == 0


def test_expectations_report_single_pass_and_verdicts(spark):
    from pyspark.sql import functions as F

    from metrocloud_data_pipeline_spark.operators import quality as Q

    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 500.0), (4, 20.0)], "id long, v double"
    )
    out = {r["expectation"]: r for r in Q.expectations_report(
        df,
        [
            ("v_not_null", F.col("v").isNotNull(), 1.0),
            ("v_small", F.col("v") <= 100.0, 0.5),
            ("id_positive", F.col("id") > 0, 1.0),
        ],
    ).collect()}
    assert out["v_not_null"]["n_pass"] == 3 and not out["v_not_null"]["passed"]
    # NULL v counts as a failure for v_small (conservative)
    assert out["v_small"]["n_pass"] == 2 and out["v_small"]["passed"]
    assert out["id_positive"]["passed"]
    # empty frame: vacuously passing, fraction 1.0
    empty = Q.expectations_report(
        df.where("id < 0"), [("anything", F.col("v").isNotNull(), 1.0)]
    ).first()
    assert empty["n_rows"] == 0 and empty["passed"] and empty["pass_fraction"] == 1.0


def test_rollup_cascade_equals_direct_daily(spark):
    # the hourly->daily cascade must be value-identical to aggregating
    # raw at daily width directly (exact cent sums make the two-level
    # association drift-free)
    from datetime import datetime

    from metrocloud_data_pipeline_spark.operators import analytics as A

    rows = []
    for d in (1, 2):
        for h in (0, 5, 23):
            for i in range(4):
                rows.append(
                    (
                        datetime(2024, 1, d, h, i * 7),
                        "sensor",
                        round(10.0 * d + h + 0.01 * i, 2),
                        i == 0,
                    )
                )
    df = spark.createDataFrame(rows, "ts timestamp, device_type string, value double, is_anomaly boolean")
    casc = {(str(r["bucket"]), r["device_type"]): r for r in A.rollup_cascade(df).collect()}
    direct = {
        (str(r["bucket"]), r["device_type"]): r
        for r in A.bucket_aggregates(df.withColumn("device_id", F.lit(1)), "1 day", by_device=False, with_first=True).collect()
    }
    assert casc.keys() == direct.keys() and len(casc) == 2
    for k in casc:
        for c in ("reading_count", "avg_value", "min_value", "max_value", "anomaly_count", "last_value", "first_value"):
            assert casc[k][c] == direct[k][c], (k, c, casc[k][c], direct[k][c])


def test_mad_outliers_flags_planted_spike(spark):
    from metrocloud_data_pipeline_spark.queries import SPARK_QUERIES

    # build a tiny events table through the readings mapping used by the
    # query: 9 calm values + one spike for device 1; device 2 all calm
    import datetime as dt

    rows = []
    for i in range(9):
        rows.append((i, dt.datetime(2024, 1, 1, i), 1, "view", 10.0 + (i % 3), "{}"))
    rows.append((9, dt.datetime(2024, 1, 1, 10), 1, "view", 500.0, "{}"))
    for i in range(5):
        rows.append((20 + i, dt.datetime(2024, 1, 1, i), 2, "view", 7.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["device_id"]: r for r in SPARK_QUERIES["a16_mad_outliers"](spark, d).collect()}
    assert out[1]["n_outliers"] == 1          # only the spike exceeds 3 MAD
    assert out[1]["med"] == 11.0
    assert out[2]["n_outliers"] == 0 and out[2]["mad"] == 0.0


def test_locf_fill_carries_last_good_value(spark):
    from metrocloud_data_pipeline_spark.queries import SPARK_QUERIES

    import datetime as dt

    rows = [
        # device 1: good, ANOMALY (value>150 under the readings mapping), good
        (0, dt.datetime(2024, 1, 1, 0), 1, "view", 10.0, "{}"),
        (1, dt.datetime(2024, 1, 1, 1), 1, "view", 200.0, "{}"),
        (2, dt.datetime(2024, 1, 1, 2), 1, "view", 30.0, "{}"),
        # device 2: LEADING anomaly stays null after fill
        (3, dt.datetime(2024, 1, 1, 0), 2, "view", 300.0, "{}"),
        (4, dt.datetime(2024, 1, 1, 1), 2, "view", 5.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        df.write.parquet(f"{d}/events.parquet")
        out = {r["reading_id"]: r for r in SPARK_QUERIES["w7_locf_fill"](spark, d).collect()}
    assert out[1]["raw_value"] is None and out[1]["filled_value"] == 10.0
    assert out[2]["filled_value"] == 30.0
    assert out[3]["raw_value"] is None and out[3]["filled_value"] is None
    assert out[4]["filled_value"] == 5.0


def test_value_histogram_slots_and_bounds(spark):
    """Timescale histogram() slot convention: underflow in bucket 0
    (open lower bound), overflow in bucket nbuckets+1 (open upper
    bound), interior buckets carry [lo, hi) arithmetic bounds; empty
    buckets emit no rows."""
    from metrocloud_data_pipeline_spark.operators.analytics import value_histogram

    rows = [
        ("t", -5.0),   # underflow
        ("t", 0.0),    # bucket 1 [0, 10)
        ("t", 9.99),   # bucket 1
        ("t", 10.0),   # bucket 2 [10, 20)
        ("t", 99.9),   # bucket 10 [90, 100)
        ("t", 100.0),  # overflow (hi is exclusive of the top bucket)
        ("t", 250.0),  # overflow
        ("u", 55.0),   # bucket 6 for the other key
    ]
    df = spark.createDataFrame(rows, "device_type string, value double")
    out = {
        (r["device_type"], r["bucket"]): r
        for r in value_histogram(df, lo=0.0, hi=100.0, nbuckets=10).collect()
    }
    assert out[("t", 0)]["n_values"] == 1
    assert out[("t", 0)]["bucket_lo"] is None and out[("t", 0)]["bucket_hi"] == 0.0
    assert out[("t", 1)]["n_values"] == 2
    assert (out[("t", 1)]["bucket_lo"], out[("t", 1)]["bucket_hi"]) == (0.0, 10.0)
    assert out[("t", 2)]["n_values"] == 1
    assert out[("t", 10)]["n_values"] == 1
    assert out[("t", 11)]["n_values"] == 2
    assert out[("t", 11)]["bucket_hi"] is None and out[("t", 11)]["bucket_lo"] == 100.0
    assert out[("u", 6)]["n_values"] == 1
    # empty buckets absent (e.g. t bucket 5)
    assert ("t", 5) not in out
    # every value accounted for
    assert sum(r["n_values"] for r in out.values()) == len(rows)


def test_trend_slope_recovers_planted_drift(spark):
    """OLS on planted linear data recovers the exact slope/intercept
    with r2 = 1; a single-reading bucket reports NULL (vertical fit);
    a flat series reports slope 0 with NULL r2 (zero y-variance)."""
    from datetime import datetime

    from metrocloud_data_pipeline_spark.operators.analytics import trend_slope

    rows = []
    # device a: value = 10 + 2.5 * hours_since_midnight (exact 2dp points)
    for h in range(6):
        rows.append(("a", datetime(2024, 1, 1, h), 10.0 + 2.5 * h))
    # device b: one reading
    rows.append(("b", datetime(2024, 1, 1, 3), 42.0))
    # device c: flat
    for h in range(4):
        rows.append(("c", datetime(2024, 1, 1, h), 7.0))
    df = spark.createDataFrame(rows, "device_id string, ts timestamp, value double")
    out = {r["device_id"]: r for r in trend_slope(df, bucket="1 day").collect()}
    a = out["a"]
    assert a["n_readings"] == 6
    assert abs(a["slope_per_hour"] - 2.5) < 1e-6
    assert abs(a["intercept"] - 10.0) < 1e-6
    assert a["r2"] == 1.0
    b = out["b"]
    assert b["slope_per_hour"] is None and b["r2"] is None
    c = out["c"]
    assert c["slope_per_hour"] == 0.0 and c["intercept"] == 7.0 and c["r2"] is None
