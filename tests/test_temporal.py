"""Sessionization and as-of join (operators/temporal.py)."""

from __future__ import annotations

import datetime as dt

import pytest

from metrocloud_data_pipeline_spark.operators import temporal


def _ts(minutes: float) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: two sessions split by a 40-min gap
        (0, 1, _ts(0), 1.0),
        (1, 1, _ts(10), 2.0),
        (2, 1, _ts(50), 4.0),
        # user 2: one single-event session
        (3, 2, _ts(5), 8.0),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")


def test_sessionize_gap_splits(spark, events):
    out = {r["event_id"]: r["session_seq"] for r in temporal.sessionize(events, 1800).collect()}
    assert out[0] == 1 and out[1] == 1  # 10-min gap keeps session open
    assert out[2] == 2                  # 40-min gap opens a new one
    assert out[3] == 1


def test_sessionize_boundary_gap_is_inclusive(spark):
    # gap exactly == threshold does NOT split (strict > semantics)
    rows = [(0, 1, _ts(0), 1.0), (1, 1, _ts(30), 1.0)]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp, value double")
    out = {r["event_id"]: r["session_seq"] for r in temporal.sessionize(ev, 1800).collect()}
    assert out[0] == out[1] == 1


def test_session_summary(spark, events):
    out = {
        (r["user_id"], r["session_seq"]): r
        for r in temporal.session_summary(events, 1800).collect()
    }
    s11 = out[(1, 1)]
    assert s11["n_events"] == 2 and s11["total_value"] == 3.0
    assert s11["session_start"] == _ts(0) and s11["session_end"] == _ts(10)
    assert out[(1, 2)]["n_events"] == 1
    assert out[(2, 1)]["total_value"] == 8.0


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(0, 1, _ts(5)), (1, 1, _ts(20)), (2, 1, _ts(2)), (3, 2, _ts(10))],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(1, _ts(3), 100), (1, _ts(20), 200), (2, _ts(11), 300)],
        "user_id long, ts timestamp, ref long",
    )
    out = {
        r["event_id"]: r["ref"]
        for r in temporal.asof_join(left, right, "user_id", "ts", ["ref"]).collect()
    }
    assert out[0] == 100   # latest at-or-before 5 is ts=3
    assert out[1] == 200   # equal timestamp IS visible
    assert out[2] is None  # nothing before ts=2
    assert out[3] is None  # right row for user 2 is later than the left row
    assert len(out) == 4   # exactly |left| rows


def test_asof_join_single_exchange(spark, events):
    right = events.select("user_id", "ts", events["value"].alias("v2"))
    plan = temporal.asof_join(events, right, "user_id", "ts", ["v2"])._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1


def test_interval_join_containment_and_boundaries(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(0), 1.0), (1, _ts(30), 2.0), (1, _ts(31), 4.0), (2, _ts(30), 8.0)],
        "user_id long, ts timestamp, value double",
    )
    ivs = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(30))],  # user 1 only; both ends inclusive
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    out = temporal.interval_join(
        clicks, ivs, key_col="user_id",
        start_col="start_ts", end_col="end_ts", bucket_width="15 minutes",
    ).collect()
    got = sorted((r["iv_id"], r["value"]) for r in out)
    # ts=0 and ts=30 inclusive; ts=31 outside; user 2 never matches
    assert got == [(10, 1.0), (10, 2.0)]


def test_interval_join_multi_bucket_no_duplicates(spark):
    # interval spans 5 buckets; the event pair must appear exactly once
    clicks = spark.createDataFrame(
        [(1, _ts(60), 1.0)], "user_id long, ts timestamp, value double"
    )
    ivs = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(70)), (1, 11, _ts(55), _ts(65))],
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    out = temporal.interval_join(
        clicks, ivs, key_col="user_id",
        start_col="start_ts", end_col="end_ts", bucket_width="15 minutes",
    ).collect()
    # one row per (event, overlapping interval), no bucket-induced dups
    assert sorted(r["iv_id"] for r in out) == [10, 11]


def test_interval_join_plan_has_no_nested_loop(spark):
    clicks = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "user_id long, ts timestamp, value double"
    )
    ivs = spark.createDataFrame(
        [(1, 10, _ts(0), _ts(30))],
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    plan = (
        temporal.interval_join(
            clicks, ivs, key_col="user_id", start_col="start_ts", end_col="end_ts"
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoop" not in plan


def test_interval_join_drops_reversed_intervals(spark):
    # a reversed interval matches nothing under BETWEEN; it must be
    # dropped before sequence() could emit a descending bucket list
    clicks = spark.createDataFrame(
        [(1, _ts(15), 1.0)], "user_id long, ts timestamp, value double"
    )
    ivs = spark.createDataFrame(
        [(1, 10, _ts(30), _ts(0)), (1, 11, _ts(0), _ts(30))],
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    out = temporal.interval_join(
        clicks, ivs, key_col="user_id",
        start_col="start_ts", end_col="end_ts", bucket_width="15 minutes",
    ).collect()
    assert [r["iv_id"] for r in out] == [11]


def test_interval_join_rejects_runaway_fanout(spark):
    # a sentinel open-ended interval would explode into ~5e8 bucket rows;
    # the cap must fail the job loudly instead
    clicks = spark.createDataFrame(
        [(1, _ts(0), 1.0)], "user_id long, ts timestamp, value double"
    )
    ivs = spark.createDataFrame(
        [(1, 10, _ts(0), dt.datetime(9999, 12, 31))],
        "user_id long, iv_id long, start_ts timestamp, end_ts timestamp",
    )
    with pytest.raises(Exception, match="interval_join: interval spans"):
        temporal.interval_join(
            clicks, ivs, key_col="user_id",
            start_col="start_ts", end_col="end_ts", bucket_width="15 minutes",
        ).collect()


def test_asof_join_forward_with_tolerance(spark):
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [(1, "2025-01-01 10:00:00"), (2, "2025-01-01 12:00:00"), (3, "2025-01-01 13:00:00")],
        "id long, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn("k", F.lit("a"))
    right = spark.createDataFrame(
        [("2025-01-01 10:30:00", 100), ("2025-01-01 12:00:00", 200)],
        "ts string, v int",
    ).withColumn("ts", F.col("ts").cast("timestamp")).withColumn("k", F.lit("a"))

    out = {r["id"]: r["v"] for r in temporal.asof_join(
        left, right.select("k", "ts", "v"), key_col="k", ts_col="ts",
        right_cols=["v"], direction="forward",
    ).collect()}
    assert out[1] == 100      # first right row at-or-after 10:00
    assert out[2] == 200      # equal timestamp IS visible forward
    assert out[3] is None     # nothing after 13:00

    tol = {r["id"]: r["v"] for r in temporal.asof_join(
        left, right.select("k", "ts", "v"), key_col="k", ts_col="ts",
        right_cols=["v"], direction="forward", tolerance_seconds=600,
    ).collect()}
    assert tol[1] is None     # nearest match is 30 min away -> outside 10 min
    assert tol[2] == 200      # zero distance stays

    with pytest.raises(ValueError, match="direction"):
        temporal.asof_join(left, right.select("k", "ts", "v"), "k", "ts", ["v"], direction="nearest")


def test_funnel_steps_orders_strictly(spark):
    from datetime import datetime

    from metrocloud_data_pipeline_spark.operators import temporal

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # u1 completes the funnel in order
        (1, t(0), "view"), (1, t(1), "click"), (1, t(2), "purchase"),
        # u2 clicks BEFORE viewing -> stops at view
        (2, t(1), "click"), (2, t(2), "view"),
        # u3 views then clicks, never purchases
        (3, t(0), "view"), (3, t(5), "click"),
        # u4 purchase precedes click -> reaches click only
        (4, t(0), "view"), (4, t(1), "purchase"), (4, t(2), "click"),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r["step"]: r for r in temporal.funnel_steps(
        events, steps=["view", "click", "purchase"]
    ).collect()}
    assert out[1]["n_keys"] == 4
    assert out[2]["n_keys"] == 3          # u2 has no click after the view
    assert out[3]["n_keys"] == 1          # only u1
    assert out[1]["conv_from_prev_pct"] is None
    assert out[2]["conv_from_prev_pct"] == 75.0
    assert out[3]["conv_from_entry_pct"] == 25.0


def test_cohort_retention_counts_and_pct(spark):
    from datetime import datetime

    from metrocloud_data_pipeline_spark.operators import temporal

    d = lambda day, h=0: datetime(2024, 1, day, h)
    rows = [
        # cohort Jan-1: u1 active d1,d2,d3; u2 active d1,d3 (twice on d3)
        (1, d(1)), (1, d(2)), (1, d(3)),
        (2, d(1)), (2, d(3)), (2, d(3, 5)),
        # cohort Jan-2: u3 active d2 only
        (3, d(2)),
    ]
    events = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(str(r["cohort_day"]), r["day_offset"]): r for r in temporal.cohort_retention(
        events
    ).collect()}
    assert out[("2024-01-01", 0)]["n_active"] == 2
    assert out[("2024-01-01", 1)]["n_active"] == 1      # only u1 on d2
    assert out[("2024-01-01", 2)]["n_active"] == 2      # duplicate d3 visit counts once
    assert out[("2024-01-01", 2)]["retention_pct"] == 100.0
    assert out[("2024-01-02", 0)] == out[("2024-01-02", 0)]  # u3's cohort exists
    assert out[("2024-01-02", 0)]["cohort_size"] == 1


def test_merge_intervals_islands(spark):
    from datetime import datetime

    from metrocloud_data_pipeline_spark.operators import temporal

    t = lambda m: datetime(2024, 1, 1, 0, m)
    rows = [
        # key 1: [0,10] + [5,20] overlap; [20,25] touches -> one island;
        # [40,45] separate
        (1, t(0), t(10)), (1, t(5), t(20)), (1, t(20), t(25)), (1, t(40), t(45)),
        # key 2: containment — [0,30] swallows [5,10]
        (2, t(0), t(30)), (2, t(5), t(10)),
    ]
    iv = spark.createDataFrame(rows, "k long, start timestamp, end timestamp")
    out = {(r["k"], str(r["island_start"])): r
           for r in temporal.merge_intervals(iv, "k").collect()}
    assert len(out) == 3
    a = out[(1, "2024-01-01 00:00:00")]
    assert str(a["island_end"]) == "2024-01-01 00:25:00" and a["n_intervals"] == 3
    b = out[(1, "2024-01-01 00:40:00")]
    assert b["n_intervals"] == 1
    c = out[(2, "2024-01-01 00:00:00")]
    assert str(c["island_end"]) == "2024-01-01 00:30:00" and c["n_intervals"] == 2


def test_gapfill_resample_emits_grid_rows_and_carries_forward(spark):
    from datetime import datetime

    rows = [
        # device a: readings in hour-buckets 00 and 03 — 01 and 02 are gaps
        ("a", datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 0, 50), 20.0),
        ("a", datetime(2024, 1, 1, 3, 5), 40.0),
        # device b: a single bucket — no grid rows to generate
        ("b", datetime(2024, 1, 1, 7, 30), 5.0),
    ]
    df = spark.createDataFrame(rows, "device_id string, ts timestamp, value double")
    out = {(r["device_id"], str(r["bucket_ts"])): r
           for r in temporal.gapfill_resample(df, bucket="1 hour").collect()}
    assert len(out) == 5  # a: 4 buckets (2 generated), b: 1
    a0 = out[("a", "2024-01-01 00:00:00")]
    assert (a0["n_readings"], a0["avg_value"], a0["is_gap"]) == (2, 15.0, False)
    for h in (1, 2):  # generated rows: zero count, null avg, LOCF carry
        g = out[("a", f"2024-01-01 0{h}:00:00")]
        assert (g["n_readings"], g["avg_value"], g["is_gap"]) == (0, None, True)
        assert g["filled_value"] == 15.0
    a3 = out[("a", "2024-01-01 03:00:00")]
    assert a3["filled_value"] == 40.0 and a3["is_gap"] is False
    b = out[("b", "2024-01-01 07:00:00")]
    assert (b["n_readings"], b["filled_value"], b["is_gap"]) == (1, 5.0, False)


def test_gapfill_interpolate_blends_bracketing_buckets(spark):
    from datetime import datetime

    rows = [
        # device a: observed in hour-buckets 00 (avg 15) and 03 (40) —
        # gaps at 01 and 02 interpolate linearly: 15 + 25*(1/3), 15 + 25*(2/3)
        ("a", datetime(2024, 1, 1, 0, 10), 10.0),
        ("a", datetime(2024, 1, 1, 0, 50), 20.0),
        ("a", datetime(2024, 1, 1, 3, 5), 40.0),
        # device b: single bucket — nothing to interpolate
        ("b", datetime(2024, 1, 1, 7, 30), 5.0),
    ]
    df = spark.createDataFrame(rows, "device_id string, ts timestamp, value double")
    out = {(r["device_id"], str(r["bucket_ts"])): r
           for r in temporal.gapfill_interpolate(df, bucket="1 hour").collect()}
    assert len(out) == 5
    a0 = out[("a", "2024-01-01 00:00:00")]
    assert (a0["n_readings"], a0["interp_value"], a0["is_gap"]) == (2, 15.0, False)
    g1 = out[("a", "2024-01-01 01:00:00")]
    g2 = out[("a", "2024-01-01 02:00:00")]
    assert g1["is_gap"] is True and g1["avg_value"] is None
    assert abs(g1["interp_value"] - (15.0 + 25.0 / 3)) < 1e-6
    assert abs(g2["interp_value"] - (15.0 + 50.0 / 3)) < 1e-6
    a3 = out[("a", "2024-01-01 03:00:00")]
    assert a3["interp_value"] == 40.0 and a3["is_gap"] is False
    b = out[("b", "2024-01-01 07:00:00")]
    assert (b["n_readings"], b["interp_value"], b["is_gap"]) == (1, 5.0, False)
    # every row (observed or generated) carries a non-null fill
    assert all(r["interp_value"] is not None for r in out.values())


def test_time_weighted_avg_locf_weighting(spark):
    from datetime import datetime

    rows = [
        # bucket 00: v=10 holds 45 min, v=20 holds the last 15 min
        (1, "a", datetime(2024, 1, 1, 0, 0), 10.0),
        (2, "a", datetime(2024, 1, 1, 0, 45), 20.0),
        # bucket 02 (after a quiet hour): single reading fills its bucket
        (3, "a", datetime(2024, 1, 1, 2, 30), 40.0),
    ]
    df = spark.createDataFrame(
        rows, "reading_id long, device_id string, ts timestamp, value double"
    )
    out = {str(r["bucket_ts"]): r
           for r in temporal.time_weighted_avg(df, bucket="1 hour").collect()}
    b0 = out["2024-01-01 00:00:00"]
    # (10*2700 + 20*900) / 3600 = 12.5 vs plain mean 15 — the time
    # weighting is what differs from AVG on irregular samples
    assert b0["time_weighted_avg"] == 12.5 and b0["plain_avg"] == 15.0
    b2 = out["2024-01-01 02:00:00"]
    assert b2["time_weighted_avg"] == 40.0 and b2["n_readings"] == 1
    assert len(out) == 2  # the quiet bucket 01 emits nothing (w8's job)


def test_counter_delta_detects_resets(spark):
    from datetime import datetime

    rows = [
        (1, "a", datetime(2024, 1, 1, 1, 0), 1.0),
        (2, "a", datetime(2024, 1, 1, 2, 0), 5.0),   # +4
        (3, "a", datetime(2024, 1, 1, 3, 0), 2.0),   # reset -> +2 since restart
        (4, "a", datetime(2024, 1, 1, 4, 0), 7.0),   # +5
        # day 2: first delta bridges days (7 -> 9 = +2)
        (5, "a", datetime(2024, 1, 2, 1, 0), 9.0),
    ]
    df = spark.createDataFrame(
        rows, "reading_id long, device_id string, ts timestamp, value double"
    )
    out = {str(r["bucket_ts"]): r
           for r in temporal.counter_delta(df, bucket="1 day").collect()}
    d1 = out["2024-01-01 00:00:00"]
    assert d1["n_resets"] == 1
    assert d1["counter_increase"] == 4 + 2 + 5
    assert d1["first_value"] == 1.0 and d1["last_value"] == 7.0
    d2 = out["2024-01-02 00:00:00"]
    # the cross-day delta lands in the bucket of the LATER reading
    assert d2["counter_increase"] == 2.0 and d2["n_resets"] == 0


def test_event_transitions_counts_and_probabilities(spark):
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    seq = {"u1": ["view", "click", "view", "click", "purchase"],
           "u2": ["view", "view"]}
    rows = []
    eid = 0
    for u, types in seq.items():
        for i, et in enumerate(types):
            rows.append((eid, u, et, t0 + timedelta(minutes=i)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, user_id string, event_type string, ts timestamp")
    out = {(r["prev_type"], r["next_type"]): r
           for r in temporal.event_transitions(df).collect()}
    # u1: view->click x2, click->view, click->purchase; u2: view->view
    assert out[("view", "click")]["n_transitions"] == 2
    assert out[("view", "view")]["n_transitions"] == 1
    assert out[("click", "view")]["n_transitions"] == 1
    assert out[("click", "purchase")]["n_transitions"] == 1
    assert len(out) == 4
    # P(.|view): click 2/3, view 1/3; P(.|click): 1/2 each
    assert out[("view", "click")]["p_next"] == pytest.approx(2 / 3, abs=1e-6)
    assert out[("click", "purchase")]["p_next"] == 0.5
    from collections import defaultdict
    by_prev = defaultdict(float)
    for (p, _), r in out.items():
        by_prev[p] += r["p_next"]
    assert all(abs(v - 1.0) < 1e-6 for v in by_prev.values())


def test_m4_downsample_roles(spark):
    from datetime import datetime

    rows = [
        (1, "a", datetime(2024, 1, 1, 0, 5), 10.0),
        (2, "a", datetime(2024, 1, 1, 0, 20), 50.0),   # max
        (3, "a", datetime(2024, 1, 1, 0, 40), 2.0),    # min
        (4, "a", datetime(2024, 1, 1, 0, 55), 30.0),   # last
        (5, "a", datetime(2024, 1, 1, 1, 10), 7.0),    # lone point: all 4 roles
    ]
    df = spark.createDataFrame(
        rows, "reading_id long, device_id string, ts timestamp, value double"
    )
    out = {(str(r["bucket_ts"]), r["role"]): r
           for r in temporal.m4_downsample(df, bucket="1 hour").collect()}
    b0 = "2024-01-01 00:00:00"
    assert out[(b0, "first")]["reading_id"] == 1
    assert out[(b0, "last")]["reading_id"] == 4
    assert out[(b0, "min")]["reading_id"] == 3 and out[(b0, "min")]["value"] == 2.0
    assert out[(b0, "max")]["reading_id"] == 2 and out[(b0, "max")]["value"] == 50.0
    b1 = "2024-01-01 01:00:00"
    assert {out[(b1, r)]["reading_id"] for r in ("first", "last", "min", "max")} == {5}
    assert len(out) == 8


def test_lttb_downsample_preserves_shape_points(spark):
    """LTTB invariants: exactly n_out points per large series with the
    endpoints pinned; a planted extreme spike is always kept (it forms
    the largest triangle of its bucket); short series pass through;
    deterministic across reruns."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = []
    # smooth series with one violent spike at i=137
    for i in range(400):
        v = 50.0 + 10.0 * ((i % 20) / 20.0)
        if i == 137:
            v = 500.0
        rows.append(("a", base + timedelta(minutes=i), v))
    # short series: passes through unchanged
    for i in range(5):
        rows.append(("b", base + timedelta(minutes=i), float(i)))
    df = spark.createDataFrame(rows, "device_id string, ts timestamp, value double")
    out = temporal.lttb_downsample(df, n_out=40).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r["device_id"], []).append(r)
    a = sorted(by_key["a"], key=lambda r: r["pt_rank"])
    assert len(a) == 40
    assert a[0]["ts"] == base and a[-1]["ts"] == base + timedelta(minutes=399)
    assert any(r["value"] == 500.0 for r in a)  # spike survives
    assert [r["pt_rank"] for r in a] == list(range(40))
    b = sorted(by_key["b"], key=lambda r: r["pt_rank"])
    assert [r["value"] for r in b] == [0.0, 1.0, 2.0, 3.0, 4.0]
    again = sorted(map(tuple, temporal.lttb_downsample(df, n_out=40).collect()))
    assert again == sorted(map(tuple, out))


def test_lttb_downsample_preserves_key_dtype_and_validates_n_out(spark):
    """r7 ADVICE: the key column keeps its INPUT dtype (the r7 version
    hard-cast it to string, silently rewriting long keys), and
    n_out < 3 raises up front (first/last are pinned, so 2 points
    cannot be a shape-preserving downsample)."""
    from datetime import datetime, timedelta

    base = datetime(2024, 1, 1)
    rows = [(7, base + timedelta(minutes=i), float(i % 9)) for i in range(50)]
    df = spark.createDataFrame(rows, "device_id long, ts timestamp, value double")
    out = temporal.lttb_downsample(df, n_out=10)
    assert dict(out.dtypes)["device_id"] == "bigint"
    got = out.collect()
    assert len(got) == 10 and all(r["device_id"] == 7 for r in got)
    with pytest.raises(ValueError, match="n_out"):
        temporal.lttb_downsample(df, n_out=2)
