"""alert_eval / throughput / anomaly_rate semantics on synthetic series."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from metrocloud_data_pipeline_spark.operators import observability as OBS


def _buckets(spark, rows):
    return spark.createDataFrame(rows, "series string, bucket timestamp, value double")


def test_alert_fires_only_after_for_duration(spark):
    h = lambda i: datetime(2024, 1, 1, i)
    rows = [
        ("s", h(0), 5.0),   # below
        ("s", h(1), 20.0),  # cond true, run=1 -> pending, not firing
        ("s", h(2), 25.0),  # cond true, run=2 -> FIRING
        ("s", h(3), 30.0),  # cond true, run=3 -> FIRING
        ("s", h(4), 1.0),   # below -> resolved
    ]
    out = OBS.alert_eval(
        _buckets(spark, rows), F.col("value") > 10.0, width="1 hour",
        for_buckets=2, key_cols=("series",),
    ).orderBy("bucket").collect()
    assert [r["firing"] for r in out] == [False, False, True, True, False]
    assert [r["condition_met"] for r in out] == [False, True, True, True, False]


def test_alert_gap_resets_for_window(spark):
    # condition true at 01:00 and 03:00 but 02:00 is MISSING: the gap
    # breaks contiguity, so nothing fires with for_buckets=2
    h = lambda i: datetime(2024, 1, 1, i)
    rows = [("s", h(1), 20.0), ("s", h(3), 25.0)]
    out = OBS.alert_eval(
        _buckets(spark, rows), F.col("value") > 10.0, width="1 hour",
        for_buckets=2, key_cols=("series",),
    ).collect()
    assert all(not r["firing"] for r in out)


def test_alert_for_one_bucket_fires_immediately(spark):
    rows = [("s", datetime(2024, 1, 1, 0), 20.0)]
    out = OBS.alert_eval(
        _buckets(spark, rows), F.col("value") > 10.0, width="1 hour",
        for_buckets=1, key_cols=("series",),
    ).collect()
    assert out[0]["firing"] is True


def test_alert_series_are_independent(spark):
    # two series interleaved: runs are evaluated per series
    h = lambda i: datetime(2024, 1, 1, i)
    rows = [
        ("a", h(0), 20.0), ("a", h(1), 20.0),   # a fires at h1
        ("b", h(0), 20.0), ("b", h(1), 5.0),    # b never fires
    ]
    out = OBS.alert_eval(
        _buckets(spark, rows), F.col("value") > 10.0, width="1 hour",
        for_buckets=2, key_cols=("series",),
    ).collect()
    got = {(r["series"], r["bucket"].hour): r["firing"] for r in out}
    assert got == {("a", 0): False, ("a", 1): True, ("b", 0): False, ("b", 1): False}


def test_alert_eval_rejects_bad_for(spark):
    with pytest.raises(ValueError):
        OBS.alert_eval(_buckets(spark, []), F.lit(True), width="1 hour", for_buckets=0)


def test_throughput_rate_math(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 30), "click"),
        (2, datetime(2024, 1, 1, 0, 2, 0), "click"),
        (3, datetime(2024, 1, 1, 0, 7, 0), "click"),
        (4, datetime(2024, 1, 1, 0, 0, 0), "view"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts timestamp, event_type string")
    out = {
        (r["series"], r["bucket"].minute): (r["n_messages"], r["rate_per_sec"])
        for r in OBS.throughput(ev, width="5 minutes").collect()
    }
    assert out[("click", 0)] == (2, round(2 / 300.0, 6))
    assert out[("click", 5)] == (1, round(1 / 300.0, 6))
    assert out[("view", 0)] == (1, round(1 / 300.0, 6))


def _model_alert_eval(buckets, for_buckets, width_sec=3600):
    """Pure-Python reference: (epoch_hours, cond) -> firing list."""
    out = []
    run, last = 0, None
    for epoch, cond in buckets:
        contiguous = last is not None and epoch == last + width_sec
        run = (run + 1 if contiguous else 1) if cond else 0
        out.append(cond and run >= for_buckets)
        last = epoch
    return out


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@given(
    pattern=st.lists(
        st.tuples(st.booleans(), st.booleans()), min_size=1, max_size=12
    ),
    for_buckets=st.integers(min_value=1, max_value=4),
)
@settings(max_examples=12, deadline=None)
def test_alert_eval_matches_python_model(spark, pattern, for_buckets):
    # pattern: (condition, skip-next-bucket?) pairs -> a series with gaps
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    rows, epochs, hour = [], [], 0
    for cond, gap in pattern:
        rows.append(("s", t0 + timedelta(hours=hour), 20.0 if cond else 1.0))
        epochs.append((hour * 3600, cond))
        hour += 2 if gap else 1
    df = spark.createDataFrame(rows, "series string, bucket timestamp, value double")
    got = [
        r["firing"]
        for r in OBS.alert_eval(
            df, F.col("value") > 10.0, width="1 hour",
            for_buckets=for_buckets, key_cols=("series",),
        ).orderBy("bucket").collect()
    ]
    assert got == _model_alert_eval(epochs, for_buckets)


def test_anomaly_rate_pct(spark):
    rows = [
        (1, datetime(2024, 1, 1, 0, 10), True),
        (2, datetime(2024, 1, 1, 0, 20), False),
        (3, datetime(2024, 1, 1, 0, 30), False),
        (4, datetime(2024, 1, 1, 1, 10), False),
    ]
    df = spark.createDataFrame(rows, "id long, ts timestamp, is_anomaly boolean")
    out = {r["bucket"].hour: r for r in OBS.anomaly_rate(df, width="1 hour").collect()}
    assert out[0]["n_readings"] == 3 and out[0]["n_anomalies"] == 1
    assert out[0]["anomaly_rate_pct"] == round(100.0 / 3, 6)
    assert out[1]["anomaly_rate_pct"] == 0.0


def test_alert_eval_rejects_multi_series_without_key_cols(spark):
    # two series share bucket values: without key_cols the window would
    # silently mix them — the duplicate-bucket probe must fail the job
    h = lambda i: datetime(2024, 1, 1, i)
    rows = [("a", h(0), 20.0), ("b", h(0), 20.0), ("a", h(1), 20.0)]
    with pytest.raises(Exception, match="duplicate bucket"):
        OBS.alert_eval(
            _buckets(spark, rows), F.col("value") > 10.0, width="1 hour",
            for_buckets=2,
        ).collect()
    # the same frame with key_cols named is fine
    out = OBS.alert_eval(
        _buckets(spark, rows), F.col("value") > 10.0, width="1 hour",
        for_buckets=2, key_cols=("series",),
    ).collect()
    assert len(out) == 3


def test_hot_keys_flags_planted_heavy_hitter(spark):
    from metrocloud_data_pipeline_spark.operators import observability as OBS

    rows = [(i, "hot") for i in range(200)] + [(500 + j, f"cold{j}") for j in range(10)]
    df = spark.createDataFrame(rows, "row_id long, k string")
    out = {r["key"]: r for r in OBS.hot_keys(df, "k", top_k=5).collect()}
    hot = out["hot"]
    assert hot["rank"] == 1 and hot["n_rows"] == 200
    assert hot["is_skewed"] is True  # 200 > 10x the (210/11)-row mean
    assert all(r["is_skewed"] is False for k, r in out.items() if k != "hot")
    assert len(out) == 5  # top_k honored


def test_hot_keys_and_length_histogram_match_duckdb(spark):
    """In-process oracle twins (the queries enter the driver window next
    round): same rows on both engines at sf0.001."""
    import duckdb

    from metrocloud_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("events", "documents"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    for name, order in (("obs_hot_keys", "rank"), ("text_length_histogram", "bin")):
        got = SPARK_QUERIES[name](spark, sf).orderBy(order).toPandas()
        want = con.execute(ORACLE_SQL[name] + f" ORDER BY {order}").df()
        assert got.columns.tolist() == want.columns.tolist(), name
        for c in got.columns:
            assert got[c].tolist() == want[c].tolist(), (name, c)


def test_hot_keys_approx_finds_planted_hitter(spark):
    from metrocloud_data_pipeline_spark.operators import observability as OBS

    rows = [(i, "hot") for i in range(500)] + [(1000 + j, f"c{j % 40}") for j in range(100)]
    df = spark.createDataFrame(rows, "row_id long, k string")
    got = {r["key"] for r in OBS.hot_keys_approx(df, "k", support=0.5).collect()}
    # no false negatives above support: the 83%-frequency key MUST appear
    assert "hot" in got
