"""Analytics builders — the reference's query surface as DataFrame functions.

Each function maps one or more operators from SURVEY.md §2 (OP-F*, OP-A*,
OP-W*, OP-Q*) onto a *canonical readings DataFrame* with columns:

    reading_id   long      (unique row id; events.event_id)
    device_id    any key   (events.user_id)
    device_type  string    (events.event_type)
    ts           timestamp (UTC)
    value        double
    is_anomaly   boolean   (derived by the ingest chain, OP-T7)

These mirror the reference's ``sensor_readings`` hypertable
(database/init.sql:31-77) and its views/functions (init.sql:149-321) and
README analytics queries (README.md:719-922). Builders are pure
DataFrame->DataFrame transforms: Catalyst handles predicate pushdown,
column pruning and partial aggregation; nothing here collects to the
driver except deterministic scalar anchors that are expressed as
broadcast joins (so they stay in-plan).

Scale notes (100 TB):
- Every aggregation keys on (device_id[, bucket]) — high-cardinality,
  well-distributed keys; partial (map-side) aggregation makes shuffles
  proportional to group count, not row count.
- ``last/first(x, ts)`` (TimescaleDB ordered picks, init.sql:163-209)
  map to ``max_by/min_by`` — single-pass hash aggregates, no sort.
- Top-k uses orderBy().limit(), which Spark plans as
  TakeOrderedAndProject (true streaming top-k, never a full sort).
- Window functions partition by device_id: the sort is per-device within
  a shuffle partition; AQE handles skewed devices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numeric import pct, round6
from ..functions.timeutil import micros, minutes_between, time_bucket

# Analogue of the reference's per-channel anomaly thresholds
# (config.py:295-305): on the events stand-in table a reading is
# anomalous when value > 150 (~5% of rows, matching the reference's 5%
# injection rate, config.yaml:133).
EVENTS_ANOMALY_THRESHOLD = 150.0


def with_anomaly_flag(df: DataFrame, threshold: float = EVENTS_ANOMALY_THRESHOLD) -> DataFrame:
    """Derive is_anomaly via threshold detection (OP-T7 on the value channel)."""
    return df.withColumn("is_anomaly", F.col("value") > F.lit(threshold))


def _max_ts_anchor(df: DataFrame) -> DataFrame:
    """Single-row DataFrame holding max(ts), used as a deterministic 'now'.

    The reference's relative-time views use NOW() (init.sql:149-153); for
    reproducible results we anchor to the newest reading instead. The
    anchor is joined in as a broadcast nested-loop join of a 1-row
    aggregate — it stays inside the plan (no driver collect)."""
    return df.agg(F.max("ts").alias("_anchor_ts"))


def recent_readings(df: DataFrame, hours: int = 24) -> DataFrame:
    """OP-F1: readings within the trailing window (recent_sensor_readings view,
    init.sql:149-153), anchored at max(ts)."""
    anchored = df.join(F.broadcast(_max_ts_anchor(df)))
    return (
        anchored.where(F.col("ts") >= F.col("_anchor_ts") - F.expr(f"INTERVAL {hours} HOURS"))
        .select("reading_id", "device_id", "device_type", "ts", "value")
    )


def filter_by_type(df: DataFrame, types: list[str], min_value: float | None = None) -> DataFrame:
    """OP-F2: equality/IN filters (database.py:361-369)."""
    out = df.where(F.col("device_type").isin(types))
    if min_value is not None:
        out = out.where(F.col("value") > F.lit(min_value))
    return out.select("reading_id", "device_id", "device_type", "ts", "value")


def readings_between(df: DataFrame, start: str, end: str) -> DataFrame:
    """OP-F4: BETWEEN date range (README.md:747-755)."""
    return df.where(F.col("ts").between(F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp"))).select(
        "reading_id", "device_id", "device_type", "ts", "value"
    )


def anomalous_readings(df: DataFrame) -> DataFrame:
    """OP-F3: boolean-flag filter (anomalous_sensor_readings view, init.sql:156-160)."""
    return df.where(F.col("is_anomaly")).select("reading_id", "device_id", "device_type", "ts", "value")


def integrity_report(df: DataFrame, value_lo: float = 0.0, value_hi: float = 500.0) -> DataFrame:
    """OP-F5: data-integrity invariant counts (database_utils.py:329-415).

    One row: null/empty ids, future timestamps (vs max-ts anchor),
    out-of-range values, duplicate (device_id, ts) pairs."""
    anchored = df.join(F.broadcast(_max_ts_anchor(df)))
    dup_rows = (
        df.groupBy("device_id", "ts")
        .agg(F.count(F.lit(1)).alias("n"))
        .where(F.col("n") > 1)
        .agg(F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("duplicate_rows"))
    )
    base = anchored.agg(
        F.count(F.when(F.col("device_id").isNull(), 1)).alias("null_device_count"),
        F.count(F.when(F.col("ts") > F.col("_anchor_ts"), 1)).alias("future_ts_count"),
        F.count(F.when(~F.col("value").between(value_lo, value_hi), 1)).alias("out_of_range_count"),
    )
    return base.join(F.broadcast(dup_rows))


def metadata_lookup(df: DataFrame, key: str = "k", min_value: int = 50) -> DataFrame:
    """OP-F6: metadata/JSON field lookup (consumer.py:385-389).

    The canonical table carries metadata as a JSON string column `props`
    (events stand-in for the JSONB device_metadata column). try_cast:
    real metadata holds non-numeric values, and an ANSI cast would
    abort the whole scan on the first one (r12 events edge sweep) —
    non-numeric lookups are NULL and fail the threshold, same as the
    indexed twin's try_cast."""
    k = (
        F.get_json_object(F.col("props"), f"$.{key}")
        .try_cast("int")
        .alias("meta_value")
    )
    return (
        df.select("reading_id", "device_id", k)
        .where(F.col("meta_value") >= F.lit(min_value))
    )


def latest_readings(df: DataFrame, n: int = 100) -> DataFrame:
    """OP-Q1: ORDER BY ts DESC LIMIT n — planned as TakeOrderedAndProject
    (true top-k; no global sort materialization)."""
    return (
        df.select("reading_id", "device_id", "device_type", "ts", "value")
        .orderBy(F.desc("ts"), F.desc("reading_id"))
        .limit(n)
    )


# ---------------------------------------------------------------------------
# Aggregations (OP-A1..A11)
# ---------------------------------------------------------------------------

def _last_by(value, ts):
    """DuckDB arg_max(x, ts) semantics (the oracle contract this repo
    actually verifies against, pinned by the events edge-parity test):
    value at the max ts AMONG ROWS WHERE x IS NOT NULL. The reference's
    TimescaleDB last(x, ts) is the *source* of the operator but does
    NOT reliably skip NULL values, so the null-skipping claim is scoped
    to the arg_max oracle, not to SQL engines at large. Plain max_by(x, ts)
    RESPECTS a NULL at the max ts and hash-diverges from the oracles
    the moment a null-valued reading exists (found by the events edge
    fixture; the driver generator emits no null values, so sf parity
    never saw it). Nulling the ORDER key for null values makes max_by
    skip those rows (max ignores null keys); all-null groups stay NULL
    on both engines."""
    v, t = F.col(value), F.col(ts)
    return F.max_by(value, F.when(v.isNotNull(), t))


def _first_by(value, ts):
    """arg_min twin of _last_by (same null-skipping contract)."""
    v, t = F.col(value), F.col(ts)
    return F.min_by(value, F.when(v.isNotNull(), t))


def device_summary(df: DataFrame) -> DataFrame:
    """OP-A1: per-device lifetime aggregate (device_summary view, init.sql:163-176).

    TimescaleDB last(x, ts) -> null-skipping max_by (_last_by): one-pass
    hash aggregate."""
    return df.groupBy("device_id", "device_type").agg(
        F.count(F.lit(1)).alias("reading_count"),
        F.min("ts").alias("first_reading"),
        F.max("ts").alias("last_reading"),
        round6(F.avg("value")).alias("avg_value"),
        _last_by("value", "ts").alias("last_value"),
        F.count(F.when(F.col("is_anomaly"), 1)).alias("anomaly_count"),
    )


def bucket_aggregates(
    df: DataFrame,
    bucket: str = "1 hour",
    by_device: bool = True,
    with_first: bool = False,
) -> DataFrame:
    """OP-A2/A3/A5/A11: tumbling time-bucket aggregates
    (hourly/daily views init.sql:179-209; continuous aggregates :324-368;
    parameterized get_device_timeseries_stats :293-321).

    Bucket label = epoch-aligned bucket start (time_bucket parity)."""
    keys = [time_bucket("ts", bucket).alias("bucket")]
    if by_device:
        keys += [F.col("device_id"), F.col("device_type")]
    else:
        keys += [F.col("device_type")]
    aggs = [
        F.count(F.lit(1)).alias("reading_count"),
        round6(F.avg("value")).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count(F.when(F.col("is_anomaly"), 1)).alias("anomaly_count"),
        _last_by("value", "ts").alias("last_value"),
    ]
    if with_first:
        aggs.append(_first_by("value", "ts").alias("first_value"))
    return df.groupBy(*keys).agg(*aggs)


def device_stats(df: DataFrame, device_id=None) -> DataFrame:
    """OP-A4: get_device_stats table function (init.sql:261-290) with
    anomaly_percentage."""
    src = df if device_id is None else df.where(F.col("device_id") == F.lit(device_id))
    n = F.count(F.lit(1))
    anom = F.count(F.when(F.col("is_anomaly"), 1))
    return src.groupBy("device_id").agg(
        n.alias("reading_count"),
        F.min("ts").alias("first_reading"),
        F.max("ts").alias("last_reading"),
        round6(F.avg("value")).alias("avg_value"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        anom.alias("anomaly_count"),
        round6(pct(anom, n)).alias("anomaly_pct"),
    )


def timeseries_stats(df: DataFrame, device_id, bucket: str = "15 minutes") -> DataFrame:
    """OP-A5: get_device_timeseries_stats (init.sql:293-321) — parameterized
    bucket width for one device. The device filter prunes before the
    aggregate (predicate pushdown to the parquet scan)."""
    return (
        df.where(F.col("device_id") == F.lit(device_id))
        .groupBy(time_bucket("ts", bucket).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("reading_count"),
            round6(F.avg("value")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def table_stats(df: DataFrame) -> DataFrame:
    """OP-A6: whole-table stats (database_utils.py:133-147).

    Exact countDistinct here (oracle-checked); at 100 TB swap in
    approx_count_distinct — see table_stats_approx."""
    return df.agg(
        F.count(F.lit(1)).alias("total_readings"),
        F.countDistinct("device_id").alias("distinct_devices"),
        F.countDistinct("device_type").alias("distinct_types"),
        F.min("ts").alias("first_reading"),
        F.max("ts").alias("last_reading"),
        F.count(F.when(F.col("is_anomaly"), 1)).alias("anomaly_count"),
        round6(F.avg("value")).alias("avg_value"),
    )


def table_stats_approx(df: DataFrame, rsd: float = 0.01) -> DataFrame:
    """100 TB-scale variant of OP-A6: HLL sketches instead of exact
    distinct (single pass, no per-key state explosion)."""
    return df.agg(
        F.count(F.lit(1)).alias("total_readings"),
        F.approx_count_distinct("device_id", rsd).alias("distinct_devices"),
        F.approx_count_distinct("device_type", rsd).alias("distinct_types"),
        F.min("ts").alias("first_reading"),
        F.max("ts").alias("last_reading"),
    )


def type_distribution(df: DataFrame, days: int = 7) -> DataFrame:
    """OP-A7: recent per-type distribution (database_utils.py:167-181),
    anchored at max(ts)."""
    anchored = df.join(F.broadcast(_max_ts_anchor(df)))
    return (
        anchored.where(F.col("ts") >= F.col("_anchor_ts") - F.expr(f"INTERVAL {days} DAYS"))
        .groupBy("device_type")
        .agg(
            F.count(F.lit(1)).alias("reading_count"),
            round6(F.avg("value")).alias("avg_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


def duplicate_report(df: DataFrame) -> DataFrame:
    """OP-A8: duplicate (device_id, ts) detection (database_utils.py:382-395).
    Returns one row: number of duplicated groups and total surplus rows."""
    groups = df.groupBy("device_id", "ts").agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)
    return groups.agg(
        F.count(F.lit(1)).alias("dup_groups"),
        F.coalesce(F.sum(F.col("n") - 1), F.lit(0)).cast("long").alias("surplus_rows"),
    )


def daily_quality_report(df: DataFrame) -> DataFrame:
    """OP-A9: daily data-quality report (README.md:777-792) — stddev,
    exact interpolated median/p95 (PERCENTILE_CONT parity via Spark's
    exact `percentile`, not percentile_approx; SURVEY §7(c))."""
    n = F.count(F.lit(1))
    anom = F.count(F.when(F.col("is_anomaly"), 1))
    # both quantiles from ONE percentile aggregate: two separate calls
    # each buffer + sort the group's values; the array form pays that
    # once (measured ~1.3x on the whole query at sf0.1)
    pcts = F.percentile("value", F.array(F.lit(0.5), F.lit(0.95)))
    # r16 measured NEGATIVE, reverted: fanning the readings ahead of
    # this aggregation (the exact percentile's partial buffering ran
    # 0.42 s on one local scan task) A/B'd 1.04 -> 1.21 s — the fan
    # exchange carries every raw reading row, which costs more than
    # the parallel buffering saves. The scan-stage combine stays.
    return (
        df.groupBy(time_bucket("ts", "1 day").alias("bucket"), F.col("device_type"))
        .agg(
            F.countDistinct("device_id").alias("distinct_devices"),
            n.alias("reading_count"),
            round6(F.avg("value")).alias("avg_value"),
            round6(F.stddev_samp("value")).alias("stddev_value"),
            pcts.alias("_pcts"),
            round6(pct(anom, n)).alias("anomaly_pct"),
        )
        .withColumn("median_value", round6(F.col("_pcts")[0]))
        .withColumn("p95_value", round6(F.col("_pcts")[1]))
        .drop("_pcts")
        .select(
            "bucket",
            "device_type",
            "distinct_devices",
            "reading_count",
            "avg_value",
            "stddev_value",
            "median_value",
            "p95_value",
            "anomaly_pct",
        )
    )


def value_histogram(
    df: DataFrame,
    lo: float = 0.0,
    hi: float = 200.0,
    nbuckets: int = 10,
    key_col: str = "device_type",
    value_col: str = "value",
) -> DataFrame:
    """Fixed-range value histogram per key — TimescaleDB's
    `histogram(value, min, max, nbuckets)` aggregate (the toolkit
    function a Grafana value-distribution panel calls on
    sensor_readings), as rows instead of an array: one row per
    (key, bucket) with the bucket's bounds and count. Underflow lands
    in bucket 0, overflow in bucket nbuckets+1 — Timescale's nbuckets+2
    slot convention — so no value is silently dropped.

    Bucketing is plain arithmetic (floor((v-lo)/width) clamped), not a
    width_bucket builtin, so any SQL oracle computes the identical
    bucket ids; one map-side-combined aggregate, one scan, and the
    empty-bucket rows are deliberately absent (the chart layer zeros
    gaps; emitting them would need a keys x buckets grid join for rows
    that carry no information)."""
    width = (hi - lo) / nbuckets
    b = (
        F.least(
            F.greatest(
                F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)), F.lit(-1.0)
            ),
            F.lit(float(nbuckets)),
        ).cast("int")
        + 1
    )
    return (
        df.select(F.col(key_col), b.alias("bucket"), F.col(value_col))
        .groupBy(key_col, "bucket")
        .agg(F.count(F.lit(1)).alias("n_values"))
        .select(
            key_col,
            "bucket",
            F.when(F.col("bucket") == 0, F.lit(None).cast("double"))
            .otherwise(F.lit(lo) + (F.col("bucket") - 1) * F.lit(width))
            .alias("bucket_lo"),
            F.when(F.col("bucket") == nbuckets + 1, F.lit(None).cast("double"))
            .otherwise(F.lit(lo) + F.col("bucket") * F.lit(width))
            .alias("bucket_hi"),
            "n_values",
        )
    )


def trend_slope(
    df: DataFrame,
    bucket: str = "1 day",
    key_col: str = "device_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-(key, bucket) OLS trend — TimescaleDB's stats_agg /
    regr_slope surface (the "is this sensor drifting?" query an IoT
    fleet runs nightly): slope of value over time in units/hour,
    intercept at the bucket start, and R² for fit quality. Buckets
    with a single reading (or zero time variance) report NULL slope —
    a vertical fit, exactly what SQL's regr_slope returns.

    The moments are EXACT integers — x in microseconds since the
    bucket start (unix_timestamp would truncate sub-second parts that
    skew the slope at the 4th significant digit, measured), y in
    integer cents (the engine's exact-money convention,
    functions/numeric) — summed as DECIMAL(38,0), so every engine
    produces bit-identical sums regardless of partition order and the
    final statistics are single divisions of identical integers.
    Builtin regr_slope was measured flipping 6-decimal rounding by one
    ulp on 2-point groups purely from float summation order. One
    map-side-combined aggregate, one scan."""
    b = time_bucket(ts_col, bucket)
    x = F.unix_micros(F.col(ts_col)) - F.unix_micros(b)
    y = F.round(F.col(value_col) * 100).cast("long")
    d = lambda c: c.cast("decimal(19,0)")
    g = (
        df.select(F.col(key_col), b.alias("bucket"), x.alias("_x"), y.alias("_y"))
        .groupBy(key_col, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(d(F.col("_x"))).alias("sx"),
            F.sum(d(F.col("_y"))).alias("sy"),
            F.sum(d(F.col("_x")) * d(F.col("_y"))).alias("sxy"),
            F.sum(d(F.col("_x")) * d(F.col("_x"))).alias("sxx"),
            F.sum(d(F.col("_y")) * d(F.col("_y"))).alias("syy"),
        )
    )
    n = F.col("n").cast("decimal(38,0)")
    cov_n = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    varx_n = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    vary_n = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    slope_cents_per_us = cov_n / F.nullif(varx_n, F.lit(0.0))
    # cents/us -> units/hour: /100 cents, x 3.6e9 us
    slope_hr = slope_cents_per_us * F.lit(3.6e7)
    intercept = (
        F.col("sy").cast("double") - slope_cents_per_us * F.col("sx").cast("double")
    ) / F.col("n").cast("double") / F.lit(100.0)
    r2 = (cov_n * cov_n) / F.nullif(varx_n * vary_n, F.lit(0.0))
    return g.select(
        key_col,
        "bucket",
        F.col("n").alias("n_readings"),
        round6(slope_hr).alias("slope_per_hour"),
        round6(intercept).alias("intercept"),
        round6(r2).alias("r2"),
    )


def daily_quality_report_approx(df: DataFrame, accuracy: int = 10000) -> DataFrame:
    """OP-A9 scale variant: approx_percentile + approx_count_distinct.

    Exact interpolated percentiles buffer and sort every group's values
    (memory O(group size)); at 100 TB the t-digest-style sketch keeps
    state bounded at `accuracy` centroids and distinct counting switches
    to HyperLogLog. Same shape as daily_quality_report; values differ
    within sketch error, so this variant is benched, not oracle-checked."""
    n = F.count(F.lit(1))
    anom = F.count(F.when(F.col("is_anomaly"), 1))
    return df.groupBy(time_bucket("ts", "1 day").alias("bucket"), F.col("device_type")).agg(
        F.approx_count_distinct("device_id").alias("distinct_devices"),
        n.alias("reading_count"),
        round6(F.avg("value")).alias("avg_value"),
        round6(F.stddev_samp("value")).alias("stddev_value"),
        round6(F.percentile_approx("value", 0.5, accuracy)).alias("median_value"),
        round6(F.percentile_approx("value", 0.95, accuracy)).alias("p95_value"),
        round6(pct(anom, n)).alias("anomaly_pct"),
    )


def realtime_monitor(df: DataFrame, bucket: str = "15 minutes", hours: int = 24) -> DataFrame:
    """OP-A10: 15-min real-time monitor (README.md:794-806), anchored at
    max(ts)."""
    anchored = df.join(F.broadcast(_max_ts_anchor(df)))
    return (
        anchored.where(F.col("ts") >= F.col("_anchor_ts") - F.expr(f"INTERVAL {hours} HOURS"))
        .groupBy(time_bucket("ts", bucket).alias("bucket"), F.col("device_id"))
        .agg(
            round6(F.avg("value")).alias("avg_value"),
            _last_by("value", "ts").alias("last_value"),
            F.max("ts").alias("last_reading"),
        )
    )


# ---------------------------------------------------------------------------
# Window analytics (OP-W1..W3)
# ---------------------------------------------------------------------------

def _device_ts_window():
    # reading_id tiebreak: two readings CAN share a timestamp (burst
    # ingestion, duplicate delivery) and a ts-only ordering leaves
    # lag/avg frames UNDERDETERMINED — cross-engine parity then holds
    # only by luck of partition order (found by the r12 events edge
    # sweep; the w7/w8 family already ordered this way)
    return Window.partitionBy("device_id").orderBy("ts", "reading_id")


def gap_detection(df: DataFrame, min_gap_minutes: float = 30.0) -> DataFrame:
    """OP-W1: per-device reading-gap detection (README.md:813-831).

    gap = ts - lag(ts) per device; keep gaps > threshold. Exact integer
    microsecond arithmetic then one division — deterministic without
    rounding (rounding would introduce half-microsecond ties)."""
    w = _device_ts_window()
    out = df.select(
        "device_id",
        F.lag("ts").over(w).alias("prev_ts"),
        F.col("ts"),
    ).withColumn("gap_minutes", minutes_between("ts", "prev_ts"))
    return out.where(F.col("gap_minutes") > F.lit(min_gap_minutes))


def moving_average(df: DataFrame, frame: int = 11) -> DataFrame:
    """OP-W2: 12-reading moving average + delta-from-previous
    (README.md:834-850). ROWS frame (-11, 0) per device."""
    w = _device_ts_window()
    return df.select(
        "reading_id",
        "device_id",
        "ts",
        "value",
        round6(F.avg("value").over(w.rowsBetween(-frame, 0))).alias("moving_avg"),
        round6(F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


def rate_of_change(df: DataFrame) -> DataFrame:
    """OP-W3: per-device rate of change per hour (README.md:853-865)."""
    w = _device_ts_window()
    prev_v = F.lag("value").over(w)
    dt_s = (micros("ts") - F.lag(micros("ts")).over(w)).cast("double") / F.lit(1000000.0)
    # try_divide: two readings at the SAME timestamp have dt = 0 and no
    # defined rate — an ANSI plain division ABORTS the whole job on one
    # burst-duplicated row (r12 events edge sweep; DuckDB's NaN answer
    # is no better, it poisons downstream aggregates). NULL -> the row
    # drops with the leading-edge rows below.
    return (
        df.select(
            "reading_id",
            "device_id",
            "ts",
            "value",
            (F.try_divide(F.col("value") - prev_v, dt_s) * F.lit(3600.0)).alias(
                "rate_per_hour"
            ),
        )
        .where(F.col("rate_per_hour").isNotNull())
    )


def export_readings(
    df: DataFrame,
    device_id=None,
    start: str | None = None,
    end: str | None = None,
    limit: int = 1000,
) -> DataFrame:
    """OP-S7: parameterized export (database_utils.py:251-307) — dynamic
    filters + newest-first top-k."""
    out = df
    if device_id is not None:
        out = out.where(F.col("device_id") == F.lit(device_id))
    if start is not None:
        out = out.where(F.col("ts") >= F.lit(start).cast("timestamp"))
    if end is not None:
        out = out.where(F.col("ts") <= F.lit(end).cast("timestamp"))
    return (
        out.select("reading_id", "device_id", "device_type", "ts", "value")
        .orderBy(F.desc("ts"), F.desc("reading_id"))
        .limit(limit)
    )


def rollup_cascade(
    df: DataFrame,
    fine_bucket: str = "1 hour",
    coarse_bucket: str = "1 day",
) -> DataFrame:
    """Hierarchical continuous aggregate: the coarse rollup derives
    ENTIRELY from the fine level's re-aggregable partials — the
    TimescaleDB hierarchical-cagg design (daily cagg ON the hourly
    cagg), and the 100 TB reason continuous aggregates exist at all:
    day-level queries read hours-per-day × devices rows, never raw.

    The fine partial carries (count, sum, min, max, anomaly_count) plus
    (first/last value, first/last ts) pairs so every coarse statistic —
    including avg and the time-ordered first/last picks — reassembles
    exactly: output is value-identical to aggregating raw directly at
    the coarse width (oracle-checked), because sum/min/max/count are
    associative and a coarse-bucket extremum timestamp lives in exactly
    one fine bucket. The value sum is carried as exact integer cents
    (the 2-dp source doubles recover exactly; see functions/numeric) so
    the two-level association CANNOT drift from the direct aggregate —
    double summation is order-sensitive at the 1e-6 rounding boundary,
    measured on this very query. Raw rows are touched once; the coarse
    aggregate's input is the fine frame."""
    return rollup_finalize(rollup_partials(df, fine_bucket), coarse_bucket)


def rollup_partials(df: DataFrame, fine_bucket: str = "1 hour") -> DataFrame:
    """The fine-level RE-AGGREGABLE partial frame of rollup_cascade —
    split out so an incremental refresh (maintenance.
    refresh_rollup_cascade) can persist it per date partition and
    rebuild only dirty days. Carries everything the coarse level needs
    to reassemble exactly: count, exact integer-cent sum, min/max,
    anomaly count, and time-ordered (first/last value, ts) pairs."""
    cents = F.round(F.col("value") * 100).cast("long")
    return df.groupBy(
        time_bucket("ts", fine_bucket).alias("bucket"), F.col("device_type")
    ).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(cents).alias("_sum"),
        F.min("value").alias("_min"),
        F.max("value").alias("_max"),
        F.count(F.when(F.col("is_anomaly"), 1)).alias("_anom"),
        # ts of the first/last NON-NULL value (not plain min/max ts):
        # the finalize max_by then skips all-null fine buckets, keeping
        # the cascade's last_value == arg_max end to end
        _first_by("value", "ts").alias("_first_v"),
        F.min(F.when(F.col("value").isNotNull(), F.col("ts"))).alias("_first_ts"),
        _last_by("value", "ts").alias("_last_v"),
        F.max(F.when(F.col("value").isNotNull(), F.col("ts"))).alias("_last_ts"),
    )


def rollup_finalize(partial: DataFrame, coarse_bucket: str = "1 day") -> DataFrame:
    """Coarse statistics from rollup_partials' frame — value-identical
    to aggregating raw at the coarse width (see rollup_cascade)."""
    return partial.groupBy(
        time_bucket("bucket", coarse_bucket).alias("bucket"), F.col("device_type")
    ).agg(
        F.sum("_n").alias("reading_count"),
        round6(F.sum("_sum").cast("double") / 100.0 / F.sum("_n")).alias("avg_value"),
        F.min("_min").alias("min_value"),
        F.max("_max").alias("max_value"),
        F.sum("_anom").alias("anomaly_count"),
        F.max_by("_last_v", "_last_ts").alias("last_value"),
        F.min_by("_first_v", "_first_ts").alias("first_value"),
    )
