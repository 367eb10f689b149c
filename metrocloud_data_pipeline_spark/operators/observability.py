"""Observability operators — the reference's dashboard/alert surface as
queryable aggregates (SURVEY.md §2.12).

The reference exposes pipeline health through Prometheus counters
(src/utils/metrics.py:41-165) scraped into Grafana panels
(monitoring/grafana/dashboards/iot-pipeline.json — e.g.
``rate(iot_messages_processed_total[5m])``, anomaly-rate%) and alert
rules with FOR-duration semantics
(monitoring/prometheus/rules/alert_rules.yml:1-145). Here the same
signals are derived from the data itself, as one-scan bucket
aggregates any SQL client can query:

- throughput: messages per tumbling bucket per series -> rate/sec
  (the PromQL ``rate(...[5m])`` panel shape).
- anomaly_rate: per-bucket anomaly percentage (the dashboard's
  anomaly-rate% panel, derived from the OP-T7 flag).
- alert_eval: Prometheus ``expr ... for: <duration>`` evaluation over
  bucketed series — an alert FIRES at bucket t when its condition held
  at t and the preceding N-1 CONTIGUOUS buckets. One analytic window
  (count-of-trues over the trailing N rows + a lag-based contiguity
  probe), so evaluation is a single shuffle keyed by series.

At 100 TB these are scan -> partial agg -> tiny-key shuffle plans: the
bucket/series key space is hours x series, orders of magnitude smaller
than the input, and the alert window runs over the aggregated buckets,
never the raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import round6
from ..functions.timeutil import bucket_seconds, time_bucket


def throughput(
    events: DataFrame,
    width: str = "5 minutes",
    series_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Messages per tumbling bucket per series + per-second rate — the
    ``rate(iot_messages_processed_total[5m])`` Grafana panel, computed
    from the event stream instead of a scraped counter."""
    w = bucket_seconds(width)
    return events.groupBy(
        time_bucket(ts_col, width).alias("bucket"), F.col(series_col).alias("series")
    ).agg(
        F.count(F.lit(1)).alias("n_messages"),
        round6(F.count(F.lit(1)).cast("double") / F.lit(float(w))).alias("rate_per_sec"),
    )


def anomaly_rate(
    readings: DataFrame,
    width: str = "1 hour",
    flag_col: str = "is_anomaly",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-bucket anomaly percentage (the dashboard's anomaly-rate%
    panel; numerator is the OP-T7 threshold flag)."""
    return readings.groupBy(time_bucket(ts_col, width).alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.count_if(F.col(flag_col)).alias("n_anomalies"),
        round6(
            F.count_if(F.col(flag_col)).cast("double") * 100.0 / F.count(F.lit(1))
        ).alias("anomaly_rate_pct"),
    )


def alert_eval(
    bucketed: DataFrame,
    condition: Column,
    width: str,
    for_buckets: int = 1,
    bucket_col: str = "bucket",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Prometheus alert-rule evaluation (``expr`` + ``for:``) over a
    bucketed series: a row is FIRING when `condition` holds at its
    bucket and at the `for_buckets - 1` immediately preceding CONTIGUOUS
    buckets of the same series. A gap in the series (an empty bucket was
    never emitted) resets the run, matching Prometheus' behavior when a
    series disappears mid-`for` window.

    Returns the input plus `condition_met` and `firing`. One analytic
    pass: trailing count-of-trues + a lag(N-1) contiguity probe share
    the same (keys, bucket) sort, so Catalyst plans a single exchange.

    Guard: a duplicate bucket inside one window partition means the
    caller passed a multi-series frame without naming its series in
    `key_cols` — the trailing counts would silently mix series. Dupes
    are ADJACENT under the window's own sort, so a lag-1 probe detects
    them with no extra exchange and fails the job loudly (raise_error)
    instead of returning wrong firing decisions.
    """
    if for_buckets < 1:
        raise ValueError(f"for_buckets must be >= 1, got {for_buckets}")
    w = Window.partitionBy(*key_cols).orderBy(bucket_col)
    sec = bucket_seconds(width)
    dup = F.coalesce(F.lag(bucket_col, 1).over(w) == F.col(bucket_col), F.lit(False))
    # evaluated via when() on the SAME projection as condition_met, so it
    # cannot be short-circuited or pruned away
    met = F.when(
        dup,
        F.raise_error(
            F.format_string(
                "alert_eval: duplicate bucket %s within one window partition "
                f"(key_cols={key_cols!r}) — pass the frame's series columns "
                "as key_cols",
                F.col(bucket_col).cast("string"),
            )
        ).cast("boolean"),
    ).otherwise(condition.cast("boolean"))
    out = bucketed.withColumn("condition_met", met)
    trail = F.count_if(F.col("condition_met")).over(
        w.rowsBetween(-(for_buckets - 1), Window.currentRow)
    )
    contiguous = (
        F.lag(bucket_col, for_buckets - 1).over(w)
        == F.col(bucket_col) - F.expr(f"INTERVAL {sec * (for_buckets - 1)} SECONDS")
    )
    firing = F.col("condition_met") & (trail == for_buckets)
    if for_buckets > 1:
        firing = firing & F.coalesce(contiguous, F.lit(False))
    return out.withColumn("firing", firing)


def hot_keys(
    df: DataFrame,
    key_col: str,
    top_k: int = 20,
    skew_factor: float = 10.0,
) -> DataFrame:
    """Heavy-hitter / shuffle-skew diagnostic: the top-k keys by row
    count with their share of the table and multiple-of-mean-key-size —
    the report you run BEFORE keying a 100 TB shuffle on this column,
    to decide whether it needs salting (operators/skew.py) or an AQE
    skew-join hint. is_skewed flags keys holding more than skew_factor
    times the mean key's rows (the same heuristic
    spark.sql.adaptive.skewJoin.skewedPartitionFactor applies to
    partitions at runtime).

    Plan shape: one scan into a per-key count (map-side combined), the
    1-row total/mean aggregate broadcasts back, and the top-k pick is a
    TakeOrderedAndProject — never a whole-key-space sort. The rank
    window runs over the k-row result, not the key space."""
    counts = df.groupBy(F.col(key_col).alias("key")).agg(F.count(F.lit(1)).alias("n_rows"))
    stats = counts.agg(
        F.sum("n_rows").alias("_total"), F.avg("n_rows").alias("_mean")
    )
    # asc_nulls_last on the key tiebreak: Spark's bare asc sorts NULLS
    # FIRST, DuckDB/Postgres sort NULLS LAST — a null key tied on count
    # would take a different rank on each engine (events edge fixture)
    top = counts.orderBy(
        F.col("n_rows").desc(), F.col("key").asc_nulls_last()
    ).limit(top_k)
    w = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc_nulls_last())
    return (
        top.crossJoin(F.broadcast(stats))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "rank",
            "key",
            "n_rows",
            round6(F.col("n_rows") * 100.0 / F.col("_total")).alias("share_pct"),
            round6(F.col("n_rows") / F.col("_mean")).alias("x_mean"),
            (F.col("n_rows") > F.lit(skew_factor) * F.col("_mean")).alias("is_skewed"),
        )
    )


def hot_keys_approx(df: DataFrame, key_col: str, support: float = 0.01) -> DataFrame:
    """Scale twin of hot_keys: single-pass approximate heavy hitters
    via DataFrame.stat.freqItems (Karp/Misra-Gries family). Where the
    exact report shuffles the distinct key space, this streams every
    partition once with O(1/support) state and returns a superset of
    the keys whose frequency exceeds `support` (false POSITIVES
    possible, false negatives not — the right direction for a skew
    guard). At 100 TB this is the always-on monitor; hot_keys is the
    drill-down you run on what it flags."""
    items = df.stat.freqItems([key_col], support=support)
    return items.select(
        F.explode(F.col(f"{key_col}_freqItems")).alias("key")
    ).withColumn("support_threshold", F.lit(float(support)))
