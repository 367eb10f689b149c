"""Timeseries operators: gap sessionization and as-of enrichment.

The reference stores raw readings and aggregates them by fixed buckets
(`src/data_storage/database.py` hourly/daily rollups); it has no
session or as-of surface. These are the two timeseries primitives an
events store needs beyond bucketing, built shuffle-minimal:

- sessionize / session_summary: gaps-and-islands with ONE exchange —
  the lag() and the running sum share a (key, ts) sort, so Catalyst
  plans a single Exchange + Sort feeding two Window nodes.
- asof_join: most-recent-at-or-before enrichment via union + tagged
  sort + last(ignorenulls) carry-forward — one shuffle keyed on the
  join key, no range self-join (the naive `l.ts >= r.ts` join plan is
  a broadcast-nested-loop that explodes quadratically per key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.numeric import round6
from ..functions.timeutil import bucket_seconds, micros


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Assign a per-key session_seq (1, 2, ...) that increments whenever
    the gap to the previous event exceeds `gap_seconds` — the classic
    gaps-and-islands labeling. Deterministic: ties on the timestamp
    break on `tiebreak_col`. Both window steps use the identical
    partitioning and ordering, so the plan has exactly one shuffle."""
    w = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    prev = F.lag(ts_col).over(w)
    new_sess = (
        prev.isNull()
        | ((micros(F.col(ts_col)) - micros(prev)) > gap_seconds * 1_000_000)
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("_new_sess", new_sess)
        .withColumn("session_seq", F.sum("_new_sess").over(run))
        .drop("_new_sess")
    )


def session_summary(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Per-session rollup of sessionize() output: bounds, event count,
    value total. The groupBy keys are a prefix of the window
    partitioning, so the aggregation reuses the session shuffle's
    partitioning (no second exchange of the full rows)."""
    sess = sessionize(events, gap_seconds, key_col, ts_col, tiebreak_col)
    return sess.groupBy(key_col, "session_seq").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        round6(F.sum(value_col)).alias("total_value"),
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """For every left row, attach the columns of the nearest right row
    within the same key: the most recent at-or-before its timestamp
    (direction="backward", last-observation-carried-forward) or the
    first at-or-after it (direction="forward"); rows with no such
    right row get nulls. tolerance_seconds additionally nulls a match
    farther than the bound — the pandas merge_asof contract (the
    nearest row is the only candidate; beyond tolerance means no
    match, never a farther fallback). At equal timestamps the right
    row IS visible in both directions.

    Scale shape: tag and union both sides, sort once per key, carry
    the right-side values across with last/first(ignorenulls) — one
    exchange total, output exactly |left| rows. Works unchanged when
    one side is 1000x the other; there is no small-side broadcast
    requirement and no per-key quadratic blowup."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lcols = [c for c in left.columns]
    carry_cols = [*right_cols, "_r_ts"]
    l2 = left.select(
        *lcols,
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(c) for c in right_cols],
        F.lit(None).cast("timestamp").alias("_r_ts"),
    )
    r2 = right.select(
        *[
            F.col(c) if c in (key_col, ts_col) else F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in lcols
        ],
        F.lit(0).alias("_side"),
        *right_cols,
        F.col(ts_col).cast("timestamp").alias("_r_ts"),
    )
    if direction == "backward":
        # right (side 0) sorts before left at equal ts -> visible in the
        # preceding frame
        w = (
            Window.partitionBy(key_col)
            .orderBy(ts_col, "_side")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        fill = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        # left (side 1) sorts before right at equal ts -> the equal-ts
        # right row lands inside the following frame
        w = (
            Window.partitionBy(key_col)
            .orderBy(F.col(ts_col), F.col("_side").desc())
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        fill = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731
    carried = l2.unionByName(r2)
    for c in carry_cols:
        carried = carried.withColumn(c, fill(c))
    out = carried.where(F.col("_side") == 1).drop("_side")
    if tolerance_seconds is not None:
        # cast-to-double keeps fractional seconds (unix_timestamp
        # truncates, which would mis-judge sub-second boundaries against
        # an epoch()-based oracle)
        within = F.abs(
            F.col("_r_ts").cast("double") - F.col(ts_col).cast("double")
        ) <= F.lit(float(tolerance_seconds))
        for c in right_cols:
            out = out.withColumn(c, F.when(within, F.col(c)))
    return out.drop("_r_ts")


def interval_join(
    events: DataFrame,
    intervals: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    start_col: str = "start",
    end_col: str = "end",
    bucket_width: str = "1 hour",
    max_buckets_per_interval: int = 10_000,
) -> DataFrame:
    """Range join without the BroadcastNestedLoop trap: every (event,
    interval) pair of the same key with start <= ts <= end.

    The naive `e.ts BETWEEN i.start AND i.end` join has no equi-key, so
    Catalyst plans a BroadcastNestedLoopJoin — O(|events| x |intervals|)
    comparisons and a broadcast requirement on one whole side, the plan
    that dies first at 100 TB. Here each interval explodes into the
    fixed-width time buckets it overlaps (ceil(len/width)+1 rows) and
    events map to their one bucket, turning the range predicate into a
    shuffle EQUI-join on (key, bucket) with a residual BETWEEN filter.
    An (event, interval) pair meets in exactly one bucket — the event's
    — so no dedup pass is needed. Pick bucket_width near the typical
    interval length: wider wastes residual comparisons, narrower
    multiplies the interval-side fan-out.

    Guards: reversed intervals (end < start) match nothing under the
    BETWEEN residual, so they are dropped up front — BEFORE sequence()
    would turn them into a descending bucket list. A single open-ended
    or sentinel interval (end = 9999-12-31) would explode into millions
    of bucket rows; any interval spanning more than
    `max_buckets_per_interval` buckets fails the job loudly
    (raise_error) instead of silently flooding the shuffle."""
    w = bucket_seconds(bucket_width)
    lo = F.floor(micros(F.col(start_col)) / (w * 1_000_000)).cast("long")
    hi = F.floor(micros(F.col(end_col)) / (w * 1_000_000)).cast("long")
    n_b = hi - lo + F.lit(1)
    seq = F.when(
        n_b > max_buckets_per_interval,
        F.raise_error(
            F.format_string(
                "interval_join: interval spans %s buckets of "
                f"{bucket_width} (cap {max_buckets_per_interval}); filter or "
                "clamp open-ended intervals, or widen bucket_width",
                n_b.cast("string"),
            )
        ).cast("array<bigint>"),
    ).otherwise(F.sequence(lo, hi))
    iv = intervals.where(F.col(end_col) >= F.col(start_col)).withColumn(
        "_b", F.explode(seq)
    )
    ev = events.withColumn(
        "_b", F.floor(micros(F.col(ts_col)) / (w * 1_000_000)).cast("long")
    )
    return (
        ev.join(iv, [key_col, "_b"])
        .where(F.col(ts_col).between(F.col(start_col), F.col(end_col)))
        .drop("_b")
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered-funnel analysis: per step, how many keys reached it in
    sequence — a key counts for step i iff it has a step-i event
    STRICTLY AFTER its earliest qualifying step-(i-1) event (classic
    first-touch funnel; conversion is reported against both the
    previous step and the funnel entry).

    Scale shape: ONE scan of the event table (filtered to funnel event
    types at the parquet scan), ONE exchange on key_col for a chain of
    per-key window mins (each step's first-qualifying timestamp is a
    window aggregate referencing the previous step's column — same
    partitioning, so the chain adds no shuffles), a per-key rollup that
    reuses that partitioning, and a singleton aggregate whose
    len(steps)-row unpivot is a literal explode. Fully lazy — no
    per-step jobs, joins, or checkpoints."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("k")
    df = events.where(F.col(type_col).isin(steps)).select(
        F.col(key_col).alias("k"), F.col(ts_col).alias("t"), F.col(type_col).alias("typ")
    )
    # chain of first-qualifying timestamps: t_i = min t of step-i events
    # strictly after t_{i-1}; each is a window min over the SAME key
    # partitioning, referencing the previous step's materialized column
    for i, step in enumerate(steps):
        qual = F.col("typ") == step
        if i > 0:
            qual = qual & F.col(f"_t{i - 1}").isNotNull() & (F.col("t") > F.col(f"_t{i - 1}"))
        df = df.withColumn(f"_t{i}", F.min(F.when(qual, F.col("t"))).over(w))
    per_key = df.groupBy("k").agg(
        *[F.max(F.col(f"_t{i}").isNotNull()).alias(f"_r{i}") for i in range(len(steps))]
    )
    one = per_key.agg(
        *[F.count_if(F.col(f"_r{i}")).alias(f"_n{i}") for i in range(len(steps))]
    )
    entry = F.col("_n0").cast("double")
    rows = F.array(
        *[
            F.struct(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("event_type"),
                F.col(f"_n{i}").alias("n_keys"),
                (
                    F.lit(None).cast("double")
                    if i == 0
                    else F.when(
                        F.col(f"_n{i - 1}") > 0,
                        F.round(100.0 * F.col(f"_n{i}") / F.col(f"_n{i - 1}"), 6),
                    )
                ).alias("conv_from_prev_pct"),
                F.when(entry > 0, F.round(100.0 * F.col(f"_n{i}") / entry, 6)).alias(
                    "conv_from_entry_pct"
                ),
            )
            for i, step in enumerate(steps)
        ]
    )
    return one.select(F.explode(rows).alias("s")).select("s.*")


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    max_offset_days: int = 30,
) -> DataFrame:
    """Cohort retention matrix: keys are cohorted by their FIRST active
    day; for each (cohort_day, day_offset) cell, how many of that
    cohort were active offset days later and what fraction of the
    cohort that is — the day-N retention table every growth dashboard
    draws.

    Scale shape: one scan reduced to per-key sorted activity-day sets
    (ONE exchange on key; per-key state bounded by the calendar span,
    not the event count), cohort day = element 1 of the sorted set —
    never a self-join back onto the activity frame. The cell and
    cohort-size aggregates both read the exploded per-key frame, and
    cohort sizes rejoin as a cohort-days-sized broadcast. Raw events
    are touched exactly once, keys shuffle exactly once."""
    # a NULL key is not a cohortable identity: SQL's join/distinct-count
    # semantics exclude it (the oracle's act JOIN coh ON k drops NULL
    # rows), and an engine that silently cohorts the null bucket as one
    # "user" inflates day-0 retention (events edge fixture)
    per_key = (
        events.where(F.col(key_col).isNotNull())
        .select(F.col(key_col).alias("k"), F.to_date(ts_col).alias("day"))
        .groupBy("k")
        .agg(F.array_sort(F.collect_set("day")).alias("days"))
        .select("k", F.element_at("days", 1).alias("cohort_day"), "days")
    )
    # two consumers (cells + sizes) of a keys-sized frame: checkpoint so
    # the event scan provably runs once
    per_key = per_key.localCheckpoint()
    cells = (
        per_key.select("cohort_day", F.explode("days").alias("day"))
        .select("cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .where(F.col("day_offset") <= max_offset_days)
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    sizes = per_key.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (
        cells.join(F.broadcast(sizes), "cohort_day")
        .select(
            "cohort_day",
            "day_offset",
            "n_active",
            "cohort_size",
            F.round(F.col("n_active") * 100.0 / F.col("cohort_size"), 6).alias(
                "retention_pct"
            ),
        )
    )


def session_summary_builtin(
    events: DataFrame,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """session_summary's twin on Spark's NATIVE session_window operator
    (SessionWindowing + MergingSessionsExec — sessions merge inside the
    aggregate, no lag/running-sum window chain). Same session semantics
    (gap closes after `gap_seconds` of inactivity), same rollup
    columns; session_end is reported as max(ts) like the custom path,
    not the window's exclusive end (= max(ts) + gap).

    Exists as a cross-check of the two implementations against one
    oracle family, and because the native form is the one Structured
    Streaming can run with watermark-managed state."""
    return (
        events.groupBy(
            F.col(key_col), F.session_window(ts_col, f"{gap_seconds} seconds").alias("w")
        )
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            round6(F.sum(value_col)).alias("total_value"),
        )
        .select(
            key_col, "session_start", "session_end", "n_events", "total_value"
        )
    )


def merge_intervals(
    intervals: DataFrame,
    key_col: str,
    start_col: str = "start",
    end_col: str = "end",
) -> DataFrame:
    """Coalesce overlapping/touching intervals per key into maximal
    islands (interval UNION) — the alert-windows primitive: N raw
    "error ±30min" spans become the distinct outage windows a pager
    report shows. Classic gaps-and-islands on intervals: sort by start,
    carry the running max end, open a new island when a start clears
    everything seen before it.

    One exchange: both window steps (running max-end over preceding
    rows, then the island running count) share the (key, start) sort,
    and the island rollup groups on a prefix of the same partitioning.
    Touching intervals (start == previous end) merge — intervals are
    treated as closed."""
    w = Window.partitionBy(key_col).orderBy(start_col, end_col)
    prev_max_end = F.max(end_col).over(
        w.rowsBetween(Window.unboundedPreceding, -1)
    )
    new_island = (
        prev_max_end.isNull() | (F.col(start_col) > prev_max_end)
    ).cast("int")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    labeled = intervals.withColumn("_new", new_island).withColumn(
        "island_seq", F.sum("_new").over(run)
    )
    return labeled.groupBy(key_col, "island_seq").agg(
        F.min(start_col).alias("island_start"),
        F.max(end_col).alias("island_end"),
        F.count(F.lit(1)).alias("n_intervals"),
    )


def gapfill_resample(
    readings: DataFrame,
    bucket: str = "6 hours",
    key_col: str = "device_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense-grid resample with gap fill — the time_bucket_gapfill +
    locf() surface (TimescaleDB's family adjacent to the reference's
    bucket aggregates, init.sql:293-321): per key, EVERY bucket of the
    observed span gets a row, observed buckets carry their aggregate,
    missing buckets are emitted with n_readings=0 and the last observed
    average carried forward. w1_gap_detection finds the holes;
    w7_locf_fill repairs existing rows; this is the step a real sensor
    user runs next — a regular grid for charting/joining/model input.

    One row per (key, bucket) in [min observed, max observed] per key:
      n_readings   rows observed in the bucket (0 for generated rows),
      avg_value    bucket average (NULL for generated rows),
      filled_value LOCF from the most recent observed bucket,
      is_gap       TRUE on generated rows.

    Scale shape (r15): (1) bucket aggregate — the only full-data
    shuffle, map-side combined, output is keys x buckets; (2) one
    lead() window over the aggregate (keys-partitioned); (3) each
    observed bucket emits itself plus the sequence() of missing
    buckets strictly before its successor, carrying its own average as
    the LOCF fill — every generated bucket's most recent observed
    bucket IS the row that generated it, so the carry needs no
    unbounded-preceding window, and the grid needs no span aggregate
    and no (key, bucket) join back onto the aggregate. The previous
    shape scanned the raw table TWICE (Catalyst rewrote the span
    aggregate against the raw scan), built the dense grid from the
    span, and left-joined it to the bucket aggregate; this shape is
    one scan, two bounded exchanges, zero joins. Values and row set
    are identical by construction (grid endpoints are observed, so
    every generated bucket lies strictly between two observed
    neighbors of its key)."""
    sec = bucket_seconds(bucket)
    b = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / sec).cast("long") * sec
    )
    bucketed = (
        readings.select(F.col(key_col), b.alias("bucket_ts"), F.col(value_col))
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            round6(F.avg(value_col)).alias("avg_value"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("bucket_ts")
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    led = bucketed.select(
        key_col,
        "n_readings",
        "avg_value",
        F.col("bucket_ts").alias("_bt"),
        F.lead("bucket_ts").over(w).alias("_nt"),
        # LOCF carry computed on the AGGREGATE frame: for a generated
        # bucket in (_bt, _nt) the most recent observed non-null
        # average is exactly the carry at _bt, so the same column
        # serves both the observed row and every gap row it emits
        # (null-avg observed buckets — possible only if the value
        # column itself is null — carry through, as before)
        F.last("avg_value", ignorenulls=True).over(wb).alias("_fill"),
    )
    step = F.expr(f"interval {sec} seconds")
    gap_ts = F.when(
        F.col("_nt").isNotNull() & (F.col("_nt") > F.col("_bt") + step),
        F.expr(
            f"sequence(_bt + interval {sec} seconds, "
            f"_nt - interval {sec} seconds, interval {sec} seconds)"
        ),
    ).otherwise(F.array().cast("array<timestamp>"))
    exploded = led.select(
        key_col,
        "n_readings",
        "avg_value",
        "_bt",
        "_fill",
        F.explode(F.concat(F.array(F.col("_bt")), gap_ts)).alias("bucket_ts"),
    )
    is_obs = F.col("bucket_ts") == F.col("_bt")
    # NULL-key rows: the dense-grid-join formulation this shape replaces
    # (grid LEFT JOIN aggregate ON key = key) never matches a NULL key
    # (SQL null-equality), so every NULL-key bucket surfaces as an
    # unfilled gap row. The join-free form must reproduce that exactly.
    keyed = F.col(key_col).isNotNull()
    return exploded.select(
        key_col,
        "bucket_ts",
        F.when(is_obs & keyed, F.col("n_readings")).otherwise(F.lit(0)).alias("n_readings"),
        F.when(is_obs & keyed, F.col("avg_value")).alias("avg_value"),
        F.when(keyed, F.col("_fill")).alias("filled_value"),
        (~is_obs | ~keyed).alias("is_gap"),
    )


def gapfill_interpolate(
    readings: DataFrame,
    bucket: str = "6 hours",
    key_col: str = "device_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Dense-grid resample with LINEAR interpolation — the
    time_bucket_gapfill + interpolate() twin of gapfill_resample's
    locf() (TimescaleDB's same gapfill family, adjacent surface to the
    reference's bucket aggregates, init.sql:293-321): a gap bucket gets
    the time-weighted blend of the bracketing observed bucket averages,
    v0 + (v1 - v0) * (t - t0) / (t1 - t0), instead of a flat carry —
    what a charting user asks for right after LOCF.

    Scale shape (r15): same restructure as gapfill_resample — bucket
    aggregate (the only full-data shuffle), ONE window pass over the
    aggregate computing lead(bucket_ts) plus the backward bracket
    (last non-null (value, ts) at/before the row) and the STRICTLY
    forward bracket (first non-null (value, ts) after the row), then
    each observed bucket emits itself plus the missing buckets
    strictly before its successor. A generated bucket in (t0, t1)
    brackets to exactly t0's backward pair and t0's strictly-forward
    pair, so the join-free form reproduces the grid-window form bit
    for bit (including null-avg observed buckets, where the brackets
    skip over the null — possible only when the value column itself is
    null). All three window expressions share one (key, bucket_ts)
    sort in a single WindowExec; the previous shape scanned the raw
    table twice (span + aggregate) and paid a grid-to-aggregate join.
    Every generated bucket is interior by construction, so both
    brackets always exist and interp_value is never NULL.

    The blend stays in exact integer micro-units: the bracketing
    averages are 6-dec rounded (exact at 1e-6) and the time deltas are
    integer seconds, so the weighted numerator and denominator are
    EXACT longs and both the engine and any SQL oracle divide the
    identical integers — a float-domain `pv + (nv-pv)*frac` followed
    by round() is engine-dependent exactly at .5 boundaries of the 7th
    digit (measured: 29.826666 vs 29.826667 on the sf0.01 gate)."""
    sec = bucket_seconds(bucket)
    b = F.timestamp_seconds(
        F.floor(F.unix_timestamp(F.col(ts_col)) / sec).cast("long") * sec
    )
    bucketed = (
        readings.select(F.col(key_col), b.alias("bucket_ts"), F.col(value_col))
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_readings"),
            round6(F.avg(value_col)).alias("avg_value"),
        )
    )
    w = Window.partitionBy(key_col).orderBy("bucket_ts")
    wb = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wf_strict = w.rowsBetween(1, Window.unboundedFollowing)
    obs = F.when(
        F.col("avg_value").isNotNull(),
        F.struct(F.col("avg_value").alias("v"), F.col("bucket_ts").alias("t")),
    )
    led = bucketed.select(
        key_col,
        "n_readings",
        "avg_value",
        F.col("bucket_ts").alias("_bt"),
        F.lead("bucket_ts").over(w).alias("_nt"),
        F.last(obs, ignorenulls=True).over(wb).alias("_back"),
        F.first(obs, ignorenulls=True).over(wf_strict).alias("_fwd"),
    )
    step = F.expr(f"interval {sec} seconds")
    gap_ts = F.when(
        F.col("_nt").isNotNull() & (F.col("_nt") > F.col("_bt") + step),
        F.expr(
            f"sequence(_bt + interval {sec} seconds, "
            f"_nt - interval {sec} seconds, interval {sec} seconds)"
        ),
    ).otherwise(F.array().cast("array<timestamp>"))
    exploded = led.select(
        key_col,
        "n_readings",
        "avg_value",
        "_bt",
        "_back",
        "_fwd",
        F.explode(F.concat(F.array(F.col("_bt")), gap_ts)).alias("bucket_ts"),
    )
    is_obs = F.col("bucket_ts") == F.col("_bt")
    prev_v = F.col("_back.v")
    prev_t = F.col("_back.t")
    next_v = F.col("_fwd.v")
    next_t = F.col("_fwd.t")
    pvm = F.round(prev_v * 1e6).cast("long")
    nvm = F.round(next_v * 1e6).cast("long")
    d1 = F.unix_timestamp("bucket_ts") - F.unix_timestamp(prev_t)
    d2 = F.unix_timestamp(next_t) - F.unix_timestamp(prev_t)
    interp_micro = F.round(
        (pvm * (d2 - d1) + nvm * d1).cast("double") / d2.cast("double")
    ).cast("long")
    interp = F.when(
        is_obs & F.col("avg_value").isNotNull(), F.col("avg_value")
    ).otherwise(interp_micro.cast("double") / 1e6)
    # NULL-key rows: mirror the grid-join formulation, whose key-equality
    # join never matches NULL — all such buckets are unfilled gaps (see
    # gapfill_resample).
    keyed = F.col(key_col).isNotNull()
    return exploded.select(
        key_col,
        "bucket_ts",
        F.when(is_obs & keyed, F.col("n_readings")).otherwise(F.lit(0)).alias("n_readings"),
        F.when(is_obs & keyed, F.col("avg_value")).alias("avg_value"),
        F.when(keyed, interp).alias("interp_value"),
        (~is_obs | ~keyed).alias("is_gap"),
    )


def time_weighted_avg(
    readings: DataFrame,
    bucket: str = "1 hour",
    key_col: str = "device_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "reading_id",
) -> DataFrame:
    """Per-(key, bucket) TIME-weighted average with LOCF weighting —
    TimescaleDB's time_weight('LOCF') family: on irregularly-sampled
    series the plain AVG over-weights chatty periods; here each reading
    holds its value until the NEXT reading (or the bucket end, for the
    bucket's last reading), so the mean reflects time, not sample
    density. A bucket's weight for reading i is
        min(next_ts, bucket_end) - ts_i     (seconds, >= 0)
    with next_ts the key's next reading anywhere in the series (a value
    holds across quiet spells up to its own bucket's edge).

    One window (lead over the (key, ts) sort) + one (key, bucket)
    aggregate — the window's exchange is reused by the aggregate
    (bucket derives from ts), so one shuffle total. All time arithmetic
    is integer MICROSECONDS (unix_micros), so weights are exact and
    engine-portable (second-truncation would bias sub-second gaps)."""
    us = bucket_seconds(bucket) * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    ts_us = F.unix_micros(F.col(ts_col))
    bucket_us = ts_us - ts_us % us
    end_us = bucket_us + us
    nxt_us = F.lead(ts_us).over(w)
    weight = (F.least(F.coalesce(nxt_us, end_us), end_us) - ts_us).cast("double")
    tagged = readings.select(
        F.col(key_col),
        F.timestamp_micros(bucket_us).alias("bucket_ts"),
        F.col(value_col),
        weight.alias("_w"),
    )
    return tagged.groupBy(key_col, "bucket_ts").agg(
        F.count(F.lit(1)).alias("n_readings"),
        round6(F.avg(value_col)).alias("plain_avg"),
        round6(
            F.when(
                F.sum("_w") > 0,
                F.sum(F.col(value_col) * F.col("_w")) / F.sum("_w"),
            )
        ).alias("time_weighted_avg"),
    )


def counter_delta(
    readings: DataFrame,
    bucket: str = "1 day",
    key_col: str = "device_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "reading_id",
) -> DataFrame:
    """Monotonic-counter aggregation with reset detection —
    TimescaleDB's counter_agg / PromQL's increase(): for counters that
    only ever climb but occasionally RESET to ~0 (device reboot; the
    reference's movement_counter channel is exactly this shape), the
    per-bucket increase is the sum of positive deltas, and a negative
    delta means a reset happened — the post-reset VALUE is the increase
    since the reset (counter restarted near zero).

    Per (key, bucket): n_resets, counter_increase, plus the raw
    first/last values for audit. A key's first-ever reading contributes
    no delta (nothing to diff against). Same one-shuffle shape as
    time_weighted_avg: one lag window + one aggregate sharing the key
    sort."""
    us = bucket_seconds(bucket) * 1_000_000
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    ts_us = F.unix_micros(F.col(ts_col))
    delta = F.col(value_col) - F.lag(value_col).over(w)
    tagged = readings.select(
        F.col(key_col),
        F.timestamp_micros(ts_us - ts_us % us).alias("bucket_ts"),
        F.col(ts_col),
        F.col(value_col),
        F.col(id_col),
        delta.alias("_d"),
    )
    # two explicit WHEN branches: a NULL delta (the key's first-ever
    # reading) must contribute NOTHING — an otherwise() branch would
    # swallow the NULL case and count the first value as an increase
    inc = F.when(F.col("_d") >= 0, F.col("_d")).when(
        F.col("_d") < 0, F.col(value_col)
    )
    return tagged.groupBy(key_col, "bucket_ts").agg(
        F.count(F.lit(1)).alias("n_readings"),
        F.count_if(F.col("_d") < 0).alias("n_resets"),
        round6(F.coalesce(F.sum(inc), F.lit(0.0))).alias("counter_increase"),
        round6(F.min_by(value_col, F.struct(ts_col, id_col))).alias("first_value"),
        round6(F.max_by(value_col, F.struct(ts_col, id_col))).alias("last_value"),
    )


def event_transitions(
    events: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """First-order transition matrix over per-key event sequences
    (the Markov behavioral summary funnels are a special case of):
    for every (from, to) event-type pair, how often it occurs and the
    conditional probability P(to | from) — the what-happens-next panel
    behind session analysis and anomaly-flow detection.

    One per-key lag window (the only data-sized shuffle), then a
    types x types aggregate; the probability normalizer is a window
    over that tiny matrix, not the data. Each key's first event has no
    predecessor and contributes nothing."""
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).where(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    norm = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n_transitions",
        round6(
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(norm).cast("double")
        ).alias("p_next"),
    )


def m4_downsample(
    readings: DataFrame,
    bucket: str = "1 hour",
    key_col: str = "device_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "reading_id",
) -> DataFrame:
    """M4 visualization downsampling (Jugel et al., VLDB 2014; the
    TimescaleDB-toolkit/Grafana downsample family): per (key, bucket)
    keep exactly the FIRST, LAST, MIN and MAX readings — the four
    points per pixel column that make a line chart of millions of rows
    render pixel-identically to the full series. Output one row per
    (key, bucket, role); a reading holding several roles appears once
    per role, so charts can style extrema separately.

    One map-side-combined aggregate (4 min_by/max_by picks over struct
    orderings — deterministic ties by (ts, id)) + a 4-struct explode of
    the bucket-sized result: single exchange, no windows, no sort of
    the raw data.

    NULL-value readings are excluded up front: they cannot be plotted,
    and letting them compete for roles makes the extremes
    engine-dependent (Spark struct ordering puts NULL first, SQL
    ORDER BY defaults put it last — found by the r12 events edge
    sweep). A bucket whose readings are all NULL draws nothing and
    emits nothing."""
    readings = readings.where(F.col(value_col).isNotNull())
    us = bucket_seconds(bucket) * 1_000_000
    ts_us = F.unix_micros(F.col(ts_col))
    pick = lambda c: F.struct(  # noqa: E731
        F.col(ts_col).alias("ts"), F.col(value_col).alias("value"), F.col(id_col).alias("reading_id")
    )
    by_time = F.struct(F.col(ts_col), F.col(id_col))
    by_value = F.struct(F.col(value_col), F.col(ts_col), F.col(id_col))
    agg = (
        readings.select(
            F.col(key_col),
            F.timestamp_micros(ts_us - ts_us % us).alias("bucket_ts"),
            F.col(ts_col),
            F.col(value_col),
            F.col(id_col),
        )
        .groupBy(key_col, "bucket_ts")
        .agg(
            F.min_by(pick("f"), by_time).alias("_first"),
            F.max_by(pick("l"), by_time).alias("_last"),
            F.min_by(pick("mn"), by_value).alias("_min"),
            F.max_by(pick("mx"), by_value).alias("_max"),
        )
    )
    roles = F.array(
        F.struct(F.lit("first").alias("role"), F.col("_first").alias("p")),
        F.struct(F.lit("last").alias("role"), F.col("_last").alias("p")),
        F.struct(F.lit("min").alias("role"), F.col("_min").alias("p")),
        F.struct(F.lit("max").alias("role"), F.col("_max").alias("p")),
    )
    return agg.select(key_col, "bucket_ts", F.explode(roles).alias("r")).select(
        key_col,
        "bucket_ts",
        F.col("r.role").alias("role"),
        F.col("r.p.ts").alias("ts"),
        F.col("r.p.value").alias("value"),
        F.col("r.p.reading_id").alias("reading_id"),
    )


def lttb_downsample(
    readings: DataFrame,
    n_out: int = 100,
    key_col: str = "device_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    — the charting downsample next to w10's M4: per key, keep exactly
    n_out points chosen to preserve the series' visual shape (first and
    last always kept; each interior bucket keeps the point forming the
    largest triangle with the PREVIOUSLY kept point and the next
    bucket's centroid). Where M4 preserves pixel-column extrema, LTTB
    preserves perceived line shape at arbitrary target sizes.

    The selection chain is inherently sequential (each pick depends on
    the previous pick), so this is the engine's per-key-sequential
    pattern: applyInPandas partitions by key and runs the linear-time
    kernel per series — keys parallelize across the cluster, each
    key's series sorts once within its task. A series at 100 TB scale
    is still one device's data (bounded); the shuffle is the only
    data movement. Keys with <= n_out points pass through unchanged.

    Returns (key, ts, value, pt_rank) with pt_rank the kept point's
    order in the downsampled series. The key column keeps its INPUT
    dtype (m4_downsample's contract — r7 hard-cast it to string, which
    silently rewrote long device keys)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.types import IntegerType, StructField, StructType

    if n_out < 3:
        # first/last are pinned unconditionally, so n_out <= 2 cannot
        # select any shape-preserving interior point — the caller asked
        # for a downsample the algorithm cannot produce
        raise ValueError(f"lttb_downsample: n_out must be >= 3, got {n_out}")

    in_fields = {f.name: f for f in readings.schema.fields}
    out_schema = StructType(
        [
            StructField(key_col, in_fields[key_col].dataType),
            StructField(ts_col, in_fields[ts_col].dataType),
            StructField(value_col, in_fields[value_col].dataType),
            StructField("pt_rank", IntegerType()),
        ]
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort").reset_index(drop=True)
        n = len(pdf)
        if n <= n_out:
            return pd.DataFrame(
                {
                    key_col: pdf[key_col],
                    ts_col: pdf[ts_col],
                    value_col: pdf[value_col],
                    "pt_rank": np.arange(n, dtype=np.int32),
                }
            )
        x = pdf[ts_col].astype("int64").to_numpy(dtype=np.float64)
        y = pdf[value_col].to_numpy(dtype=np.float64)
        # bucket boundaries over the interior points (first/last pinned)
        bounds = np.linspace(1, n - 1, n_out - 1).astype(np.int64)
        keep = [0]
        a = 0
        for i in range(n_out - 2):
            lo, hi = bounds[i], bounds[i + 1]
            nlo, nhi = bounds[i + 1], (bounds[i + 2] if i + 2 < len(bounds) else n)
            cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
            ax, ay = x[a], y[a]
            # triangle areas vs the previous pick and the next centroid
            areas = np.abs(
                (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
            )
            a = lo + int(np.argmax(areas))  # ties -> first (deterministic)
            keep.append(a)
        keep.append(n - 1)
        sel = pdf.iloc[keep]
        return pd.DataFrame(
            {
                key_col: sel[key_col].values,
                ts_col: sel[ts_col].values,
                value_col: sel[value_col].values,
                "pt_rank": np.arange(len(keep), dtype=np.int32),
            }
        )

    return (
        readings.select(key_col, ts_col, value_col)
        .groupBy(key_col)
        .applyInPandas(kernel, out_schema)
    )
