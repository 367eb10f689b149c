"""Data-quality operators — integrity invariants and per-batch metrics.

The reference enforces quality operationally (database_utils.py:329-415
integrity checks; metrics.py counters). Here the same invariants are
cheap aggregates usable in batch or inside foreachBatch (OP-M2/§2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def integrity_violations(df: DataFrame, id_col: str = "device_id", ts_col: str = "timestamp") -> DataFrame:
    """Row-level integrity tags (database_utils.py:341-379): null/empty id,
    future timestamp, out-of-range battery / coordinates. Returns only
    violating rows with a `violations` array column."""
    checks = [
        ((F.col(id_col).isNull()) | (F.col(id_col).cast("string") == ""), "null_or_empty_device_id"),
        (F.col(ts_col) > F.current_timestamp(), "future_timestamp"),
    ]
    if "battery_level" in df.columns:
        checks.append((F.col("battery_level").isNotNull() & ~F.col("battery_level").between(0, 100), "battery_out_of_range"))
    if "latitude" in df.columns:
        checks.append((F.col("latitude").isNotNull() & ~F.col("latitude").between(-90, 90), "latitude_out_of_range"))
    if "longitude" in df.columns:
        checks.append((F.col("longitude").isNotNull() & ~F.col("longitude").between(-180, 180), "longitude_out_of_range"))
    tagged = df.withColumn(
        "violations",
        F.array_compact(F.array(*[F.when(cond, F.lit(name)) for cond, name in checks])),
    )
    return tagged.where(F.size("violations") > 0)


def duplicate_pairs(df: DataFrame, keys=("device_id", "timestamp")) -> DataFrame:
    """Duplicate (device_id, ts) groups (database_utils.py:382-395)."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n")).where(F.col("n") > 1)


def batch_metrics(df_valid: DataFrame, df_rejected: DataFrame) -> dict:
    """Per-batch pipeline metrics (§2.11): rows in/valid/rejected/anomalous.

    ONE aggregation job per batch: the valid/rejected split partitions
    the input (validate_readings' contract), so rows_in is their sum and
    all four counters come from a single `agg` over a 2-column union of
    the two frames — not one count() action per metric. In foreachBatch
    the frames are localCheckpointed by the caller, so this pass reads
    materialized blocks, not re-executed lineage."""
    anomaly = (
        F.col("is_anomaly") if "is_anomaly" in df_valid.columns else F.lit(False)
    )
    tagged = df_valid.select(
        F.lit(True).alias("ok"), anomaly.cast("boolean").alias("anom")
    ).unionAll(
        df_rejected.select(F.lit(False).alias("ok"), F.lit(False).alias("anom"))
    )
    row = tagged.agg(
        F.count(F.lit(1)).alias("rows_in"),
        F.count_if(F.col("ok")).alias("rows_valid"),
        F.count_if(~F.col("ok")).alias("rows_rejected"),
        F.count_if(F.col("ok") & F.coalesce(F.col("anom"), F.lit(False))).alias("anomalies"),
    ).first()
    return {
        "rows_in": row["rows_in"],
        "rows_valid": row["rows_valid"],
        "rows_rejected": row["rows_rejected"],
        "anomalies": row["anomalies"],
        "validation_failure_rate": (row["rows_rejected"] / row["rows_in"]) if row["rows_in"] else 0.0,
    }


def expectations_report(
    df: DataFrame,
    expectations: list[tuple[str, F.Column, float]],
) -> DataFrame:
    """Declarative data-quality expectations (the Deequ/Great-
    Expectations shape): each (name, row-predicate, min_pass_fraction)
    is evaluated corpus-wide in ONE aggregation pass — a conditional
    count per rule folded into a single agg, never one job per rule —
    and reported as (expectation, n_rows, n_pass, pass_fraction,
    min_pass_fraction, passed).

    The predicate is any boolean Column (null-safe: NULL counts as a
    failure, the conservative reading). One scan at any scale; the
    output is rules-sized. Pair with integrity_violations for the
    row-level drill-down of whatever fails here."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for name, pred, _ in expectations:
        aggs.append(F.count_if(F.coalesce(pred, F.lit(False))).alias(f"_p_{name}"))
    row = df.agg(*aggs)
    out = []
    for name, _, min_frac in expectations:
        out.append(
            F.struct(
                F.lit(name).alias("expectation"),
                F.col("_n").alias("n_rows"),
                F.col(f"_p_{name}").alias("n_pass"),
                F.round(
                    F.when(
                        F.col("_n") > 0,
                        F.col(f"_p_{name}").cast("double") / F.col("_n").cast("double"),
                    ).otherwise(F.lit(1.0)),
                    6,
                ).alias("pass_fraction"),
                F.lit(float(min_frac)).alias("min_pass_fraction"),
                (
                    F.when(
                        F.col("_n") > 0,
                        F.col(f"_p_{name}").cast("double") / F.col("_n").cast("double"),
                    ).otherwise(F.lit(1.0))
                    >= F.lit(float(min_frac))
                ).alias("passed"),
            )
        )
    return (
        row.select(F.explode(F.array(*out)).alias("_e"))
        .select("_e.*")
        .orderBy("expectation")
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column profiler — the discovery step BEFORE writing
    expectations_report rules: one row per column with row/null/distinct
    counts and min/max (stringified for a uniform schema; timestamps
    formatted to microseconds so the representation is
    engine-portable).

    Single scan: every column's aggregates fold into ONE aggregation
    pass, then a literal explode unpivots the 1-row result — never a
    job per column. The exact distinct counts make Spark plan an Expand
    (one input replica per distinct-column) — the honest price of exact
    profiling, paid in one shuffle; at 100 TB swap countDistinct for
    approx_count_distinct the same way a6_table_stats' HLL twin does.

    Measured alternative, rejected: splitting plain aggs and distincts
    into two passes crossJoined back is ~2x faster at sf0.1 (fewer agg
    buffer updates per expanded row: 4.4 -> 2.1 s cold) — but it scans
    the table TWICE, and a 100 TB profile is IO-bound where the single
    Expand pass reads once. Cache-warm local wins don't survive the
    scale-up; one scan stays.

    The projected input is fan_out_scan'd (r15): the Expand replicas
    and their partial aggregation run in the SCAN stage, which on the
    single-file local tables is one task doing |rows| x |cols| buffer
    updates alone; no-op at any real scan width."""
    from ..functions.partitioning import fan_out_scan

    if cols is None:
        cols = df.columns
    dtypes = dict(df.dtypes)
    df = fan_out_scan(df.select(*cols))
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        if dtypes[c].startswith("timestamp"):
            mn = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            mx = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs += [
            F.count(col).alias(f"_nn{i}"),
            F.countDistinct(col).alias(f"_nd{i}"),
            mn.alias(f"_mn{i}"),
            mx.alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"_nn{i}")).alias("n_null"),
                F.col(f"_nd{i}").alias("n_distinct"),
                F.col(f"_mn{i}").alias("min_value"),
                F.col(f"_mx{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")


def profile_table_approx(
    df: DataFrame, cols: list[str] | None = None, rsd: float = 0.02
) -> DataFrame:
    """The 100 TB profile_table: identical report shape with per-column
    NDV from HyperLogLog++ (`approx_count_distinct`, default 2% rsd)
    instead of exact countDistinct. The exact version's Expand replica
    per distinct-column (input rows x profiled columns entering the
    shuffle) is the scale-killer this removes: here every column is one
    constant-size HLL sketch in a single ordinary aggregate — one scan,
    one 1-row exchange, no Expand, regardless of column count or
    cardinality. Same single-pass/explode contract as profile_table;
    same economics as the a6/a9 approx twins. Deliberately NOT
    fan_out_scan'd (r15): unlike the exact twin's Expand, the per-row
    sketch update is cheaper than the round-robin exchange — measured
    1.22 s -> 1.65 s when fanned out at sf0.1."""
    if cols is None:
        cols = df.columns
    dtypes = dict(df.dtypes)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for i, c in enumerate(cols):
        col = F.col(c)
        if dtypes[c].startswith("timestamp"):
            mn = F.date_format(F.min(col), "yyyy-MM-dd HH:mm:ss.SSSSSS")
            mx = F.date_format(F.max(col), "yyyy-MM-dd HH:mm:ss.SSSSSS")
        else:
            mn = F.min(col).cast("string")
            mx = F.max(col).cast("string")
        aggs += [
            F.count(col).alias(f"_nn{i}"),
            F.approx_count_distinct(col, rsd).alias(f"_nd{i}"),
            mn.alias(f"_mn{i}"),
            mx.alias(f"_mx{i}"),
        ]
    one = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("n_rows").alias("n_rows"),
                (F.col("n_rows") - F.col(f"_nn{i}")).alias("n_null"),
                F.col(f"_nd{i}").alias("n_distinct_approx"),
                F.col(f"_mn{i}").alias("min_value"),
                F.col(f"_mx{i}").alias("max_value"),
            )
            for i, c in enumerate(cols)
        ]
    )
    return one.select(F.explode(per_col).alias("p")).select("p.*")
