"""Synthetic sensor-reading generator — OP-S6/T8 (iot_simulator.py).

The reference's simulator is a Python loop emitting random-walk values
per device type with 5% anomaly injection (iot_simulator.py:131-259,
:314-346). The Spark-first re-expression generates the same *shape*
declaratively: spark.range -> column expressions (rand/randn/sin with a
fixed seed), so a billion readings generate in parallel with no driver
loop and full determinism per seed.

Value models per device type (mirroring iot_simulator.py:97-129):
- temperature: diurnal sinusoid + noise around a per-device base
- humidity: base + noise, clamped [0, 100]
- pressure: base + slow drift + noise
- motion: Bernoulli 0/1
- light: day/night sinusoid, non-negative

OP-T8 anomaly injection: with p=anomaly_probability scale the value
x[1.5, 3.0] (high spike) or x[0.1, 0.5] (low spike).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEVICE_TYPE_WEIGHTS = [
    ("temperature_sensor", 0.30, "°C"),
    ("humidity_sensor", 0.30, "%"),
    ("pressure_sensor", 0.15, "Pa"),
    ("light_sensor", 0.15, "lux"),
    ("motion_sensor", 0.10, "boolean"),
]


def simulate_readings(
    spark: SparkSession,
    num_devices: int = 8,
    readings_per_device: int = 1000,
    start_ts: str = "2024-01-01 00:00:00",
    interval_seconds: int = 1,
    anomaly_probability: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Deterministic synthetic readings table.

    One row per (device, tick); device type assigned by the weighted mix
    (iot_simulator.py:287-300); values follow the per-type models;
    ~anomaly_probability of rows carry an injected spike and
    is_anomaly=true."""
    n = num_devices * readings_per_device
    df = (
        spark.range(n)
        .withColumn("device_idx", (F.col("id") % num_devices).cast("int"))
        .withColumn("tick", (F.col("id") / num_devices).cast("long"))
    )
    # stable per-device pseudo-randoms from a hash, not rand() — rows are
    # reproducible under repartitioning (rand() is per-partition-seeded)
    h = F.abs(F.xxhash64(F.col("device_idx"), F.lit(seed)))
    u_dev = (h % 1000000).cast("double") / 1000000.0  # uniform [0,1) per device
    # weighted device-type choice via cumulative thresholds
    cum = 0.0
    type_expr = None
    unit_expr = None
    for dt, w, unit in DEVICE_TYPE_WEIGHTS:
        cum += w
        cond = u_dev < cum
        type_expr = F.when(cond, dt) if type_expr is None else type_expr.when(cond, dt)
        unit_expr = F.when(cond, unit) if unit_expr is None else unit_expr.when(cond, unit)
    df = (
        df.withColumn("device_id", F.concat(F.lit("sim-"), F.format_string("%03d", "device_idx")))
        .withColumn("device_type", type_expr.otherwise("temperature_sensor"))
        .withColumn("unit", unit_expr.otherwise("°C"))
        .withColumn(
            "timestamp",
            F.lit(start_ts).cast("timestamp") + F.make_interval(secs=F.col("tick") * interval_seconds),
        )
    )
    # per-row noise from a hash of (device, tick): deterministic, iid-ish
    hr = F.abs(F.xxhash64(F.col("device_idx"), F.col("tick"), F.lit(seed)))
    u = (hr % 1000000).cast("double") / 1000000.0
    u2 = ((hr / 1000000).cast("long") % 1000000).cast("double") / 1000000.0
    day_frac = (F.unix_timestamp("timestamp") % 86400).cast("double") / 86400.0
    diurnal = F.sin((day_frac - 0.25) * 2 * 3.141592653589793)
    base = 15.0 + u_dev * 10.0
    value = (
        F.when(F.col("device_type") == "temperature_sensor", base + 5.0 * diurnal + (u - 0.5) * 2.0)
        .when(F.col("device_type") == "humidity_sensor",
              F.least(F.lit(100.0), F.greatest(F.lit(0.0), F.lit(40.0) + u_dev * 30.0 + (u - 0.5) * 10.0)))
        .when(F.col("device_type") == "pressure_sensor",
              F.lit(101325.0) + (u_dev - 0.5) * 2000.0 + (u - 0.5) * 500.0)
        .when(F.col("device_type") == "light_sensor",
              F.greatest(F.lit(0.0), F.lit(500.0) * diurnal + u * 50.0))
        .otherwise((u < 0.1).cast("double"))  # motion: 10% active
    )
    # OP-T8: anomaly injection (iot_simulator.py:200-221)
    is_anom = u2 < anomaly_probability
    spike_high = u2 < anomaly_probability / 2
    scale = F.when(spike_high, 1.5 + u * 1.5).otherwise(0.1 + u * 0.4)
    value = F.when(is_anom & (F.col("device_type") != "motion_sensor"), value * scale).otherwise(value)
    value = F.when(is_anom & (F.col("device_type") == "motion_sensor"), F.lit(1.0)).otherwise(value)
    return df.select(
        "device_id",
        "device_type",
        "timestamp",
        F.round(value, 4).alias("value"),
        "unit",
        is_anom.alias("is_anomaly"),
    )


def simulate_stream(spark: SparkSession, rows_per_second: int = 100, num_devices: int = 8, seed: int = 42) -> DataFrame:
    """Streaming variant on the rate source (generate_continuous,
    iot_simulator.py:327-346): same column models keyed off the rate
    source's (timestamp, value) columns."""
    rate = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    df = (
        rate.withColumn("device_idx", (F.col("value") % num_devices).cast("int"))
        .withColumn("tick", (F.col("value") / num_devices).cast("long"))
    )
    h = F.abs(F.xxhash64(F.col("device_idx"), F.lit(seed)))
    u_dev = (h % 1000000).cast("double") / 1000000.0
    hr = F.abs(F.xxhash64(F.col("device_idx"), F.col("tick"), F.lit(seed)))
    u = (hr % 1000000).cast("double") / 1000000.0
    return df.select(
        F.concat(F.lit("sim-"), F.format_string("%03d", "device_idx")).alias("device_id"),
        F.lit("temperature_sensor").alias("device_type"),
        F.col("timestamp"),
        F.round(F.lit(15.0) + u_dev * 10.0 + (u - 0.5) * 2.0, 4).alias("value"),
        F.lit("°C").alias("unit"),
    )
