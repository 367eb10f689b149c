"""Schemas and static configuration for the sensor-reading data model.

Re-declares the reference's three record shapes (SURVEY.md §1) as Spark
StructTypes:

- RAW_RUUVITAG_SCHEMA: the wide per-tag JSON the gateway emits
  (esp32/ruuvitag_gateway/main/main.c:414-455).
- SENSOR_READING_SCHEMA: the normalized IoTSensorReading record
  (src/schemas/iot_sensor_reading.avsc:1-163) with nested location.
- FLAT_READING_SCHEMA: the storage-layer flattened row
  (database/init.sql:31-70).

Plus the engine's static config: the 9-entry sensor fan-out mapping
(ruuvitag_adapter.py:272-331), per-channel anomaly thresholds
(config.py:295-305 / config.yaml:152-159), battery-voltage calibration
(config.py:288-293) and default enrichment location (config.py:277-315).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RAW_RUUVITAG_SCHEMA = StructType(
    [
        StructField("device_id", StringType()),
        StructField("device_type", StringType()),
        StructField("timestamp", StringType()),  # epoch-seconds string or ISO-8601
        StructField("temperature", DoubleType()),
        StructField("humidity", DoubleType()),
        StructField("pressure", DoubleType()),
        StructField("acceleration_x", DoubleType()),
        StructField("acceleration_y", DoubleType()),
        StructField("acceleration_z", DoubleType()),
        StructField("battery_voltage", DoubleType()),
        StructField("tx_power", DoubleType()),
        StructField("movement_counter", DoubleType()),
        StructField("measurement_sequence", DoubleType()),  # dropped by fan-out
    ]
)

LOCATION_SCHEMA = StructType(
    [
        StructField("latitude", DoubleType()),
        StructField("longitude", DoubleType()),
        StructField("building", StringType()),
        StructField("floor", IntegerType()),
        StructField("zone", StringType()),
        StructField("room", StringType()),
    ]
)

SENSOR_READING_SCHEMA = StructType(
    [
        StructField("device_id", StringType(), nullable=False),
        StructField("device_type", StringType(), nullable=False),
        StructField("timestamp", TimestampType(), nullable=False),
        StructField("value", DoubleType()),
        StructField("unit", StringType(), nullable=False),
        StructField("location", LOCATION_SCHEMA),
        StructField("battery_level", DoubleType()),
        StructField("signal_strength", DoubleType()),
        StructField("is_anomaly", BooleanType()),
        StructField("firmware_version", StringType()),
        StructField("device_metadata", MapType(StringType(), StringType())),
        StructField("status", StringType()),
        StructField("tags", ArrayType(StringType())),
        StructField("maintenance_date", TimestampType()),
    ]
)

# Storage layer flattens location.* into six columns (init.sql:40-45).
FLAT_READING_SCHEMA = StructType(
    [f for f in SENSOR_READING_SCHEMA.fields if f.name != "location"][:5]
    + list(LOCATION_SCHEMA.fields)
    + [f for f in SENSOR_READING_SCHEMA.fields if f.name != "location"][5:]
)

DEVICE_STATUSES = ("ACTIVE", "IDLE", "MAINTENANCE", "ERROR", "UNKNOWN")

# Fan-out mapping: raw wide column -> normalized channel descriptor
# (shape of ruuvitag_adapter.py:272-331; measurement_sequence deliberately
# absent — it must not fan out).
SENSOR_MAPPING: dict[str, dict] = {
    "temperature": {"device_type": "temperature_sensor", "unit": "°C", "tags": ["temperature", "climate"]},
    "humidity": {"device_type": "humidity_sensor", "unit": "%", "tags": ["humidity", "climate"]},
    "pressure": {"device_type": "pressure_sensor", "unit": "Pa", "tags": ["pressure", "climate"]},
    "acceleration_x": {"device_type": "acceleration_sensor", "unit": "g", "tags": ["acceleration", "motion"], "metadata": {"axis": "x"}},
    "acceleration_y": {"device_type": "acceleration_sensor", "unit": "g", "tags": ["acceleration", "motion"], "metadata": {"axis": "y"}},
    "acceleration_z": {"device_type": "acceleration_sensor", "unit": "g", "tags": ["acceleration", "motion"], "metadata": {"axis": "z"}},
    "battery_voltage": {"device_type": "battery_sensor", "unit": "V", "tags": ["battery", "power"]},
    "tx_power": {"device_type": "transmit_power_sensor", "unit": "dBm", "tags": ["radio", "power"]},
    "movement_counter": {"device_type": "movement_sensor", "unit": "count", "tags": ["movement", "motion"]},
}

# Per-device-type anomaly thresholds (config.yaml:152-159).
ANOMALY_THRESHOLDS: dict[str, tuple[float, float]] = {
    "temperature_sensor": (-50.0, 50.0),
    "humidity_sensor": (15.0, 100.0),
    "pressure_sensor": (87000.0, 108500.0),
    "battery_sensor": (2.0, float("inf")),  # low-battery alert below 2.0 V
}

# Battery-% calibration (config.py:288-293; ruuvitag_adapter.py:446-468).
BATTERY_MIN_VOLTAGE = 2.0
BATTERY_MAX_VOLTAGE = 3.0
BATTERY_DEAD_VOLTAGE = 1.8

# Static enrichment defaults (config.py:277-315).
DEFAULT_LOCATION = {
    "latitude": 60.1699,
    "longitude": 24.9384,
    "building": "building-1",
    "floor": 1,
    "zone": "main",
    "room": "room-101",
}
DEFAULT_FIRMWARE_VERSION = "3.31.1"
DEFAULT_STATUS = "ACTIVE"

# Timestamps below this are device-uptime-relative, not epoch
# (ruuvitag_adapter.py:424-425).
RELATIVE_TS_CUTOFF = 10_000_000

# Late/future-data clamp window (timescaledb_sink.py:151-160).
CLAMP_WINDOW_HOURS = 24
