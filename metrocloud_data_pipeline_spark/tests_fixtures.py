"""Deterministic raw-gateway fixture rows (FIXTURES.md §1 shape).

A small reference-shaped corpus for the ingest chain: epoch timestamps,
a relative-uptime timestamp, an ISO timestamp, garbage, missing
channels, dead battery, out-of-threshold (anomalous) values, and a row
with a missing device_id (must be rejected).
"""

from __future__ import annotations

from .schema import RAW_RUUVITAG_SCHEMA

__all__ = ["RAW_FIXTURE_ROWS", "RAW_FIXTURE_SCHEMA"]

RAW_FIXTURE_SCHEMA = RAW_RUUVITAG_SCHEMA


def _row(
    device_id,
    timestamp,
    temperature=None,
    humidity=None,
    pressure=None,
    acceleration_x=None,
    acceleration_y=None,
    acceleration_z=None,
    battery_voltage=None,
    tx_power=None,
    movement_counter=None,
    measurement_sequence=None,
):
    return (
        device_id,
        "ruuvitag",
        timestamp,
        temperature,
        humidity,
        pressure,
        acceleration_x,
        acceleration_y,
        acceleration_z,
        battery_voltage,
        tx_power,
        movement_counter,
        measurement_sequence,
    )


RAW_FIXTURE_ROWS = [
    # full message, epoch-seconds timestamp, all 9 channels present
    _row(
        "c6:8d:c6:26:39:a6",
        "1758870000",
        temperature=21.42,
        humidity=38.5,
        pressure=101325.0,
        acceleration_x=0.004,
        acceleration_y=-0.012,
        acceleration_z=1.016,
        battery_voltage=2.91,
        tx_power=4.0,
        movement_counter=17.0,
        measurement_sequence=205.0,
    ),
    # partial message: 3 channels, ISO-8601 timestamp
    _row(
        "d2:5a:11:07:be:ef",
        "2025-09-25T08:30:00Z",
        temperature=-5.25,
        humidity=81.0,
        battery_voltage=2.05,
    ),
    # anomalous values: temp beyond 50, pressure below 87k, dead battery
    _row(
        "aa:bb:cc:dd:ee:01",
        "1758866400",
        temperature=55.3,
        pressure=86500.0,
        battery_voltage=1.75,
        movement_counter=3.0,
    ),
    # relative (uptime) timestamp -> anchored to 'now'
    _row(
        "aa:bb:cc:dd:ee:02",
        "864000",
        temperature=19.0,
        humidity=45.2,
    ),
    # garbage timestamp -> anchored to 'now'
    _row(
        "aa:bb:cc:dd:ee:03",
        "not-a-time",
        pressure=99800.0,
        tx_power=-20.0,
    ),
    # missing device_id -> every fanned-out row must be rejected (OP-T9)
    _row(
        None,
        "1758870000",
        temperature=22.0,
    ),
]
