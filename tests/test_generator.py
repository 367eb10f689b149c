"""Synthetic-generator tests (OP-S6/T8)."""

from __future__ import annotations

from metrocloud_data_pipeline_spark.sources import generator


def test_simulate_readings_shape_and_determinism(spark):
    df = generator.simulate_readings(spark, num_devices=8, readings_per_device=100, seed=42)
    rows = df.collect()
    assert len(rows) == 800
    assert df.select("device_id").distinct().count() == 8
    # deterministic per seed (same values on regeneration)
    again = generator.simulate_readings(spark, num_devices=8, readings_per_device=100, seed=42).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # different seed -> different values
    other = generator.simulate_readings(spark, num_devices=8, readings_per_device=100, seed=7).collect()
    assert sorted(map(tuple, rows)) != sorted(map(tuple, other))


def test_simulate_readings_anomaly_rate_and_domains(spark):
    df = generator.simulate_readings(spark, num_devices=20, readings_per_device=500, anomaly_probability=0.05).cache()
    n = df.count()
    anom = df.where("is_anomaly").count()
    assert 0.03 < anom / n < 0.07  # ~5% injection
    hum = df.where("device_type = 'humidity_sensor' and (value < 0 or value > 100) and not is_anomaly")
    assert hum.count() == 0  # nominal humidity stays in domain
    motion = df.where("device_type = 'motion_sensor'").select("value").distinct().collect()
    assert {r["value"] for r in motion} <= {0.0, 1.0}


def test_simulated_timestamps_cadence(spark):
    df = generator.simulate_readings(spark, num_devices=2, readings_per_device=3, interval_seconds=60)
    ts = sorted(r["timestamp"].isoformat() for r in df.where("device_id = 'sim-000'").collect())
    assert ts == ["2024-01-01T00:00:00", "2024-01-01T00:01:00", "2024-01-01T00:02:00"]


def test_simulate_stream_is_streaming(spark):
    assert generator.simulate_stream(spark).isStreaming
