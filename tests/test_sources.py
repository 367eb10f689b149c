"""Source tests: JSON raw messages (OP-S3), gated Avro IO (OP-S1/S2)."""

from __future__ import annotations

import json

import pytest

from metrocloud_data_pipeline_spark.operators import ingest
from metrocloud_data_pipeline_spark.sources import avro_io, raw_json
from metrocloud_data_pipeline_spark.tests_fixtures import RAW_FIXTURE_ROWS, RAW_FIXTURE_SCHEMA


@pytest.fixture()
def json_dir(spark, tmp_path):
    rows = spark.createDataFrame(RAW_FIXTURE_ROWS, schema=RAW_FIXTURE_SCHEMA).toJSON().collect()
    p = tmp_path / "raw_json"
    p.mkdir()
    (p / "batch1.json").write_text("\n".join(rows[:2]) + "\nnot a json line\n")
    (p / "batch2.json").write_text("\n".join(rows[2:]))
    return str(p)


def test_read_raw_json_parses_and_quarantines(spark, json_dir):
    parsed, corrupt = raw_json.read_raw_json(spark, json_dir)
    assert parsed.count() == len(RAW_FIXTURE_ROWS)
    bad = corrupt.collect()
    assert len(bad) == 1 and "not a json" in bad[0][0]
    # parsed rows feed the same normalize chain as any other source
    valid, _ = ingest.normalize_raw(parsed, anchor="2025-09-26 12:00:00")
    assert valid.count() == 20


def test_stream_raw_json_is_streaming(spark, json_dir):
    assert raw_json.stream_raw_json(spark, json_dir).isStreaming


def test_parse_raw_json_column_roundtrip(spark):
    payload = json.dumps({"device_id": "aa:bb", "device_type": "ruuvitag", "timestamp": "1695715200", "temperature": 21.5})
    df = spark.createDataFrame([(payload,)], "value string")
    out = raw_json.parse_raw_json_column(df).first()
    assert out["device_id"] == "aa:bb"
    assert out["temperature"] == 21.5


def test_avro_schema_shape():
    s = json.loads(avro_io.reading_avro_schema())
    names = {f["name"] for f in s["fields"]}
    assert {"device_id", "device_type", "timestamp", "value", "unit"} <= names


def test_avro_sink_gated_without_package(spark):
    df = spark.createDataFrame([("d1",)], "device_id string")
    try:
        from pyspark.sql.avro.functions import to_avro  # noqa: F401
        from pyspark.sql import functions as F
        spark.range(1).select(to_avro(F.struct("id"))).schema
        loaded = True
    except Exception:
        loaded = False
    if loaded:
        pytest.skip("spark-avro present; gate not exercised")
    with pytest.raises(RuntimeError, match="spark-avro"):
        avro_io.kafka_avro_sink_frame(df)


def _avro_loaded(spark) -> bool:
    try:
        from pyspark.sql.avro.functions import to_avro
        from pyspark.sql import functions as F

        spark.range(1).select(to_avro(F.struct("id"))).schema
        return True
    except Exception:
        return False


def test_avro_wire_roundtrip(spark):
    """Sink frame -> source frame round-trip through the actual Avro
    wire bytes (OP-S1/OP-S2). Auto-skips where spark-avro is absent
    (this container); runs the moment the package is on the classpath,
    covering the serialize/deserialize parity the Kafka path depends
    on without needing a broker."""
    if not _avro_loaded(spark):
        pytest.skip("spark-avro not on the classpath in this environment")
    from metrocloud_data_pipeline_spark import schema as S

    row = {f.name: None for f in S.FLAT_READING_SCHEMA.fields}
    row.update(
        {
            "device_id": "aa:bb:cc",
            "device_type": "ruuvitag",
            "value": 21.5,
            "unit": "celsius",
        }
    )
    readings = spark.createDataFrame([row], S.FLAT_READING_SCHEMA)
    wire = avro_io.kafka_avro_sink_frame(readings)
    assert [f.name for f in wire.schema.fields] == ["key", "value"]
    assert wire.schema["value"].dataType.simpleString() == "binary"
    back = avro_io.kafka_avro_source_frame(wire).first()
    assert back["device_id"] == "aa:bb:cc"
    assert back["value"] == 21.5
    assert back["unit"] == "celsius"


def test_jdbc_sink_gated_without_driver(spark):
    """No JDBC driver jar ships in this container: the builder must fail
    at construction with the deployment hint, not at executor runtime."""
    from metrocloud_data_pipeline_spark.sources import jdbc_io

    df = spark.createDataFrame([("d1",)], "device_id string")
    try:
        spark._jvm.java.lang.Class.forName(jdbc_io.POSTGRES_DRIVER)
        loaded = True
    except Exception:
        loaded = False
    if loaded:
        pytest.skip("postgres driver unexpectedly present")
    with pytest.raises(RuntimeError, match="JDBC driver"):
        jdbc_io.write_jdbc(df, "jdbc:postgresql://localhost/db", "sensor_readings")
    with pytest.raises(RuntimeError, match="JDBC driver"):
        jdbc_io.read_jdbc(spark, "jdbc:postgresql://localhost/db", "sensor_readings")
