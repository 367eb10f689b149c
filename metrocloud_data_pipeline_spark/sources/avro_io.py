"""Kafka/Avro source+sink builders — OP-S1/OP-S2 (consumer.py:172-309,
producer.py:147-214).

The reference moves Avro-framed records through Kafka, keyed by
device_id for per-device ordering. These builders produce the exact
Spark equivalent (readStream kafka + from_avro / to_avro + key column);
both the Kafka broker and the spark-avro package are deployment
dependencies, so construction is gated behind a capability check that
raises a clear error in environments without them (this container has
neither — the JSON/file sources cover the test path).
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .. import schema as S


def _require_avro(spark) -> None:
    try:
        from pyspark.sql.avro.functions import to_avro  # noqa: F401

        spark.range(1).select(to_avro(F.struct("id"))).schema  # forces resolution
    except Exception as ex:  # pragma: no cover - depends on deployment
        raise RuntimeError(
            "spark-avro is not loaded in this session; start Spark with "
            "--packages org.apache.spark:spark-avro_2.13:<spark-version> "
            "to use the Kafka/Avro source and sink"
        ) from ex


def reading_avro_schema() -> str:
    """Avro schema JSON for the flat sensor-reading record (the engine's
    wire shape; the reference's .avsc nests location, which OP-T2
    flattens at storage — we serialize the flat storage shape)."""
    fields = [
        {"name": f.name, "type": ["null", _avro_type(f.dataType.simpleString())]}
        for f in S.FLAT_READING_SCHEMA.fields
    ]
    return json.dumps({"type": "record", "name": "SensorReadingFlat", "fields": fields})


def _avro_type(spark_type: str) -> object:
    return {
        "string": "string",
        "double": "double",
        "float": "float",
        "bigint": "long",
        "int": "int",
        "boolean": "boolean",
        "timestamp": {"type": "long", "logicalType": "timestamp-micros"},
        "map<string,string>": {"type": "map", "values": ["null", "string"]},
        "array<string>": {"type": "array", "items": "string"},
    }.get(spark_type, "string")


def kafka_avro_sink_frame(readings: DataFrame) -> DataFrame:
    """Readings -> (key, value) frame for a Kafka writer: Avro-serialized
    value, device_id key (per-device partition ordering, producer.py
    :156-158). Append `.write/.writeStream.format("kafka")` + broker
    options in deployment."""
    _require_avro(readings.sparkSession)
    from pyspark.sql.avro.functions import to_avro

    cols = [f.name for f in readings.schema.fields]
    return readings.select(
        F.col("device_id").cast("string").alias("key"),
        to_avro(F.struct(*cols), reading_avro_schema()).alias("value"),
    )


def kafka_avro_source_frame(kafka_frame: DataFrame) -> DataFrame:
    """(key, value) Kafka frame -> typed readings via from_avro (the
    consumer's deserialize step, schema_registry.py:337-357)."""
    _require_avro(kafka_frame.sparkSession)
    from pyspark.sql.avro.functions import from_avro

    return kafka_frame.select(from_avro(F.col("value"), reading_avro_schema()).alias("r")).select("r.*")
