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


def _avro_jvm_available(spark) -> bool:
    try:
        from pyspark.sql.avro.functions import to_avro

        spark.range(1).select(to_avro(F.struct("id"))).schema
        return True
    except Exception:  # pragma: no cover - depends on deployment
        return False


def _resolve_engine(spark, engine: str) -> str:
    if engine == "auto":
        return "jvm" if _avro_jvm_available(spark) else "python"
    if engine not in ("jvm", "python"):
        raise ValueError(f"engine must be auto|jvm|python, got {engine!r}")
    return engine


def kafka_avro_sink_frame(readings: DataFrame, engine: str = "auto") -> DataFrame:
    """Readings -> (key, value) frame for a Kafka writer: Avro-serialized
    value, device_id key (per-device partition ordering, producer.py
    :156-158). Append `.write/.writeStream.format("kafka")` + broker
    options in deployment.

    engine: 'jvm' = spark-avro's to_avro (codegen, the fast path where
    the package is on the classpath); 'python' = the spec-implemented
    Arrow-batched codec in avro_codec.py — byte-compatible wire format,
    chosen automatically when the jar is absent. The reference itself
    serializes Avro in Python (confluent-kafka, producer.py:147-214),
    so the fallback is the reference's own shape, Arrow-batched."""
    engine = _resolve_engine(readings.sparkSession, engine)
    if engine == "jvm":
        _require_avro(readings.sparkSession)
        from pyspark.sql.avro.functions import to_avro

        cols = [f.name for f in readings.schema.fields]
        return readings.select(
            F.col("device_id").cast("string").alias("key"),
            to_avro(F.struct(*cols), reading_avro_schema()).alias("value"),
        )

    from . import avro_codec

    schema = avro_codec.parse_schema(reading_avro_schema())
    cols = [f.name for f in readings.schema.fields]
    ts_cols = {
        f.name
        for f in readings.schema.fields
        if f.dataType.simpleString().startswith("timestamp")
    }
    # Arrow hands mapInPandas NAIVE wall-clock values in the SESSION
    # timezone; Avro timestamp-micros is epoch-UTC. Localize+convert so
    # the wire bytes match JVM to_avro under ANY session timezone (a
    # bare .value read would skew by the UTC offset; the decode side
    # mirrors the conversion back).
    session_tz = readings.sparkSession.conf.get("spark.sql.session.timeZone")

    def _serialize(batches):
        import numpy as np
        import pandas as pd

        for pdf in batches:
            keys, vals = [], []
            for row in pdf.to_dict("records"):
                rec = {}
                for c in cols:
                    v = row.get(c)
                    if isinstance(v, np.ndarray):
                        v = list(v)
                    elif not isinstance(v, (list, dict)) and pd.isna(v):
                        v = None
                    elif c in ts_cols:
                        ts = pd.Timestamp(v)
                        if ts.tz is None:
                            # DST edge parity with the JVM resolver
                            # (java.time): fall-back overlaps take the
                            # EARLIER offset (summer time), spring-
                            # forward gaps shift forward — pandas'
                            # default ambiguous='raise' would instead
                            # kill the job on a perfectly valid instant
                            ts = ts.tz_localize(
                                session_tz,
                                ambiguous=True,
                                nonexistent="shift_forward",
                            )
                        v = ts.tz_convert("UTC").value // 1000  # ns -> micros
                    elif isinstance(v, (np.integer,)):
                        v = int(v)
                    elif isinstance(v, (np.floating,)):
                        v = float(v)
                    rec[c] = v
                keys.append(rec.get("device_id"))
                vals.append(avro_codec.encode_record(schema, rec))
            yield pd.DataFrame({"key": keys, "value": vals})

    return readings.mapInPandas(_serialize, "key string, value binary")


def kafka_avro_source_frame(kafka_frame: DataFrame, engine: str = "auto") -> DataFrame:
    """(key, value) Kafka frame -> typed readings via from_avro (the
    consumer's deserialize step, schema_registry.py:337-357). Same
    engine contract as kafka_avro_sink_frame; both engines read the
    identical wire bytes."""
    engine = _resolve_engine(kafka_frame.sparkSession, engine)
    if engine == "jvm":
        _require_avro(kafka_frame.sparkSession)
        from pyspark.sql.avro.functions import from_avro

        return kafka_frame.select(
            from_avro(F.col("value"), reading_avro_schema()).alias("r")
        ).select("r.*")

    from . import avro_codec

    schema = avro_codec.parse_schema(reading_avro_schema())
    flat = S.FLAT_READING_SCHEMA
    ts_cols = {
        f.name for f in flat.fields if f.dataType.simpleString().startswith("timestamp")
    }
    # mirror of the sink's conversion: wire micros are epoch-UTC, and
    # the naive datetimes handed back through Arrow are interpreted as
    # session-timezone wall clock — convert UTC -> session tz first so
    # the round-trip is the identity under any session timezone
    session_tz = kafka_frame.sparkSession.conf.get("spark.sql.session.timeZone")

    def _deserialize(batches):
        import pandas as pd

        for pdf in batches:
            recs = []
            for v in pdf["value"]:
                rec = avro_codec.decode_record(schema, bytes(v))
                for c in ts_cols:
                    if rec.get(c) is not None:
                        rec[c] = (
                            pd.Timestamp(rec[c], unit="us", tz="UTC")
                            .tz_convert(session_tz)
                            .tz_localize(None)
                            .to_pydatetime()
                        )
                recs.append(rec)
            yield pd.DataFrame(
                recs, columns=[f.name for f in flat.fields], dtype=object
            )

    return kafka_frame.mapInPandas(_deserialize, flat)
