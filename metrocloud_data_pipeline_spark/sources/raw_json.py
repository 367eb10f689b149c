"""Raw-message JSON sources — OP-S3 (ruuvitag_adapter.py:127-226).

The reference receives one JSON object per RuuviTag over MQTT and
`json.loads`es it. The engine equivalent is a schema'd JSON source —
batch and streaming read the same files with the same schema, so the
normalize chain downstream is identical.

At scale: an explicit schema (never inferSchema) keeps the read a
single pass, lets the JSON scanner prune unreferenced fields, and makes
corrupt records visible instead of silently re-typing columns —
_corrupt_record capture gives the rejects stream its raw-parse tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from .. import schema as S

_CORRUPT_COL = "_corrupt_record"


def _schema_with_corrupt() -> StructType:
    return StructType([*S.RAW_RUUVITAG_SCHEMA.fields, StructField(_CORRUPT_COL, StringType())])


def read_raw_json(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """Batch JSON-lines read -> (parsed, corrupt) frames.

    PERMISSIVE mode + _corrupt_record: malformed lines survive as raw
    text for the quarantine output instead of failing the job."""
    df = (
        spark.read.schema(_schema_with_corrupt())
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", _CORRUPT_COL)
        .json(path)
    ).cache()  # single pass; corrupt-record column cannot be filtered from an un-materialized scan
    parsed = df.where(F.col(_CORRUPT_COL).isNull()).drop(_CORRUPT_COL)
    corrupt = df.where(F.col(_CORRUPT_COL).isNotNull()).select(_CORRUPT_COL)
    return parsed, corrupt


def stream_raw_json(spark: SparkSession, path: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """Streaming JSON-lines source with the raw schema (the MQTT stand-in;
    swap for a Kafka reader + from_json(value) in a broker deployment)."""
    reader = spark.readStream.schema(S.RAW_RUUVITAG_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.json(path)


def parse_raw_json_column(df: DataFrame, json_col: str = "value") -> DataFrame:
    """from_json over a string column (the exact Kafka/MQTT payload shape):
    value bytes -> struct -> flattened raw columns."""
    return df.select(
        F.from_json(F.col(json_col).cast("string"), S.RAW_RUUVITAG_SCHEMA).alias("r")
    ).select("r.*")
