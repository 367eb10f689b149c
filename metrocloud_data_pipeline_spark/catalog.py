"""SQL catalog: the reference's view layer as Spark temp views.

The reference exposes its analytics surface as SQL views and
continuous aggregates over sensor_readings (database/init.sql:149-209,
324-368); users query them by name. register_views replays that
catalog on a SparkSession so the same queries run via spark.sql:

    register_views(spark, "/root/testdata/sf0.01")
    spark.sql("SELECT * FROM device_summary ORDER BY reading_count DESC")

Views are lazy logical plans — Catalyst inlines them into each query,
so filter pushdown/pruning still reach the parquet scan (a view is not
a materialization barrier). The hourly/daily aggregate views stand in
for both the plain views (init.sql:179-209) and the continuous
aggregates (init.sql:324-368); the incrementally-maintained variant is
operators/maintenance.refresh_bucket_aggregate.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import ArrayType, DataType, MapType, StructType

from .operators import analytics as A
from .queries import readings

VIEW_NAMES = [
    "sensor_readings",
    "recent_sensor_readings",
    "anomalous_sensor_readings",
    "device_summary",
    "hourly_sensor_aggregates",
    "daily_sensor_aggregates",
]


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Create the init.sql-shaped temp-view catalog over sf_dir's tables.

    Returns the view names registered. sensor_readings is the canonical
    readings mapping of the events table (FIXTURES.md §4) with the
    OP-T7 anomaly flag; the rest mirror database/init.sql:149-209."""
    r = readings(spark, sf_dir)
    r.createOrReplaceTempView("sensor_readings")
    A.recent_readings(r).createOrReplaceTempView("recent_sensor_readings")
    A.anomalous_readings(r).createOrReplaceTempView("anomalous_sensor_readings")
    A.device_summary(r).createOrReplaceTempView("device_summary")
    A.bucket_aggregates(r, "1 hour").createOrReplaceTempView("hourly_sensor_aggregates")
    A.bucket_aggregates(r, "1 day", with_first=True).createOrReplaceTempView(
        "daily_sensor_aggregates"
    )
    return list(VIEW_NAMES)


# --- Schema evolution: BACKWARD compatibility -------------------------------
#
# The reference registers every wire schema with a Schema Registry running in
# BACKWARD mode (schema_registry.py:154-203 registration path;
# config/config.py:337-340 sets compatibility_level="BACKWARD") and lets the
# Registry service reject incompatible evolutions. This engine's storage is
# parquet + Spark schemas, so the same gate is a local check over StructTypes
# with standard BACKWARD semantics — "the NEW (reader) schema can read every
# record written under the OLD (writer) schema":
#
# - a field removed in NEW: fine (readers ignore unknown writer fields);
# - a field added in NEW: must be nullable (its default fills old records);
# - a field in both: same type, a sanctioned numeric/type widening, or a
#   recursively-compatible struct/array/map — and a field that was nullable
#   in OLD may not become non-nullable in NEW (old nulls would be unreadable).

# Sanctioned widenings = the evolutions Spark's parquet reader can
# ACTUALLY perform when reading old files under the new schema — each
# entry is pinned by a real write-old/read-new round-trip in
# tests/test_catalog.py. Avro-style registries also sanction
# bigint -> double and date -> timestamp, but this engine's storage is
# parquet and Spark's vectorized reader REFUSES both
# (PARQUET_COLUMN_DATA_TYPE_MISMATCH, measured on 4.1 — r12): listing
# them here would let the gate accept an evolution whose history
# becomes unreadable, the exact failure the gate exists to prevent.
_WIDENINGS = {
    ("int", "bigint"),
    ("int", "double"),
    ("float", "double"),
    ("tinyint", "smallint"),
    ("tinyint", "int"),
    ("tinyint", "bigint"),
    ("smallint", "int"),
    ("smallint", "bigint"),
}


def _type_compatible(old: DataType, new: DataType, path: str, errors: list[str]) -> None:
    if isinstance(old, StructType) and isinstance(new, StructType):
        _struct_compatible(old, new, path + ".", errors)
        return
    if isinstance(old, ArrayType) and isinstance(new, ArrayType):
        _type_compatible(old.elementType, new.elementType, path + "[]", errors)
        if old.containsNull and not new.containsNull:
            errors.append(f"{path}[]: element nullability tightened")
        return
    if isinstance(old, MapType) and isinstance(new, MapType):
        _type_compatible(old.keyType, new.keyType, path + "<key>", errors)
        _type_compatible(old.valueType, new.valueType, path + "<value>", errors)
        if old.valueContainsNull and not new.valueContainsNull:
            errors.append(f"{path}<value>: value nullability tightened")
        return
    o, n = old.simpleString(), new.simpleString()
    if o != n and (o, n) not in _WIDENINGS:
        errors.append(f"{path}: type changed {o} -> {n} (not a sanctioned widening)")


def _struct_compatible(old: StructType, new: StructType, prefix: str, errors: list[str]) -> None:
    old_fields = {f.name: f for f in old.fields}
    for f in new.fields:
        path = prefix + f.name
        prev = old_fields.get(f.name)
        if prev is None:
            if not f.nullable:
                errors.append(f"{path}: added as non-nullable (old records have no value for it)")
            continue
        if prev.nullable and not f.nullable:
            errors.append(f"{path}: nullability tightened (old records may hold null)")
        _type_compatible(prev.dataType, f.dataType, path, errors)


def backward_incompatibilities(old: StructType, new: StructType) -> list[str]:
    """All BACKWARD-compat violations of evolving writer schema `old` to
    reader schema `new`; empty list == compatible."""
    errors: list[str] = []
    _struct_compatible(old, new, "", errors)
    return errors


def assert_backward_compatible(old: StructType, new: StructType) -> None:
    """The Registry's BACKWARD gate as a local assertion: raise ValueError
    listing every violation if `new` cannot read data written under `old`."""
    errors = backward_incompatibilities(old, new)
    if errors:
        raise ValueError(
            "schema evolution is not BACKWARD compatible: " + "; ".join(errors)
        )


def forward_incompatibilities(old: StructType, new: StructType) -> list[str]:
    """FORWARD violations of evolving writer schema `old` to `new`:
    every OLD reader must be able to read records written under NEW —
    exactly the BACKWARD relation with the roles swapped (writer=new,
    reader=old). Asymmetry examples: adding a non-nullable field is
    FORWARD-fine (old readers ignore it) but BACKWARD-broken; widening
    int -> bigint is BACKWARD-fine but FORWARD-broken (old readers
    can't hold the wider values)."""
    return backward_incompatibilities(new, old)


def full_incompatibilities(old: StructType, new: StructType) -> list[str]:
    """FULL = BACKWARD and FORWARD both hold (readers and writers on
    either schema interoperate)."""
    return [f"backward: {e}" for e in backward_incompatibilities(old, new)] + [
        f"forward: {e}" for e in forward_incompatibilities(old, new)
    ]


_COMPAT_CHECKS = {
    "BACKWARD": lambda hist, new: backward_incompatibilities(hist[-1], new),
    "FORWARD": lambda hist, new: forward_incompatibilities(hist[-1], new),
    "FULL": lambda hist, new: full_incompatibilities(hist[-1], new),
    "BACKWARD_TRANSITIVE": lambda hist, new: [
        e for old in hist for e in backward_incompatibilities(old, new)
    ],
    "FORWARD_TRANSITIVE": lambda hist, new: [
        e for old in hist for e in forward_incompatibilities(old, new)
    ],
    "FULL_TRANSITIVE": lambda hist, new: [
        e for old in hist for e in full_incompatibilities(old, new)
    ],
    "NONE": lambda hist, new: [],
}


def check_compatibility(
    mode: str, history: list[StructType], new: StructType
) -> list[str]:
    """The Schema Registry's full compatibility matrix as a local check
    (the reference's compatibility_level is configurable to any of
    these, config.py:324-340; it deploys BACKWARD): non-transitive
    modes gate against the LATEST registered schema, _TRANSITIVE modes
    against every schema in the subject's history. Returns the
    violation list (empty == the evolution is accepted)."""
    mode = mode.upper()
    if mode not in _COMPAT_CHECKS:
        raise ValueError(
            f"unknown compatibility mode {mode!r}; expected one of {sorted(_COMPAT_CHECKS)}"
        )
    if not history:
        return []
    return _COMPAT_CHECKS[mode](history, new)
