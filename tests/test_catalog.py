"""SQL catalog: init.sql-shaped views queryable through spark.sql."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrocloud_data_pipeline_spark.catalog import VIEW_NAMES, register_views
from metrocloud_data_pipeline_spark.operators import analytics as A
from metrocloud_data_pipeline_spark.queries import readings

SF = "/root/testdata/sf0.001"


def test_register_views_creates_all(spark):
    names = register_views(spark, SF)
    assert names == VIEW_NAMES
    for n in names:
        assert spark.catalog.tableExists(n), n


def test_sql_device_summary_matches_builder(spark):
    register_views(spark, SF)
    via_sql = spark.sql(
        "SELECT device_id, reading_count FROM device_summary"
    ).collect()
    via_builder = (
        A.device_summary(readings(spark, SF)).select("device_id", "reading_count").collect()
    )
    assert sorted(via_sql) == sorted(via_builder)


def test_sql_query_over_view_composes(spark):
    register_views(spark, SF)
    row = spark.sql(
        """
        SELECT count(*) AS n FROM anomalous_sensor_readings
        WHERE device_type = 'click'
        """
    ).first()
    expected = (
        A.anomalous_readings(readings(spark, SF))
        .where(F.col("device_type") == "click")
        .count()
    )
    assert row.n == expected


def test_view_is_not_a_pushdown_barrier(spark):
    register_views(spark, SF)
    df = spark.sql("SELECT reading_id FROM sensor_readings WHERE device_id = 7")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    # the device filter must reach the parquet scan through the view
    assert "PushedFilters: [" in plan
    assert "user_id" in plan[plan.index("PushedFilters") :].split("]")[0], plan


# --- schema evolution: BACKWARD compatibility (Registry-mode gate) ----------

from pyspark.sql.types import (  # noqa: E402
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from metrocloud_data_pipeline_spark.catalog import (  # noqa: E402
    assert_backward_compatible,
    backward_incompatibilities,
)

BASE = StructType(
    [
        StructField("device_id", StringType(), nullable=False),
        StructField("value", FloatType(), nullable=True),
        StructField("battery_level", IntegerType(), nullable=True),
        StructField("tags", ArrayType(StringType(), containsNull=True), nullable=True),
        StructField("device_metadata", MapType(StringType(), StringType(), True), nullable=True),
    ]
)


def _evolved(**replace):
    fields = [replace.get(f.name, f) for f in BASE.fields if replace.get(f.name, f) is not None]
    extra = [v for k, v in replace.items() if k.startswith("+")]
    return StructType(fields + extra)


def test_add_nullable_field_is_backward_compatible():
    new = _evolved(**{"+fw": StructField("firmware_version", StringType(), nullable=True)})
    assert_backward_compatible(BASE, new)  # must not raise


def test_drop_field_is_backward_compatible():
    new = _evolved(battery_level=None)
    assert_backward_compatible(BASE, new)


def test_numeric_widening_is_backward_compatible():
    new = _evolved(
        value=StructField("value", DoubleType(), nullable=True),
        battery_level=StructField("battery_level", LongType(), nullable=True),
    )
    assert_backward_compatible(BASE, new)


def test_add_required_field_is_rejected():
    new = _evolved(**{"+sig": StructField("signal_strength", IntegerType(), nullable=False)})
    errs = backward_incompatibilities(BASE, new)
    assert errs and "signal_strength" in errs[0] and "non-nullable" in errs[0]


def test_type_narrowing_is_rejected():
    new = _evolved(value=StructField("value", IntegerType(), nullable=True))
    errs = backward_incompatibilities(BASE, new)
    assert errs and "float -> int" in errs[0]


def test_nullability_tightening_is_rejected():
    new = _evolved(value=StructField("value", FloatType(), nullable=False))
    assert any("nullability tightened" in e for e in backward_incompatibilities(BASE, new))


def test_nested_map_value_change_is_rejected():
    new = _evolved(
        device_metadata=StructField(
            "device_metadata", MapType(StringType(), IntegerType(), True), nullable=True
        )
    )
    errs = backward_incompatibilities(BASE, new)
    assert any("device_metadata<value>" in e for e in errs)


def test_forward_and_full_asymmetries():
    from metrocloud_data_pipeline_spark.catalog import (
        check_compatibility,
        forward_incompatibilities,
        full_incompatibilities,
    )

    # adding a NON-nullable field: FORWARD-fine (old readers ignore it),
    # BACKWARD-broken (old records have no value)
    add_req = _evolved(**{"+v2": StructField("v2", StringType(), nullable=False)})
    assert forward_incompatibilities(BASE, add_req) == []
    assert backward_incompatibilities(BASE, add_req)
    # widening float -> double: BACKWARD-fine, FORWARD-broken
    widened = _evolved(value=StructField("value", DoubleType(), nullable=True))
    assert backward_incompatibilities(BASE, widened) == []
    assert any("double -> float" in e for e in forward_incompatibilities(BASE, widened))
    # FULL demands both directions
    errs = full_incompatibilities(BASE, widened)
    assert errs and all(e.startswith("forward:") for e in errs)
    # dropping a nullable field is FULL-compatible both ways
    dropped = _evolved(tags=None)
    assert full_incompatibilities(BASE, dropped) == []
    assert check_compatibility("FULL", [BASE], dropped) == []


def test_transitive_modes_gate_against_whole_history():
    from metrocloud_data_pipeline_spark.catalog import check_compatibility

    v2 = _evolved(**{"+fw": StructField("firmware_version", StringType(), nullable=True)})
    # v3 drops a field v1 still carries nullable -> BACKWARD ok vs both
    v3 = StructType([f for f in v2.fields if f.name != "tags"])
    assert check_compatibility("BACKWARD", [BASE, v2], v3) == []
    assert check_compatibility("BACKWARD_TRANSITIVE", [BASE, v2], v3) == []
    # narrowing int -> float? use a type change incompatible with v1 only:
    # v2b widens battery int->bigint; v3b keeps bigint (ok vs v2b) but is
    # transitively still fine; instead make v3c re-narrow to int:
    v2b = _evolved(battery_level=StructField("battery_level", LongType(), nullable=True))
    v3c = _evolved(battery_level=StructField("battery_level", IntegerType(), nullable=True))
    # vs latest (v2b) the narrowing bigint->int fails; vs BASE it's identity
    assert check_compatibility("BACKWARD", [BASE, v2b], v3c)
    assert check_compatibility("BACKWARD_TRANSITIVE", [BASE, v2b], v3c)
    # unknown modes fail loudly; empty history is vacuously accepted
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown compatibility mode"):
        check_compatibility("SIDEWAYS", [BASE], v2)
    assert check_compatibility("FULL_TRANSITIVE", [], v2) == []


def test_every_sanctioned_widening_is_actually_parquet_readable(spark, tmp_path):
    """The gate's ground truth (r12): for EVERY (old, new) pair in
    _WIDENINGS, parquet written under old must be READABLE by Spark
    under new — otherwise the gate would accept an evolution whose
    history becomes unreadable, the exact failure it exists to
    prevent. This found two overclaims inherited from Avro-registry
    semantics: bigint -> double and date -> timestamp both throw
    PARQUET_COLUMN_DATA_TYPE_MISMATCH in Spark's reader and were
    removed from the table; both are asserted REJECTED below so they
    cannot quietly return."""
    import datetime

    from pyspark.sql.types import (
        ByteType,
        DateType,
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StructField,
        StructType,
        TimestampType,
    )

    from metrocloud_data_pipeline_spark.catalog import (
        _WIDENINGS,
        backward_incompatibilities,
    )

    types = {
        "tinyint": (ByteType(), 7),
        "smallint": (ShortType(), 7),
        "int": (IntegerType(), 7),
        "bigint": (LongType(), 7),
        "float": (FloatType(), 1.5),
        "double": (DoubleType(), 1.5),
        "date": (DateType(), datetime.date(2026, 1, 2)),
        "timestamp": (TimestampType(), datetime.datetime(2026, 1, 2, 3, 4)),
    }
    for i, (o_name, n_name) in enumerate(sorted(_WIDENINGS)):
        o_type, val = types[o_name]
        n_type, _ = types[n_name]
        old = StructType([StructField("x", o_type, True)])
        new = StructType([StructField("x", n_type, True)])
        assert backward_incompatibilities(old, new) == []
        d = str(tmp_path / f"w{i}")
        spark.createDataFrame([(val,), (None,)], old).write.parquet(d)
        rows = spark.read.schema(new).parquet(d).collect()
        got = sorted((r.x for r in rows), key=lambda v: (v is None, v))
        assert got[1] is None and got[0] is not None, (o_name, n_name, got)

    # the two measured overclaims stay rejected
    for o_name, n_name in (("bigint", "double"), ("date", "timestamp")):
        old = StructType([StructField("x", types[o_name][0], True)])
        new = StructType([StructField("x", types[n_name][0], True)])
        errs = backward_incompatibilities(old, new)
        assert errs and "not a sanctioned widening" in errs[0], (o_name, n_name)
