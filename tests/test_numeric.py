"""Exactness of the paired-long money aggregation (functions/numeric.py).

split_sum/merge_split must reproduce the exact decimal sum for any mix
of signs and magnitudes within the documented unit bound (< 2^53), with
null handling identical to a decimal SUM.
"""

from __future__ import annotations

from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from metrocloud_data_pipeline_spark.functions.numeric import (
    merge_small,
    merge_split,
    money_units,
    small_units_sum,
    split_sum,
)

# 2-dp money values, mixed signs, spanning the split boundary (1e6 units
# = 10,000.00) by orders of magnitude both ways
_money = st.decimals(
    min_value=Decimal("-99999999.99"),
    max_value=Decimal("99999999.99"),
    places=2,
)


@given(vals=st.lists(_money, min_size=1, max_size=30))
@settings(max_examples=15, deadline=None)
def test_split_sum_equals_decimal_sum(spark, vals):
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    got = (
        df.agg(*split_sum(money_units(F.col("x")), "x"))
        .select(merge_split("x", 2).alias("s"))
        .first()["s"]
    )
    assert got == sum(vals).quantize(Decimal("0.01"))


def test_split_sum_skips_nulls_like_decimal_sum(spark):
    df = spark.createDataFrame([(1.25,), (None,), (2.75,)], "x double")
    got = (
        df.agg(*split_sum(money_units(F.col("x")), "x"))
        .select(merge_split("x", 2).alias("s"))
        .first()["s"]
    )
    assert got == Decimal("4.00")


def test_split_sum_all_null_group_is_null(spark):
    df = spark.createDataFrame([(None,), (None,)], "x double")
    got = (
        df.agg(*split_sum(money_units(F.col("x")), "x"))
        .select(merge_split("x", 2).alias("s"))
        .first()["s"]
    )
    assert got is None


def test_product_units_scale_composition(spark):
    # cents x (100 - cents) = exact 1e-4 units: 19.99 * (1 - 0.05)
    df = spark.createDataFrame([(19.99, 0.05)], "e double, d double")
    u = money_units(F.col("e")) * (F.lit(100) - money_units(F.col("d")))
    got = (
        df.agg(*split_sum(u, "r")).select(merge_split("r", 4).alias("s")).first()["s"]
    )
    assert got == Decimal("18.9905")


def test_small_units_sum_roundtrip(spark):
    df = spark.createDataFrame([(12.5,), (0.25,), (7.0,)], "q double")
    got = (
        df.agg(small_units_sum(money_units(F.col("q")), "q"))
        .select(merge_small("q").alias("s"))
        .first()["s"]
    )
    assert got == Decimal("19.75")
