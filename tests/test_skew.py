"""Salted aggregation / salted join: equivalence with the unsalted plans
on a deliberately skewed dataset (90% of rows share one key)."""

from __future__ import annotations

from pyspark.sql import functions as F

from metrocloud_data_pipeline_spark.operators.skew import salted_agg, salted_join


def _skewed(spark, n=10_000):
    # key 0 holds 90% of rows; values are exact integers so sums are
    # order-independent and the equivalence check is bitwise
    return spark.range(n).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 7).alias("k"),
        (F.col("id") % 1000).alias("v"),
    )


def test_salted_agg_matches_plain_groupby(spark):
    df = _skewed(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"),
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    )
    salted = salted_agg(
        df,
        ["k"],
        {"s": ("sum", "v"), "n": ("count", "*"), "lo": ("min", "v"), "hi": ("max", "v")},
        buckets=8,
    )
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_agg_avg(spark):
    df = _skewed(spark)
    plain = {r.k: r.a for r in df.groupBy("k").agg(F.avg("v").alias("a")).collect()}
    salted = {r.k: r.a for r in salted_agg(df, ["k"], {"a": ("avg", "v")}, buckets=8).collect()}
    assert plain.keys() == salted.keys()
    for k in plain:
        assert abs(plain[k] - salted[k]) < 1e-9


def test_salted_agg_rejects_non_algebraic(spark):
    import pytest

    with pytest.raises(ValueError):
        salted_agg(_skewed(spark), ["k"], {"bad": ("collect_list", "v")})


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim = spark.range(7).select(F.col("id").alias("dk"), (F.col("id") * 100).alias("attr"))
    plain = big.join(dim, big.k == dim.dk).select("k", "v", "attr")
    salted = salted_join(big, dim, "k", "dk", buckets=4).select("k", "v", "attr")
    assert sorted(plain.collect()) == sorted(salted.collect())


def test_salted_join_left_keeps_unmatched(spark):
    big = _skewed(spark).where(F.col("k") >= 5)  # keys 5,6 only
    dim = spark.range(6).select(F.col("id").alias("dk"))  # no 6
    out = salted_join(big, dim, "k", "dk", buckets=4, how="left")
    plain = big.join(dim, big.k == dim.dk, "left")
    assert out.count() == plain.count()
    assert out.where(F.col("dk").isNull()).count() == plain.where(F.col("dk").isNull()).count()
