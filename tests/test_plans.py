"""Physical-plan quality regression tests.

A correct-but-mis-planned query is a failure at 100 TB: these tests pin
the plan properties the engine relies on — filters reaching the parquet
scan, dimension joins broadcasting, no accidental cartesian products —
so a regression shows up here instead of as a silent bench slowdown.
Queries run at sf0.001 (plans are scale-independent; AQE finalizes at
runtime but join strategy hints and pushdown appear in the initial plan).
"""

from __future__ import annotations

import pytest

from metrocloud_data_pipeline_spark.queries import get_queries

SF = "/root/testdata/sf0.001"

# queries that intentionally use a broadcast nested-loop join (single-row
# broadcast anchors / non-equi exact baselines)
BNLJ_OK = {
    "f1_recent_readings",
    "f5_integrity_report",
    "a4_device_stats",
    "a7_type_distribution",
    "a10_realtime_monitor",
    "knn_brute_force",
    "knn_ivf",
    "knn_lsh",
    "dedup_embed_cosine",
    "dedup_embed_cosine_lsh",
    "q2_export_device_range",
}


def _plan(spark, name: str) -> str:
    df = get_queries()[name](spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


@pytest.mark.parametrize(
    "name",
    [
        "h1_pricing_summary",
        "h3_shipping_priority",
        "h5_local_supplier_volume",
        "h6_forecast_revenue",
        "h7_volume_shipping",
        "h10_returned_items",
        "h14_promo_revenue",
        "h18_large_customers",
        "h8_market_share",
        "h9_nation_profit",
        "h13_customer_distribution",
        "h16_supplier_part_counts",
        "h17_small_qty_revenue",
        "h19_disc_revenue",
        "h21_late_suppliers",
        "h22_dormant_customers",
        "a1_device_summary",
        "a2_hourly_aggregates",
        "w1_gap_detection",
        "dedup_exact",
        "t1_unpivot_measures",
    ],
)
def test_no_cartesian_product(spark, name):
    assert "CartesianProduct" not in _plan(spark, name)


@pytest.mark.parametrize("name", ["h1_pricing_summary", "h6_forecast_revenue", "h3_shipping_priority"])
def test_filters_push_to_scan(spark, name):
    plan = _plan(spark, name)
    assert "PushedFilters: [" in plan
    # at least one real pushed predicate (not just the bare header)
    assert any(
        tok in plan for tok in ("GreaterThan", "LessThan", "EqualTo", "IsNotNull")
    ), plan


@pytest.mark.parametrize(
    "name", ["h5_local_supplier_volume", "h7_volume_shipping", "h10_returned_items", "h14_promo_revenue"]
)
def test_dimension_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan or name in ("h7_volume_shipping",), (
        "dimension join fell back to shuffle:\n" + plan
    )


def test_q19_quantity_range_pushes_to_scan(spark):
    # the OR-branches share a l_quantity envelope [1, 30]; that residual
    # range must reach the lineitem parquet scan
    plan = _plan(spark, "h19_disc_revenue")
    scan = plan[plan.index("Scan parquet") :]
    assert "PushedFilters: [" in scan
    assert "l_quantity" in scan[: scan.index("ReadSchema")], plan


def test_q22_uses_anti_join_not_exists(spark):
    plan = _plan(spark, "h22_dormant_customers")
    assert "LeftAnti" in plan, plan


def test_q13_preserves_zero_order_customers(spark):
    plan = _plan(spark, "h13_customer_distribution")
    assert "LeftOuter" in plan, plan


def test_unpivot_needs_no_shuffle(spark):
    plan = _plan(spark, "t1_unpivot_measures")
    assert "Exchange" not in plan  # stack() is a pure projection/generate


def test_media_summary_prunes_payload_column(spark):
    plan = _plan(spark, "media_type_summary")
    # the heavy binary column must not survive into the scan schema
    scan = plan[plan.index("Scan parquet") :]
    read_schema = scan[scan.index("ReadSchema") : scan.index("\n", scan.index("ReadSchema"))]
    assert "text" in read_schema  # payload derives from text here
    assert "payload" not in read_schema


# --- r5 curation queries -----------------------------------------------------


def test_tfidf_reuses_checkpointed_tf(spark):
    """The shared tf subtree must be materialized once: downstream
    consumers read the checkpoint (ExistingRDD) and the only remaining
    file scan is the 1-row doc-count aggregate."""
    plan = _plan(spark, "tfidf_top_terms")
    assert plan.count("Scan ExistingRDD") >= 2, plan
    assert plan.count("Location: InMemoryFileIndex") == 1, plan
    assert "CartesianProduct" not in plan


def test_surprisal_runs_entirely_from_checkpointed_tf(spark):
    """Both the probability table and the per-doc score derive from the
    materialized tf frame — zero parquet scans downstream."""
    plan = _plan(spark, "unigram_surprisal")
    assert plan.count("Location: InMemoryFileIndex") == 0, plan
    assert plan.count("Scan ExistingRDD") >= 2, plan


def test_cross_corpus_dedup_broadcasts_incoming_side(spark):
    """The corpus (100 TB side) must stream against broadcast incoming
    digests — a SortMergeJoin here would shuffle the store."""
    plan = _plan(spark, "dedup_cross_corpus")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, plan


def test_vocab_coverage_uses_topk_not_global_sort(spark):
    plan = _plan(spark, "vocab_coverage")
    assert "TakeOrderedAndProject" in plan, plan
    assert "CartesianProduct" not in plan


def test_funnel_single_scan_no_joins(spark):
    # the funnel must stay one event scan + chained same-key windows:
    # no joins, and the funnel-type filter reaches the parquet scan
    import re

    plan = _plan(spark, "w5_event_funnel")
    assert "Join" not in plan
    # formatted explain prints each operator twice (tree + "(N) Op"
    # detail header); count only the detail headers
    assert len(re.findall(r"^\(\d+\) Scan parquet", plan, re.M)) == 1
    assert "PushedFilters: [In(event_type" in plan or "PushedFilters: [Or(" in plan, plan[
        plan.find("PushedFilters"):plan.find("PushedFilters") + 200
    ]


def test_scd2_merge_broadcasts_updates_no_exchange(spark):
    # dimension rows must never shuffle: every join broadcasts the
    # update batch and the plan carries zero hash exchanges
    plan = _plan(spark, "scd2_customer_dim")
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_retention_single_key_exchange_before_checkpoint(spark):
    # the per-key day-set reduction is the ONLY exchange touching
    # event-derived rows; cohort attach must not rejoin the activity
    # frame (localCheckpoint truncates the visible plan, so build the
    # pre-checkpoint frame directly)
    from pyspark.sql import functions as F

    from metrocloud_data_pipeline_spark.sources import load

    ev = load(spark, SF, "events")
    per_key = (
        ev.select(F.col("user_id").alias("k"), F.to_date("ts").alias("day"))
        .groupBy("k")
        .agg(F.array_sort(F.collect_set("day")).alias("days"))
        .select("k", F.element_at("days", 1).alias("cohort_day"), "days")
    )
    plan = per_key._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    import re

    # detail headers only; the collect_set aggregate plans as
    # ObjectHashAggregate whose exchange prints without its partitioning
    # in the tree line
    assert len(re.findall(r"^\(\d+\) Exchange", plan, re.M)) == 1
    assert "Join" not in plan


def test_top3_per_device_uses_window_group_limit(spark):
    # the rn <= 3 filter must push into the shuffle as a per-partition
    # running top-k (WindowGroupLimit), not sort whole device histories
    df = get_queries()["q3_top3_per_device"](spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
