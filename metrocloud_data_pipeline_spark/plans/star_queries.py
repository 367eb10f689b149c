"""Join/aggregation workload over the TPC-H-ish star schema.

The reference's own query surface has no multi-table joins (its one
table is sensor_readings); these queries exercise the engine's join
planning at bench scale, TPC-H-style, adapted to the driver's slimmer
schemas (TESTDATA.md).

Scale design:
- Dimension tables (region, nation, customer, supplier, part) broadcast —
  every join below is a broadcast hash join except lineitem⋈orders,
  which shuffles on the orderkey; AQE coalesces/skew-splits at runtime.
- Money aggregates are EXACT and order-independent (double summation is
  not associative — at 100 TB the partial-aggregate tree makes double
  sums nondeterministic run-to-run), but they do NOT pay Spark's
  decimal-aggregation tax: fixed-point measures sum as paired long
  integers inside whole-stage codegen and reassemble into the exact
  DECIMAL once per group (functions/numeric.py split_sum — measured
  2.4x on Q1 vs the all-DECIMAL aggregate, value-identical). Most
  queries present the FINAL value as double (both engines correctly-
  round the same exact sum, so that is bitwise deterministic); the four
  largest-magnitude reports (pricing_summary, nation_profit,
  large_volume_customers, brand_revenue) keep the DECIMAL type all the
  way out and the query layer renders it as a fixed-scale string, so no
  float representation exists anywhere for a downstream canonicalizer
  to lose precision on.
- Filters sit directly on scan columns so they push down to parquet
  (check .explain: PushedFilters on l_shipdate / o_orderdate / segment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.numeric import (
    merge_small,
    merge_split,
    money_units,
    round6,
    small_units_sum,
    split_sum,
)

def _revenue_u() -> F.Column:
    """The revenue term l_extendedprice * (1 - l_discount) as exact
    1e-4-unit integers: cents(price) x (100 - cents(discount)). Exactly
    the 4-decimal product (equal to summing it as DECIMAL(18,4)), but
    sums as paired longs inside codegen instead of per-row decimal
    adds — see functions/numeric.py split_sum."""
    return money_units(F.col("l_extendedprice")) * (
        F.lit(100) - money_units(F.col("l_discount"))
    )


def pricing_summary(lineitem: DataFrame, ship_cutoff: str = "2000-12-01") -> DataFrame:
    """TPC-H Q1: pricing summary report over lineitem up to a ship date.

    Pure scan->partial agg->final agg: the shipdate filter pushes to
    parquet; group keys (returnflag, linestatus) have cardinality 6 so
    the shuffle is tiny regardless of input size.

    Exactness without decimal-aggregate cost: price/discount/tax carry
    2 decimals each, so the revenue and charge products have exactly 4
    and 6 true decimals — integer unit values that sum as paired longs
    (functions/numeric.py split_sum) entirely inside codegen, with the
    exact DECIMAL reassembled once per group. Value-identical to the
    previous all-DECIMAL aggregate (verified row-for-row at sf0.1) and
    measured 2.4x faster (0.69 s vs 1.67 s); the avgs derive from the
    exact sums, so they too are partition-order independent."""
    e_c = money_units(F.col("l_extendedprice"))           # cents
    d_c = money_units(F.col("l_discount"))                # cents, 0..10
    t_c = money_units(F.col("l_tax"))                     # cents, 0..8
    disc_price_u = e_c * (100 - d_c)                      # 1e-4 units
    charge_u = disc_price_u * (100 + t_c)                 # 1e-6 units, < 2^53
    agged = (
        lineitem.where(F.col("l_shipdate") <= F.lit(ship_cutoff).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            small_units_sum(money_units(F.col("l_quantity")), "qty"),
            *split_sum(e_c, "base"),
            *split_sum(disc_price_u, "dp"),
            *split_sum(charge_u, "ch"),
            small_units_sum(d_c, "disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
    n = F.col("count_order")
    return agged.select(
        "l_returnflag",
        "l_linestatus",
        merge_small("qty").alias("sum_qty"),
        merge_split("base", 2).alias("sum_base_price"),
        merge_split("dp", 4).alias("sum_disc_price"),
        merge_split("ch", 6).alias("sum_charge"),
        round6(merge_small("qty").cast("double") / n).alias("avg_qty"),
        round6(merge_split("base", 2).cast("double") / n).alias("avg_price"),
        round6(merge_small("disc").cast("double") / n).alias("avg_disc"),
        "count_order",
    )


def shipping_priority(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    segment: str = "BUILDING",
    cut: str = "1998-01-01",
    n: int = 10,
) -> DataFrame:
    """TPC-H Q3 (adapted): top unshipped orders by revenue.

    customer is broadcast into orders; the surviving orders broadcast
    into lineitem when small enough (AQE decides), else shuffle on
    orderkey."""
    cust = customer.where(F.col("c_mktsegment") == segment).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < F.lit(cut).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    li = lineitem.where(F.col("l_shipdate") > F.lit(cut).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(F.broadcast(cust), ords.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(*split_sum(_revenue_u(), "rev"))
        .select("l_orderkey", "o_orderdate", merge_split("rev", 4).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(n)
    )


def order_priority_count(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-07-01",
    late_days: int = 60,
) -> DataFrame:
    """TPC-H Q4 (adapted): orders per priority having at least one line
    shipped > late_days after the order date (EXISTS -> left-semi join)."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    )
    li = lineitem.select("l_orderkey", "l_shipdate")
    late = ords.join(
        li,
        (ords.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


def local_supplier_volume(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
    start: str = "1996-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 (adapted): revenue by nation where customer and supplier
    share the nation, one region, one order-date year.

    All dimensions broadcast; the only shuffle is lineitem⋈orders on
    orderkey + the final small aggregation."""
    nat = (
        nation.join(F.broadcast(region.where(F.col("r_name") == region_name)), nation.n_regionkey == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    cust = customer.join(F.broadcast(nat), customer.c_nationkey == nat.n_nationkey).select(
        "c_custkey", F.col("c_nationkey")
    )
    supp = supplier.join(F.broadcast(nat), supplier.s_nationkey == nat.n_nationkey).select(
        "s_suppkey", "s_nationkey", "n_name"
    )
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), (F.col("l_suppkey") == supp.s_suppkey) & (F.col("c_nationkey") == supp.s_nationkey))
        .groupBy("n_name")
        .agg(*split_sum(_revenue_u(), "rev"))
        .select("n_name", merge_split("rev", 4).cast("double").alias("revenue"))
    )


def returned_item_ranking(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
    n: int = 20,
) -> DataFrame:
    """TPC-H Q10 (adapted): customers ranked by lost revenue on returned
    items (l_returnflag = 'R')."""
    li = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(F.broadcast(customer.select("c_custkey", "c_name", "c_nationkey", "c_acctbal")), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(*split_sum(_revenue_u(), "rev"))
        .select(
            "c_custkey", "c_name", "n_name",
            merge_split("rev", 4).cast("double").alias("revenue"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(n)
    )


def brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Revenue and volume per part brand (broadcast join to the part dim)."""
    return (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
        .join(F.broadcast(part.select("p_partkey", "p_brand")), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            *split_sum(_revenue_u(), "rev"),
            small_units_sum(money_units(F.col("l_quantity")), "qty"),
            F.count(F.lit(1)).alias("line_count"),
        )
        .select(
            "p_brand",
            merge_split("rev", 4).alias("revenue"),
            merge_small("qty").alias("total_qty"),
            "line_count",
        )
    )


def unpivot_lineitem_measures(lineitem: DataFrame) -> DataFrame:
    """OP-T1's unpivot shape at star-schema scale: wide measures -> long
    (measure, value) rows via a stack generator — single projection, no
    shuffle, no UDF (same primitive as the sensor fan-out)."""
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'extendedprice', l_extendedprice, "
            "'discount', l_discount) AS (measure, measure_value)"
        ),
    )


def forecast_revenue_change(
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    disc_lo: float = 0.05,
    disc_hi: float = 0.07,
    qty_max: float = 24.0,
) -> DataFrame:
    """TPC-H Q6: revenue increase from discount elimination — the purest
    pushdown case: every predicate sits on a scan column (shipdate,
    discount, quantity all in PushedFilters), then a single global sum
    with no grouping shuffle (partial sums -> one-row final)."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
            & F.col("l_discount").between(disc_lo, disc_hi)
            & (F.col("l_quantity") < qty_max)
        )
        .agg(
            # price x discount in exact 1e-4 units (cents x cents)
            *split_sum(
                money_units(F.col("l_extendedprice")) * money_units(F.col("l_discount")),
                "rev",
            )
        )
        .select(merge_split("rev", 4).cast("double").alias("revenue"))
    )


def volume_shipping(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
    start: str = "1995-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q7 (adapted to l_shipdate): bilateral trade volume between
    two nations by ship year. Both nation-filtered dims broadcast; the
    lineitem⋈orders shuffle on orderkey is the only exchange before the
    4-row aggregate."""
    nat = nation.where(F.col("n_name").isin(nation_a, nation_b)).select("n_nationkey", "n_name")
    supp = supplier.join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("supp_nation")
    )
    cust = customer.join(F.broadcast(nat), F.col("c_nationkey") == nat.n_nationkey).select(
        "c_custkey", F.col("n_name").alias("cust_nation")
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(*split_sum(_revenue_u(), "rev"))
        .select(
            "supp_nation", "cust_nation", "l_year",
            merge_split("rev", 4).cast("double").alias("revenue"),
        )
    )


def promo_revenue_share(
    lineitem: DataFrame,
    part: DataFrame,
    start: str = "1996-03-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q14: promo-type revenue share in one ship month — the
    conditional-aggregate-over-join pattern (CASE inside SUM); part
    broadcasts, so the only exchange is the single-row final agg."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    promo_u = F.when(F.col("p_type").startswith("PROMO"), _revenue_u()).otherwise(F.lit(0))
    return (
        li.join(F.broadcast(part.select("p_partkey", "p_type")), F.col("l_partkey") == F.col("p_partkey"))
        .agg(*split_sum(promo_u, "promo"), *split_sum(_revenue_u(), "rev"))
        .select(
            round6(
                F.lit(100.0)
                * merge_split("promo", 4).cast("double")
                / merge_split("rev", 4).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


def market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    target_nation: str = "NATION_3",
    region_name: str = "ASIA",
    part_type: str = "ECONOMY",
    start: str = "1995-01-01",
    end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q8 (adapted): one nation's share of a region's revenue for a
    part type, by order year.

    Four broadcast joins (part filter, region-nation customers, supplier
    nations) hang off the single lineitem⋈orders shuffle; the share
    ratio divides two exact decimal sums cast to double, so the result
    is independent of partial-aggregation order."""
    rnat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation.n_regionkey == F.col("r_regionkey"),
    ).select("n_nationkey")
    cust = customer.join(F.broadcast(rnat), customer.c_nationkey == rnat.n_nationkey).select(
        "c_custkey"
    )
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    pts = part.where(F.col("p_type") == part_type).select("p_partkey")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    target_rev_u = F.when(F.col("supp_nation") == target_nation, _revenue_u()).otherwise(
        F.lit(0)
    )
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(pts), F.col("l_partkey") == pts.p_partkey)
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(cust), F.col("o_custkey") == cust.c_custkey)
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(*split_sum(target_rev_u, "target"), *split_sum(_revenue_u(), "rev"))
        .select(
            "o_year",
            round6(
                merge_split("target", 4).cast("double")
                / merge_split("rev", 4).cast("double")
            ).alias("mkt_share"),
        )
    )


def nation_profit(
    nation: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    part: DataFrame,
    name_fragment: str = "red",
) -> DataFrame:
    """TPC-H Q9 (adapted — no partsupp/supplycost in the test schema, so
    profit is the revenue term only): revenue by supplier nation and
    order year for parts whose name contains a fragment."""
    pts = part.where(F.col("p_name").contains(name_fragment)).select("p_partkey")
    supp = supplier.join(
        F.broadcast(nation.select("n_nationkey", F.col("n_name").alias("nation"))),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(pts), F.col("l_partkey") == pts.p_partkey)
        .join(orders.select("o_orderkey", "o_orderdate"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(*split_sum(_revenue_u(), "profit"))
        .select("nation", "o_year", merge_split("profit", 4).alias("sum_profit"))
    )


def customer_order_distribution(
    customer: DataFrame, orders: DataFrame, excluded_priority: str = "1-URGENT"
) -> DataFrame:
    """TPC-H Q13 (adapted to a priority filter): distribution of order
    counts per customer, including zero-order customers.

    The left-outer join shuffles both sides on custkey; the first
    aggregate reuses that partitioning (no extra exchange), and the
    second aggregate's key space (distinct order counts) is tiny."""
    ords = orders.where(F.col("o_orderpriority") != excluded_priority).select(
        "o_orderkey", "o_custkey"
    )
    per_customer = (
        customer.select("c_custkey")
        .join(ords, customer.c_custkey == ords.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_customer.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def top_supplier(
    supplier: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15: supplier(s) with the maximum quarterly revenue — the
    scalar-subquery-on-an-aggregate pattern. The scalar max is computed
    as a partial-merge aggregate (each task contributes one candidate;
    the single-reducer final step merges #partitions rows, not
    #suppliers) and broadcast back onto the per-supplier aggregate —
    no global window, so no all-rows-to-one-partition stage even when
    the supplier dimension itself is large."""
    rev = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(*split_sum(_revenue_u(), "rev"))
        .select("supplier_no", merge_split("rev", 4).alias("total_revenue"))
        # persisted: both the scalar max and the equality rejoin consume
        # this frame, and without it Spark re-scans lineitem for each
        # (pruning makes the subtrees non-identical, so exchange reuse
        # never fires — same rationale as important_parts). One row per
        # supplier — the right thing to rescan at 100 TB.
        .persist()
    )
    best = rev.join(
        F.broadcast(rev.agg(F.max("total_revenue").alias("max_revenue"))),
        F.col("total_revenue") == F.col("max_revenue"),
    )
    return (
        supplier.select("s_suppkey", "s_name")
        .join(F.broadcast(best), F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", F.col("total_revenue").cast("double").alias("total_revenue"))
    )


def supplier_part_counts(
    lineitem: DataFrame,
    part: DataFrame,
    excluded_brand: str = "Brand#1",
    sizes: tuple[int, ...] = (1, 5, 10, 15, 20, 25, 30, 35),
) -> DataFrame:
    """TPC-H Q16 (adapted — supplier/part pairs come from lineitem since
    the test schema has no partsupp): distinct suppliers per
    (brand, type, size). countDistinct plans as a two-phase aggregate:
    dedup on (group keys, suppkey) first, then count — one shuffle."""
    pts = part.where(
        (F.col("p_brand") != excluded_brand) & F.col("p_size").isin(*sizes)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    return (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(pts), F.col("l_partkey") == pts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def small_quantity_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#3", frac: float = 0.2
) -> DataFrame:
    """TPC-H Q17 (adapted to a brand filter): yearly revenue lost to
    small-quantity orders — the correlated-average-subquery pattern,
    rewritten as aggregate + self-join (Catalyst's own decorrelation).

    Quantities are small integers, so the per-part average is exact in
    double regardless of summation order (both engines agree bit-for-
    bit); one brand's lines are tiny, so the rejoin broadcasts."""
    pts = part.where(F.col("p_brand") == brand).select("p_partkey")
    li = (
        lineitem.join(F.broadcast(pts), F.col("l_partkey") == pts.p_partkey)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        # persisted: the per-part average and the rejoin both consume
        # this frame; the brand predicate lives on part, not lineitem,
        # so without the persist BOTH consumers re-read the full
        # lineitem scan (no pushdown, no exchange reuse). One brand's
        # lines (~1/|brands| of the fact) is the right thing to cache.
        .persist()
    )
    qty_cut = li.groupBy(F.col("l_partkey").alias("cut_partkey")).agg(
        (F.avg("l_quantity") * frac).alias("qty_cut")
    )
    return (
        li.join(F.broadcast(qty_cut), F.col("l_partkey") == F.col("cut_partkey"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(*split_sum(money_units(F.col("l_extendedprice")), "price"))
        .select(
            round6(merge_split("price", 2).cast("double") / 7.0).alias("avg_yearly")
        )
    )


def or_of_ands_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 (adapted to brand/size/quantity bands): revenue under an
    OR-of-ANDs predicate. The quantity bounds are ANDed across the
    branches' union so a residual-free range reaches the lineitem scan
    (PushedFilters gets l_quantity >= 1 AND <= 30); the per-brand
    branches evaluate post-join inside codegen."""
    joined = lineitem.select("l_partkey", "l_quantity", "l_extendedprice", "l_discount").join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    band = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 5)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#4")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        joined.where(band)
        .agg(*split_sum(_revenue_u(), "rev"))
        .select(merge_split("rev", 4).cast("double").alias("revenue"))
    )


def late_supplier_ranking(
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    late_days: int = 90,
    n: int = 20,
) -> DataFrame:
    """TPC-H Q21 (adapted — lateness is l_shipdate > o_orderdate + N days
    since the test schema has no commit/receipt dates): suppliers who
    were the SOLE late supplier on a multi-supplier finalized order.

    The EXISTS/NOT-EXISTS pair is expressed as per-order distinct
    counts computed in a window over the SAME orderkey partitioning the
    rows already need — one shuffle, one pass over lineitem (the
    aggregate-then-rejoin formulation scanned the join subtree twice),
    which is also the plan that survives 100x data."""
    from pyspark.sql.window import Window

    ords = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey", "o_orderdate")
    flagged = (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .withColumn(
            "is_late",
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr(f"INTERVAL {late_days} DAYS"),
        )
    )
    w = Window.partitionBy("l_orderkey")
    solo_late = (
        flagged.withColumn("n_suppliers", F.size(F.collect_set("l_suppkey").over(w)))
        .withColumn(
            "n_late",
            F.size(
                # collect_set drops nulls, so this counts DISTINCT late suppliers
                F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).over(w)
            ),
        )
        .where(F.col("is_late") & (F.col("n_suppliers") > 1) & (F.col("n_late") == 1))
        .select("l_orderkey", "l_suppkey")
        .dropDuplicates(["l_orderkey", "l_suppkey"])
    )
    return (
        solo_late.join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(n)
    )


def dormant_rich_customers(
    customer: DataFrame,
    nation: DataFrame,
    orders: DataFrame,
    cutoff: str = "1999-01-01",
) -> DataFrame:
    """TPC-H Q22 (adapted — nation stands in for the phone country code):
    above-average-balance customers with no orders since a cutoff,
    rolled up by nation.

    The average balance is an exact decimal sum cast to double (order-
    independent, so Spark and the oracle agree at the comparison
    boundary); the no-recent-orders NOT EXISTS is a left-anti join
    shuffled on custkey."""
    # acctbal can be negative: split_sum's floor-mod split stays exact
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0.0)
        .agg(
            *split_sum(money_units(F.col("c_acctbal")), "bal"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select((merge_split("bal", 2).cast("double") / F.col("_n")).alias("avg_bal"))
    )
    rich = (
        customer.select("c_custkey", "c_nationkey", "c_acctbal")
        .crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
    )
    recent = orders.where(F.col("o_orderdate") >= F.lit(cutoff).cast("timestamp")).select(
        "o_custkey"
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("cntrycode"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            *split_sum(money_units(F.col("c_acctbal")), "bal"),
        )
        .select(
            "cntrycode", "numcust",
            merge_split("bal", 2).cast("double").alias("totacctbal"),
        )
    )


def min_cost_supplier(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    region_name: str = "EUROPE",
    size_lo: int = 10,
    size_hi: int = 25,
    type_name: str = "STANDARD",
    n: int = 100,
) -> DataFrame:
    """TPC-H Q2 (adapted — the supply catalog is DERIVED from lineitem
    since the test schema has no partsupp: a supplier's cost for a part
    is the minimum unit price it ever shipped it at): for each part of
    a given size/type, the supplier(s) in one region offering it at the
    region-wide minimum cost — the correlated-scalar-min-subquery plan
    shape, decorrelated into aggregate + equality rejoin (the same
    rewrite Catalyst applies to the classic formulation).

    Plan at scale: part and the supplier⋈nation⋈region chain broadcast
    into the derived catalog, whose groupBy is the one big shuffle; the
    per-part min is a WINDOW over the aggregated catalog (already tiny:
    one row per filtered part x regional supplier), NOT an
    aggregate-and-rejoin — the rejoin formulation plans a second full
    lineitem scan (no exchange reuse after pruning; verified), while
    the window adds one exchange over the small aggregate. Unit price
    is round6(extendedprice / quantity) per row BEFORE the min so both
    engines compare identical doubles."""
    from pyspark.sql.window import Window

    regional_supp = (
        supplier.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
        .join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.where(F.col("r_name") == region_name)),
                    F.col("n_regionkey") == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    pts = part.where(
        F.col("p_size").between(size_lo, size_hi) & (F.col("p_type") == type_name)
    ).select("p_partkey", "p_name")
    catalog = (
        lineitem.select(
            "l_partkey",
            "l_suppkey",
            round6(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
        .join(F.broadcast(pts), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(regional_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .agg(F.min("unit_cost").alias("supply_cost"))
    )
    best = F.min("supply_cost").over(Window.partitionBy("p_partkey"))
    return (
        catalog.withColumn("best_cost", best)
        .where(F.col("supply_cost") == F.col("best_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "supply_cost")
        .orderBy(
            F.desc("s_acctbal"), F.asc("n_name"), F.asc("s_name"), F.asc("p_partkey")
        )
        .limit(n)
    )


def important_parts(
    nation: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_7",
    fraction: float = 0.001,
) -> DataFrame:
    """TPC-H Q11 (adapted — part value is the revenue its lineitems
    earned through one nation's suppliers, standing in for
    supplycost x availqty): parts holding more than `fraction` of the
    nation's total value — the aggregate-vs-global-share plan shape
    (group agg + scalar subquery broadcast back as a HAVING bound).

    Both sums are exact paired-long decimals; the share bound is
    evaluated in double on both engines from the same exact totals, so
    the comparison is deterministic. The per-part aggregate is
    PERSISTED before the grand total derives from it: without it Spark
    plans a second full lineitem scan for the scalar subquery (column
    pruning makes the two subtrees non-identical, so exchange reuse
    never fires — verified), whereas the persisted frame is one row per
    part, the right thing to rescan at 100 TB. A global one-partition
    window over per_part would avoid the persist but funnels every part
    row through one task — worse at scale."""
    nat_supp = (
        supplier.select("s_suppkey", "s_nationkey")
        .join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        lineitem.select("l_partkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(F.broadcast(nat_supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.col("l_partkey").alias("p_partkey"))
        .agg(*split_sum(_revenue_u(), "val"))
        .select("p_partkey", merge_split("val", 4).alias("val"))
        .persist()
    )
    total = per_part.agg(F.sum("val").alias("total_val"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("val").cast("double")
            > F.col("total_val").cast("double") * F.lit(fraction)
        )
        .select("p_partkey", F.col("val").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.asc("p_partkey"))
    )


def ship_delay_priority(
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1996-01-01",
    end: str = "1997-01-01",
    slow_days: int = 30,
    late_days: int = 90,
) -> DataFrame:
    """TPC-H Q12 (adapted — the schema has no shipmode or commit/receipt
    dates, so lines band by ship DELAY instead): for each delay band of
    lines shipped in the window, how many belong to critical- vs
    normal-priority orders — the fact⋈fact join + CASE-sum conditional
    aggregation plan shape.

    The shipdate range pushes to the lineitem scan; the orderkey join
    shuffles both sides once (AQE may broadcast the filtered lineitem
    side at small SF); the 3-row band aggregate is free."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp"))
    ).select("l_orderkey", "l_shipdate")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    band = (
        F.when(delay >= late_days, F.lit("LATE"))
        .when(delay >= slow_days, F.lit("SLOW"))
        .otherwise(F.lit("FAST"))
    )
    critical = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(band.alias("delay_band"))
        .agg(
            F.sum(F.when(critical, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(critical, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("delay_band")
    )


def excess_supply_suppliers(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "small",
    region_name: str = "EUROPE",
    year_start: str = "1996-01-01",
    year_end: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q20 (adapted — availqty is proxied by a supplier's ALL-TIME
    shipped quantity of the part, absent partsupp): suppliers in one
    region holding excess supply of a name-matched part — all-time
    quantity above 1.5x what they shipped of it in the target year —
    the nested-semi-join-chain plan shape (part name filter semi-joins
    into the supply aggregate, whose qualifying supplier keyset
    semi-joins into supplier, intersected with the region filter).

    One lineitem pass: the year condition folds into a conditional sum
    inside the same (partkey, suppkey) aggregate the all-time sum uses,
    replacing Q20's correlated subquery with map-side CASE — the
    decorrelation you'd want at 100 TB, since the classic form scans
    lineitem twice. Quantity sums are exact long cent-sums."""
    pts = part.where(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    in_year = (F.col("l_shipdate") >= F.lit(year_start).cast("timestamp")) & (
        F.col("l_shipdate") < F.lit(year_end).cast("timestamp")
    )
    qty_c = money_units(F.col("l_quantity"))
    supply = (
        lineitem.select("l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
        .join(F.broadcast(pts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            small_units_sum(qty_c, "all"),
            small_units_sum(F.when(in_year, qty_c).otherwise(F.lit(0)), "yr"),
        )
        .select(
            "l_suppkey",
            merge_small("all").alias("all_qty"),
            merge_small("yr").alias("yr_qty"),
        )
        .where(
            (F.col("yr_qty") > 0)
            & (F.col("all_qty").cast("double") > F.col("yr_qty").cast("double") * 1.5)
        )
        # no distinct: the left-semi join below dedups implicitly, so a
        # distinct here would only buy an extra exchange on l_suppkey
        .select("l_suppkey")
    )
    regional_nations = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey")
    return (
        supplier.select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
        .join(
            F.broadcast(regional_nations),
            F.col("s_nationkey") == F.col("n_nationkey"),
            "left_semi",
        )
        .join(supply, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_name")
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: float = 250.0,
    n: int = 20,
) -> DataFrame:
    """TPC-H Q18: customers with any single order above a total-quantity
    threshold — the groupBy-HAVING-semijoin pattern. The orderkey
    aggregate reuses lineitem's shuffle; the qualifying keyset is tiny
    so it broadcasts back onto orders."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(small_units_sum(money_units(F.col("l_quantity")), "qty"))
        .select("l_orderkey", merge_small("qty").alias("total_qty"))
        .where(F.col("total_qty") > qty_threshold)
    )
    return (
        orders.select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
        .join(F.broadcast(big), F.col("o_orderkey") == big.l_orderkey)
        .join(F.broadcast(customer.select("c_custkey", "c_name")), F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(n)
    )
