"""Cross-engine edge parity for the MULTI-TABLE (star-join) queries —
the fourth module of the family (documents / events / embeddings cover
the single-table surface): the oracle-backed TPC-H-family keys run over
a PATHOLOGICAL star schema instead of the well-behaved driver fixtures
(VERDICT r12 #3: the join layer had no null/duplicate/empty-side
coverage, and every previous edge module found real bugs).

Join-layer edge shapes, by table:

- facts with NULL join keys (lineitem.l_partkey / l_suppkey,
  orders.o_custkey) — inner joins must drop them identically in both
  engines, never null-match;
- DANGLING foreign keys (an orderkey/custkey/partkey/suppkey/regionkey
  that exists in the fact but not the dimension) — the no-match side
  of every join;
- EMPTY join sides: a region with no nations, a part and a supplier
  with no lineitems, a customer with no orders (the h13/h22 left-join
  zero branches), an order with no lineitems;
- NULL measures under aggregation: null l_quantity / l_extendedprice /
  l_discount / l_tax / o_totalprice / c_acctbal / p_retailprice —
  sum/avg/count must skip them the same way on both engines;
- NULL group/filter columns: null l_returnflag, l_linestatus,
  o_orderpriority, c_mktsegment, p_brand/p_type/p_size, n_name,
  r_name, and a NULL o_orderdate / l_shipdate flowing into date
  range predicates and year() buckets;
- duplicate-key fact BURSTS: one order carrying 30 near-identical
  lineitems (same part+supplier), fanning out through every
  orders->lineitem join.

Dimension PRIMARY keys stay unique and non-null — that is the
generator contract (the same line the single-table modules draw at
event_id/ts); everything else nullable goes null here.
"""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from metrocloud_data_pipeline_spark.queries import ORACLE_SQL, SPARK_QUERIES

JOIN_QUERIES = [
    # the 22 multi-table oracle-backed keys
    "h2_min_cost_supplier",
    "h3_shipping_priority",
    "h4_order_priority",
    "h5_local_supplier_volume",
    "h7_volume_shipping",
    "h8_market_share",
    "h9_nation_profit",
    "h10_returned_items",
    "h11_important_parts",
    "h12_ship_delay_priority",
    "h13_customer_distribution",
    "h14_promo_revenue",
    "h15_top_supplier",
    "h16_supplier_part_counts",
    "h17_small_qty_revenue",
    "h18_large_customers",
    "h19_disc_revenue",
    "h20_excess_supply",
    "h21_late_suppliers",
    "h22_dormant_customers",
    "h_brand_revenue",
    "dedup_jaccard_prefix_baskets",
    # the 4 single-TPC-H-table keys no other edge module fixtures
    "h1_pricing_summary",
    "h6_forecast_revenue",
    "t1_unpivot_measures",
    "scd2_customer_dim",
]

REGION_ROWS = [
    (0, "EUROPE"),
    (1, "ASIA"),
    (2, "AMERICA"),
    (3, None),        # null region name
    (4, "EMPTYREG"),  # region with no nations (empty join side)
]

NATION_ROWS = [
    # (n_nationkey, n_name, n_regionkey)
    (0, "NATION_0", 0),   # EUROPE
    (1, "NATION_1", 0),   # EUROPE (h7 pair member)
    (2, "NATION_2", 1),   # ASIA   (h7 pair member)
    (3, "NATION_3", 1),   # ASIA   (h8 market-share nation)
    (7, "NATION_7", 1),   # ASIA   (h11 target nation)
    (8, "NATION_8", None),  # null regionkey: drops from region joins
    (9, None, 2),         # null nation NAME in AMERICA (null group key)
    (10, "NATION_10", 99),  # dangling regionkey
]

CUSTOMER_ROWS = [
    # (c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment)
    (1, "C1", 3, 100.0, "BUILDING"),
    (2, "C2", 3, None, "BUILDING"),      # null acctbal
    (3, "C3", None, 50.0, "AUTOMOBILE"),  # null nationkey
    (4, "C4", 2, -10.0, None),            # negative bal, null segment
    (5, "C5", 7, 0.0, "BUILDING"),
    (6, "C6", 9, 60.0, "BUILDING"),       # nation with NULL name
    (7, "C7", 1, 70.0, "MACHINERY"),      # %7==0 -> scd2 update branch
    (8, "C8", 10, 80.0, "BUILDING"),      # nation with dangling region
    (9, "C9", 3, 90.0, "BUILDING"),       # customer with NO orders
    (10, "C10", 3, 10.5, "HOUSEHOLD"),    # only pre-cutoff orders
    (14, "C14", 2, 140.0, "BUILDING"),    # %7==0, owns the burst order
]

SUPPLIER_ROWS = [
    # (s_suppkey, s_name, s_nationkey, s_acctbal)
    (1, "S1", 0, 1000.0),   # EUROPE
    (2, "S2", 1, 2000.0),   # EUROPE / NATION_1
    (3, "S3", 3, 300.0),    # ASIA / NATION_3
    (4, "S4", 7, 400.0),    # ASIA / NATION_7
    (5, "S5", None, 500.0),  # null nationkey
    (6, "S6", 0, None),      # null acctbal, EUROPE
    (7, "S7", 2, 70.0),     # ASIA / NATION_2
    (8, "S8", 0, 1000.0),   # EUROPE, acctbal TIE with S1
    (9, "S9", 0, 900.0),    # supplier with NO lineitems
]

PART_ROWS = [
    # (p_partkey, p_name, p_brand, p_type, p_size, p_retailprice)
    (1, "red shiny ball", "Brand#1", "STANDARD", 15, 10.0),
    (2, "small green cog", "Brand#3", "ECONOMY", 5, 20.0),
    (3, "dark red gear", "Brand#12", "STANDARD", 20, None),  # null price
    (4, "blue widget", "Brand#23", "ECONOMY", 12, 40.0),
    (5, "small brass nut", "Brand#4", "STANDARD", 25, 5.0),
    (6, None, None, None, None, 60.0),  # all-null descriptors
    (7, "plain bolt", "Brand#1", "PROMO ANODIZED", 10, 70.0),
    (8, "unused part", "Brand#99", "STANDARD", 18, 80.0),  # no lineitems
    # vocabulary filler so the per-customer part baskets clear the
    # jaccard-prefix entropy guard (vocab >= 0.5 x n_baskets) and the
    # baskets key stays hash-compared on this fixture rather than
    # fail-louding on a degenerate corpus (that branch is pinned in
    # tests/test_llm.py)
    (9, "filler gadget A", "Brand#5", "STANDARD", 11, 11.0),
    (10, "filler gadget B", "Brand#5", "ECONOMY", 12, 12.0),
    (11, "filler gadget C", "Brand#6", "STANDARD", 13, 13.0),
    (12, "filler gadget D", "Brand#6", "ECONOMY", 14, 14.0),
    # second wave: LIKE case-sensitivity trap — '%red%' and 'small%'
    # must NOT match capitalized names on either engine (both LIKEs
    # are case-sensitive), and a name CONTAINING the pattern's literal
    # text mid-word ('hundred' contains 'red') MUST match
    (13, "Red Sled", "Brand#7", "ECONOMY", 9, 9.0),
    (14, "Small Stone", "Brand#7", "STANDARD", 16, 16.0),
    (15, "one hundred bolts", "Brand#8", "ECONOMY", 17, 17.0),
]

ORDER_ROWS = [
    # (o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate,
    #  o_orderpriority)
    (1, 1, "O", 100.0, "1996-02-10 00:00:00", "1-URGENT"),
    (2, 1, "F", 200.0, "1996-03-15 00:00:00", "2-HIGH"),
    (3, 2, "F", None, "1995-06-01 00:00:00", "1-URGENT"),   # null total
    (4, 4, "O", 400.0, "1996-05-20 00:00:00", "5-LOW"),
    (5, 5, "F", 500.0, "1996-06-01 00:00:00", None),        # null priority
    (6, None, "O", 600.0, "1996-07-04 00:00:00", "1-URGENT"),  # null custkey
    (7, 999, "F", 700.0, "1996-01-15 00:00:00", "3-MEDIUM"),   # dangling cust
    (8, 7, "O", 800.0, "1999-06-01 00:00:00", "2-HIGH"),    # post-cutoff
    (9, 3, "F", 900.0, None, "1-URGENT"),                   # NULL orderdate
    (10, 10, "F", 150.0, "1995-02-01 00:00:00", "4-NOT SPECIFIED"),
    (11, 6, "O", 1100.0, "1996-04-01 00:00:00", "1-URGENT"),
    (12, 8, "O", 1200.0, "1996-08-01 00:00:00", "2-HIGH"),
    (13, 2, "O", 250.0, "1996-09-05 00:00:00", "1-URGENT"),  # no lineitems
    (14, 14, "F", 300.0, "1996-02-20 00:00:00", "2-HIGH"),   # 30-line burst
    (15, 1, "O", 350.0, "1997-11-01 00:00:00", "1-URGENT"),  # h3: BUILDING,
    #   pre-1998 order whose lines ship after the 1998-01-01 cutoff
    (16, 7, "O", 450.0, "1996-02-25 00:00:00", "3-MEDIUM"),  # h7 reverse leg
    # second wave: EXACT-BOUNDARY dates — the h4 window is
    # [1996-01-01, 1996-07-01): one order at each edge (17 in, 18 out),
    # and 19 at h22's dormant cutoff 1999-01-01 (NOT dormant: >= is
    # inclusive on both engines)
    (17, 1, "O", 170.0, "1996-01-01 00:00:00", "2-HIGH"),
    (18, 1, "O", 180.0, "1996-07-01 00:00:00", "2-HIGH"),
    (19, 5, "O", 190.0, "1999-01-01 00:00:00", "1-URGENT"),
]

LINEITEM_ROWS = [
    # (l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
    #  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
    #  l_shipdate)
    (1, 1, 1, 1, 10.0, 1000.0, 0.05, 0.02, "N", "O", "1996-02-15 00:00:00"),
    (1, 2, 3, 2, 5.0, 500.0, 0.0, 0.0, "R", "F", "1996-02-16 00:00:00"),
    (2, 7, 2, 1, 20.0, 2000.0, 0.10, 0.04, "N", "O", "1996-03-20 00:00:00"),
    (2, 3, 1, 2, 8.0, 800.0, 0.02, 0.01, "R", "F", "1996-03-25 00:00:00"),
    (3, 4, 3, 1, 30.0, 3000.0, 0.06, 0.03, "A", "F", "1995-06-10 00:00:00"),
    (3, 5, 4, 2, None, 250.0, 0.01, 0.0, "N", "F", "1995-06-12 00:00:00"),  # null qty
    (4, 2, 7, 1, 12.0, None, 0.03, 0.02, "R", "O", "1996-05-25 00:00:00"),  # null price
    (4, 6, 5, 2, 7.0, 700.0, None, None, None, None, "1996-05-26 00:00:00"),  # null disc/tax/flags
    (5, 1, 8, 1, 40.0, 4000.0, 0.07, 0.05, "A", "F", None),  # NULL shipdate
    (5, None, 1, 2, 3.0, 300.0, 0.01, 0.0, "N", "O", "1996-06-05 00:00:00"),  # null partkey
    (6, 3, None, 1, 6.0, 600.0, 0.02, 0.01, "R", "F", "1996-07-10 00:00:00"),  # null suppkey
    (7, 5, 6, 1, 9.0, 900.0, 0.04, 0.02, "N", "O", "1996-01-20 00:00:00"),
    (8, 7, 4, 1, 11.0, 1100.0, 0.05, 0.03, "N", "O", "1999-06-05 00:00:00"),
    (9, 1, 3, 1, 13.0, 1300.0, 0.06, 0.02, "R", "F", "1996-09-10 00:00:00"),
    (10, 2, 2, 1, 14.0, 1400.0, 0.03, 0.01, "A", "F", "1995-02-10 00:00:00"),
    (11, 4, 7, 1, 15.0, 1500.0, 0.08, 0.04, "N", "O", "1996-04-05 00:00:00"),
    (12, 5, 3, 1, 16.0, 1600.0, 0.02, 0.0, "R", "O", "1996-08-05 00:00:00"),
    (9999, 1, 1, 1, 17.0, 1700.0, 0.01, 0.01, "N", "O", "1996-10-01 00:00:00"),  # dangling orderkey
    (1, 999, 998, 3, 18.0, 1800.0, 0.02, 0.01, "A", "F", "1996-02-17 00:00:00"),  # dangling part+supp
    # h3: ships AFTER the 1998-01-01 cutoff for a pre-cutoff BUILDING
    # order; the second line's NULL discount flows into the revenue sum
    (15, 1, 1, 1, 4.0, 450.0, 0.05, 0.01, "N", "O", "1998-02-01 00:00:00"),
    (15, 3, 6, 2, 2.0, 220.0, None, 0.0, "R", "F", "1998-03-01 00:00:00"),
    # h7: NATION_1 supplier (S2) shipping to the NATION_2 customer C4
    (4, 1, 2, 3, 5.0, 520.0, 0.04, 0.02, "N", "O", "1996-05-27 00:00:00"),
    # h4: ships 73 days after order 4's 1996-05-20 orderdate
    (4, 5, 6, 4, 6.0, 640.0, 0.0, 0.0, "N", "O", "1996-08-01 00:00:00"),
    # h7 reverse leg: NATION_2 supplier (S7) to the NATION_1 customer C7
    (16, 4, 7, 1, 5.0, 550.0, 0.02, 0.01, "N", "O", "1996-03-01 00:00:00"),
    # h21: order 3 (status F, suppliers {3,4}) gets exactly ONE late
    # supplier (S4, 122 days after the orderdate)
    (3, 2, 4, 3, 4.0, 410.0, 0.02, 0.01, "A", "F", "1995-10-01 00:00:00"),
    # h21 edge: a LATE line with a NULL suppkey on a single-supplier F
    # order — count(DISTINCT) ignores the null identically on both
    # engines, so order 10 must stay excluded (n_suppliers = 1)
    (10, 5, None, 2, 5.0, 510.0, 0.01, 0.0, "A", "F", "1995-08-01 00:00:00"),
    # h20: part 5 ('small%') from the EUROPE supplier S6 OUT of the
    # 1996 window, so S6's all_qty (19) > 1.5 x yr_qty (9) qualifies —
    # and S6's NULL acctbal rides into the result row
    (12, 5, 6, 2, 10.0, 1000.0, 0.03, 0.01, "R", "O", "1995-05-01 00:00:00"),
    # basket-vocabulary filler lines (parts 9-12 across two customers)
    (1, 9, 1, 4, 1.0, 11.0, 0.0, 0.0, "N", "O", "1996-02-18 00:00:00"),
    (2, 10, 2, 3, 1.0, 12.0, 0.0, 0.0, "N", "O", "1996-03-21 00:00:00"),
    (4, 11, 7, 5, 1.0, 13.0, 0.0, 0.0, "N", "O", "1996-05-28 00:00:00"),
    (5, 12, 8, 3, 1.0, 14.0, 0.0, 0.0, "N", "O", "1996-06-06 00:00:00"),
    # second wave: boundary shipdates for h1 (<= 2000-12-01 inclusive —
    # one AT the cutoff, kept by both engines) and h15's half-open
    # [1996-01-01, 1996-04-01) window edges
    (17, 1, 1, 1, 2.0, 210.0, 0.0, 0.0, "N", "O", "2000-12-01 00:00:00"),
    (17, 2, 2, 2, 2.0, 220.0, 0.0, 0.0, "N", "O", "1996-01-01 00:00:00"),
    (18, 3, 3, 1, 2.0, 230.0, 0.0, 0.0, "N", "F", "1996-04-01 00:00:00"),
    # NEGATIVE measures and a discount > 1 (revenue factor goes
    # negative) — sums must carry sign identically through the
    # DECIMAL(18,4) casts on both engines
    (19, 4, 4, 1, -5.0, -500.0, 0.02, 0.01, "R", "F", "1999-02-01 00:00:00"),
    (19, 2, 3, 2, 6.0, 600.0, 1.5, 0.0, "A", "O", "1999-02-02 00:00:00"),
    # LARGE magnitude (but DECIMAL(18,4)-safe in aggregate): 9.9e9
    (19, 1, 2, 3, 1.0, 9.9e9, 0.0, 0.0, "N", "O", "1999-02-03 00:00:00"),
    # the LIKE-trap parts flow through the part joins: 'Red Sled' and
    # 'Small Stone' must NOT hit '%red%'/'small%'; 'one hundred bolts'
    # MUST hit '%red%' mid-word
    (16, 13, 7, 2, 3.0, 330.0, 0.01, 0.0, "N", "O", "1996-03-02 00:00:00"),
    (16, 15, 7, 3, 3.0, 340.0, 0.01, 0.0, "N", "O", "1996-03-03 00:00:00"),
    (11, 14, 7, 2, 3.0, 350.0, 0.01, 0.0, "N", "O", "1996-04-06 00:00:00"),
] + [
    # duplicate-key fact burst: 30 near-identical lines on one order,
    # same (part, supplier) — fans out through every orders->lineitem
    # join and stresses groupBy/dedup paths with a hot key; qty 9 puts
    # the burst order's 270 total over h18's >250 large-customer bar,
    # so the hot key also flows through that join
    (14, 1, 1, 100 + i, 9.0, 200.0, 0.01, 0.0, "N", "F", "1996-02-21 00:00:00")
    for i in range(30)
]


@pytest.fixture(scope="module")
def star_dir(spark, tmp_path_factory):
    from pyspark.sql import functions as F

    d = tmp_path_factory.mktemp("star_edge")
    specs = {
        "region": (REGION_ROWS, "r_regionkey int, r_name string", []),
        "nation": (
            NATION_ROWS,
            "n_nationkey int, n_name string, n_regionkey int",
            [],
        ),
        "customer": (
            CUSTOMER_ROWS,
            "c_custkey long, c_name string, c_nationkey int, "
            "c_acctbal double, c_mktsegment string",
            [],
        ),
        "supplier": (
            SUPPLIER_ROWS,
            "s_suppkey long, s_name string, s_nationkey int, s_acctbal double",
            [],
        ),
        "part": (
            PART_ROWS,
            "p_partkey long, p_name string, p_brand string, p_type string, "
            "p_size int, p_retailprice double",
            [],
        ),
        "orders": (
            ORDER_ROWS,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate string, o_orderpriority string",
            ["o_orderdate"],
        ),
        "lineitem": (
            LINEITEM_ROWS,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double, "
            "l_discount double, l_tax double, l_returnflag string, "
            "l_linestatus string, l_shipdate string",
            ["l_shipdate"],
        ),
    }
    for name, (rows, schema, ts_cols) in specs.items():
        df = spark.createDataFrame(rows, schema)
        for c in ts_cols:
            df = df.withColumn(c, F.col(c).cast("timestamp_ntz"))
        df.coalesce(1).write.parquet(str(d / f"{name}.parquet"))
    return str(d)


def _canon(df) -> str:
    cols = sorted(df.columns)
    d = df[cols].copy()
    d = d.sort_values(by=cols).reset_index(drop=True)
    return hashlib.md5(d.to_csv(index=False).encode()).hexdigest()


@pytest.mark.parametrize("name", JOIN_QUERIES)
def test_join_edge_parity(spark, star_dir, name):
    got = SPARK_QUERIES[name](spark, star_dir).toPandas()
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders", "lineitem"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{star_dir}/{t}.parquet/*.parquet'"
        )
    want = con.execute(ORACLE_SQL[name]).df()
    assert sorted(got.columns) == sorted(want.columns), (got.columns, want.columns)
    assert len(got) == len(want), (len(got), len(want))
    assert _canon(got) == _canon(want), (
        got.sort_values(by=sorted(got.columns)).head(25),
        want.sort_values(by=sorted(want.columns)).head(25),
    )
