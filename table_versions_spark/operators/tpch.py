"""TPC-H-shaped analytics suite (SURVEY §2.B [ext] — engine completeness).

Classic TPC-H query shapes adapted to the driver testdata schema
(`FIXTURES.md` §B: no partsupp table; no l_shipmode/l_commitdate,
o_shippriority, c_phone columns — predicates are adjusted accordingly while
keeping each query's *plan shape*: the multi-way join graphs, correlated
semi/anti subqueries, group-by-having, and top-k orderings that make TPC-H a
meaningful optimizer workout).

Scale notes (100 TB discipline):
- Dimension tables (region, nation, supplier, part at these ratios) are
  broadcast explicitly; fact-fact joins (lineitem⋈orders) shuffle on the join
  key and benefit from AQE coalescing.
- Filters are applied before joins so Catalyst pushes them into the parquet
  scan (verified via `PushedFilters` in the formatted plans, see
  tools/explain_audit.py).
- Aggregates over doubles are ROUNDed in both engines (summation order
  differs); top-k orderings carry unique tiebreakers.

The reference exercises none of these itself (SURVEY §2.E) — they are part of
the mandated "same query capabilities through Spark" surface.
"""

from pyspark.sql import DataFrame, SparkSession, functions as F

from .common import load


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 with its shipdate cutoff)."""
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    return (li.groupBy("l_returnflag", "l_linestatus")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                 F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("sum_disc_price"),
                 F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))
                               * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
                 F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
                 F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
                 F.round(F.avg("l_discount"), 6).alias("avg_disc"),
                 F.count("*").alias("count_order"))
            .orderBy("l_returnflag", "l_linestatus"))


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: unshipped BUILDING orders by revenue (Q3 shape)."""
    cust = (load(spark, sf_dir, "customer")
            .where(F.col("c_mktsegment") == "BUILDING")
            .select("c_custkey"))
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderdate") < F.lit("1996-03-15"))
              .select("o_orderkey", "o_custkey", "o_orderdate"))
    li = (load(spark, sf_dir, "lineitem")
          .where(F.col("l_shipdate") > F.lit("1996-03-15"))
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .groupBy("l_orderkey", F.to_date("o_orderdate").alias("o_orderdate"))
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
            .limit(10))


def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order priority checking (Q4 shape; EXISTS predicate uses
    l_shipdate > o_orderdate in place of the absent commit/receipt dates)."""
    orders = (load(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1996-07-01"))
                     & (F.col("o_orderdate") < F.lit("1996-10-01"))))
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    matched = orders.join(li, (orders.o_orderkey == li.l_orderkey)
                          & (li.l_shipdate > orders.o_orderdate), "left_semi")
    return (matched.groupBy("o_orderpriority")
            .agg(F.count("*").alias("order_count"))
            .orderBy("o_orderpriority"))


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume (Q5): 6-way join, revenue by nation in ASIA."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    cust = load(spark, sf_dir, "customer")
    supp = load(spark, sf_dir, "supplier")
    orders = (load(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1996-01-01"))
                     & (F.col("o_orderdate") < F.lit("1997-01-01"))))
    li = load(spark, sf_dir, "lineitem")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .where(cust.c_nationkey == supp.s_nationkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
            .groupBy("n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("n_name")))


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change (Q6): pure scan-filter-agg."""
    li = load(spark, sf_dir, "lineitem")
    return (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                     & (F.col("l_shipdate") < F.lit("1997-01-01"))
                     & (F.col("l_discount") >= 0.05) & (F.col("l_discount") <= 0.07)
                     & (F.col("l_quantity") < 24))
            .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
                  .alias("revenue")))


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (Q7 shape): bilateral trade between two nations by
    ship year (supplier nation ≠ customer nation)."""
    n1 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount")
    pairs = (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1"))
    joined = (li.join(orders, li.l_orderkey == orders.o_orderkey)
              .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
              .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
              .join(F.broadcast(n1), supp.s_nationkey == n1.s_nk)
              .join(F.broadcast(n2), cust.c_nationkey == n2.c_nk)
              .where(((F.col("supp_nation") == pairs[0][0]) & (F.col("cust_nation") == pairs[0][1]))
                     | ((F.col("supp_nation") == pairs[1][0]) & (F.col("cust_nation") == pairs[1][1]))))
    return (joined
            .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
            .groupBy("supp_nation", "cust_nation", "l_year")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"))
            .orderBy("supp_nation", "cust_nation", "l_year"))


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (Q8 shape): NATION_3's share of ECONOMY-part
    revenue inside ASIA, by order year."""
    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n_cust = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region"))
    n_supp = load(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    part = (load(spark, sf_dir, "part")
            .where(F.col("p_type") == "ECONOMY").select("p_partkey"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
         .join(orders, li.l_orderkey == orders.o_orderkey)
         .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
         .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
         .join(F.broadcast(n_cust), cust.c_nationkey == n_cust.cn_key)
         .join(F.broadcast(region), n_cust.cn_region == region.r_regionkey)
         .join(F.broadcast(n_supp), supp.s_nationkey == n_supp.sn_key))
    return (j.withColumn("o_year", F.year("o_orderdate").cast("bigint"))
            .groupBy("o_year")
            .agg(F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol)
                       .otherwise(F.lit(0.0))) / F.sum(vol), 6)
                  .alias("mkt_share"))
            .orderBy("o_year"))


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product type profit (Q9 shape, no partsupp: profit ≈ discounted
    revenue of parts whose name contains 'widget', by nation and order year)."""
    part = (load(spark, sf_dir, "part")
            .where(F.col("p_name").contains("widget")).select("p_partkey"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load(spark, sf_dir, "nation")
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem")
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
            .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
            .join(orders, li.l_orderkey == orders.o_orderkey)
            .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
            .groupBy(F.col("n_name").alias("nation"), "o_year")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0)
                  .alias("sum_profit"))
            .orderBy("nation", F.desc("o_year")))


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting (Q10): top-20 customers by lost revenue."""
    orders = (load(spark, sf_dir, "orders")
              .where((F.col("o_orderdate") >= F.lit("1996-10-01"))
                     & (F.col("o_orderdate") < F.lit("1997-01-01")))
              .select("o_orderkey", "o_custkey"))
    li = (load(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag") == "R")
          .select("l_orderkey", "l_extendedprice", "l_discount"))
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
            .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("revenue"))
            .orderBy(F.desc("revenue"), F.asc("c_custkey"))
            .limit(20))


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (Q13): left join, two-level agg."""
    cust = load(spark, sf_dir, "customer").select("c_custkey")
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") != "1-URGENT")
              .select("o_orderkey", "o_custkey"))
    counts = (cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
              .groupBy("c_custkey")
              .agg(F.count("o_orderkey").alias("c_count")))
    return (counts.groupBy("c_count")
            .agg(F.count("*").alias("custdist"))
            .orderBy(F.desc("custdist"), F.desc("c_count")))


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (Q14 shape): ECONOMY-type revenue share in a month."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit("1996-09-01"))
                 & (F.col("l_shipdate") < F.lit("1996-10-01"))))
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .agg(F.round(
                F.sum(F.when(F.col("p_type") == "ECONOMY", rev).otherwise(F.lit(0.0)))
                * 100.0 / F.sum(rev), 4).alias("promo_revenue_pct")))


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large volume customers (Q18): group-by-having semi join on fact agg."""
    li = load(spark, sf_dir, "lineitem")
    big = (li.groupBy("l_orderkey")
           .agg(F.sum("l_quantity").alias("sum_qty"))
           .where(F.col("sum_qty") > 300)
           .select("l_orderkey"))
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (orders.join(big, orders.o_orderkey == big.l_orderkey, "left_semi")
            .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
            .join(li.select("l_orderkey", "l_quantity"),
                  orders.o_orderkey == F.col("l_orderkey"))
            .groupBy("c_name", "c_custkey", "o_orderkey",
                     F.to_date("o_orderdate").alias("o_orderdate"), "o_totalprice")
            .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"))
            .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
            .limit(100))


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (Q19 shape): disjunctive brand/size/quantity
    predicates across the join — the classic pushdown-through-OR test."""
    part = load(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (((F.col("p_brand") == "Brand#1") & (F.col("p_size").between(1, 15))
             & (F.col("l_quantity").between(1, 11)))
            | ((F.col("p_brand") == "Brand#2") & (F.col("p_size").between(1, 25))
               & (F.col("l_quantity").between(10, 20)))
            | ((F.col("p_brand") == "Brand#3") & (F.col("p_size").between(1, 35))
               & (F.col("l_quantity").between(20, 30))))
    return (j.where(cond)
            .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                  .alias("revenue")))


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (Q15): revenue view + max-revenue correlated filter."""
    li = (load(spark, sf_dir, "lineitem")
          .where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                 & (F.col("l_shipdate") < F.lit("1996-04-01"))))
    revenue = (li.groupBy(F.col("l_suppkey").alias("supplier_no"))
               .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
                     .alias("total_revenue")))
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    supp = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (revenue.join(F.broadcast(max_rev),
                         revenue.total_revenue == F.col("mx"))
            .join(F.broadcast(supp), revenue.supplier_no == supp.s_suppkey)
            .select("s_suppkey", "s_name", "total_revenue")
            .orderBy("s_suppkey"))


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (Q17): per-part average-quantity
    correlated subquery."""
    part = (load(spark, sf_dir, "part")
            .where((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 20))
            .select("p_partkey"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice")
    avg_qty = (li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "left_semi")
               .groupBy("l_partkey")
               .agg((F.avg("l_quantity") * 0.8).alias("qty_cut")))
    return (li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
            .join(avg_qty, "l_partkey")
            .where(F.col("l_quantity") < F.col("qty_cut"))
            .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly")))


def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (Q22 shape): customers with above-average
    positive balances and no urgent orders, grouped by nation key (stands in
    for the absent phone country code; "no orders at all" is vacuous in this
    data — every customer has orders)."""
    cust = load(spark, sf_dir, "customer")
    avg_bal = (cust.where(F.col("c_acctbal") > 0.0)
               .agg(F.avg("c_acctbal").alias("a")))
    orders = (load(spark, sf_dir, "orders")
              .where(F.col("o_orderpriority") == "1-URGENT")
              .select("o_custkey"))
    return (cust.crossJoin(F.broadcast(avg_bal))
            .where(F.col("c_acctbal") > F.col("a"))
            .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
            .groupBy(F.col("c_nationkey").cast("bigint").alias("cntry"))
            .agg(F.count("*").alias("numcust"),
                 F.round(F.sum("c_acctbal"), 2).alias("totacctbal"))
            .orderBy("cntry"))


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping modes and order priority (Q12 shape): one fact-fact join,
    priority CASE counts per mode class. l_returnflag classes stand in for
    the absent l_shipmode, and "received late" — the commit/receipt date
    predicate — is emulated as shipped more than 30 days after the order
    date."""
    li = (load(spark, sf_dir, "lineitem")
          .where(F.col("l_returnflag").isin("A", "N")
                 & (F.col("l_shipdate") >= F.lit("1996-01-01"))
                 & (F.col("l_shipdate") < F.lit("1997-01-01")))
          .select("l_orderkey", "l_returnflag", "l_shipdate"))
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (li.join(orders, li.l_orderkey == orders.o_orderkey)
            .where(F.col("l_shipdate").cast("date")
                   > F.date_add(F.col("o_orderdate").cast("date"), 30))
            .groupBy("l_returnflag")
            .agg(F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
                 F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"))
            .orderBy("l_returnflag"))


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (Q2 shape). The part-supplier relation is
    distilled from lineitem (no partsupp table in this testdata): supply
    cost = the minimum unit price that supplier ever charged for the part
    (MIN is order-independent, so the derived cost is bit-identical across
    engines). Keeps Q2's signature plan: dimension-filtered join graph +
    per-part correlated MIN + top-k by account balance."""
    from pyspark.sql import Window

    region = load(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load(spark, sf_dir, "nation")
    sn = (load(spark, sf_dir, "supplier")
          .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
          .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
          .select("s_suppkey", "s_name", "s_acctbal", "n_name"))
    part = (load(spark, sf_dir, "part")
            .where(F.col("p_size") == 10).select("p_partkey"))
    # both dimension filters act on grouping keys, so they commute with the
    # aggregation: broadcast-semi-prune lineitem BEFORE the groupBy (the
    # size=10 and ASIA predicates drop ~98% and ~80% of rows) instead of
    # aggregating the whole fact table and discarding most groups after —
    # the one shuffle left carries only qualifying (part, supplier) rows
    li = (load(spark, sf_dir, "lineitem")
          .select("l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
          .join(F.broadcast(part.select(F.col("p_partkey").alias("l_partkey"))),
                "l_partkey", "left_semi")
          .join(F.broadcast(sn.select(F.col("s_suppkey").alias("l_suppkey"))),
                "l_suppkey", "left_semi"))
    # the unit-price quotient is pinned through DECIMAL(18,6) BEFORE the
    # round: rounding the raw double hits multiply-vs-BigDecimal scaling
    # seams at .5 boundaries (found at sf0.1: 478.40075 rounded .4007 by
    # Spark and .4008 by DuckDB). A binary double can never sit exactly ON
    # a 6th-decimal tie, so both engines cast to the SAME decimal and the
    # final ROUND(…, 4) is exact decimal arithmetic on both sides.
    unit = (F.col("l_extendedprice") / F.col("l_quantity")).cast(
        "decimal(18,6)")
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.round(F.min(unit), 4).cast("double").alias("cost")))
    cand = (ps.join(F.broadcast(sn), ps.l_suppkey == sn.s_suppkey)
            .join(F.broadcast(part), ps.l_partkey == part.p_partkey))
    mn = F.min("cost").over(Window.partitionBy("l_partkey"))
    return (cand.withColumn("mn", mn)
            .where(F.col("cost") == F.col("mn"))
            .select("s_acctbal", "s_name", "n_name",
                    F.col("l_partkey").alias("p_partkey"), "cost")
            .orderBy(F.desc("s_acctbal"), "s_name", "p_partkey")
            .limit(100))


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (Q11 shape): per-part supplied value
    for one nation's suppliers, filtered to parts above a global-fraction
    threshold (scalar subquery → broadcast cross-join). Value = shipped
    l_extendedprice·l_quantity in place of supplycost·availqty."""
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey"))
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity")
    vals = (li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey,
                    "left_semi")
            .groupBy("l_partkey")
            .agg(F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
                 .alias("value")))
    cut = vals.agg((F.sum("value") * 0.001).alias("cut"))
    return (vals.crossJoin(F.broadcast(cut))
            .where(F.col("value") > F.col("cut"))
            .select("l_partkey", F.round("value", 2).alias("value"))
            .orderBy(F.desc("value"), "l_partkey"))


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part/supplier relationship count (Q16 shape): distinct supplier count
    per part attribute group, excluding flagged suppliers via anti-join
    (negative account balance stands in for the complaints LIKE — the
    testdata has no s_comment)."""
    pairs = (load(spark, sf_dir, "lineitem")
             .select("l_partkey", "l_suppkey").distinct())
    bad = (load(spark, sf_dir, "supplier")
           .where(F.col("s_acctbal") < 0).select("s_suppkey"))
    part = (load(spark, sf_dir, "part")
            .where((F.col("p_brand") != "Brand#1")
                   & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35, 40, 45))
            .select("p_partkey", "p_brand", "p_type", "p_size"))
    return (pairs.join(F.broadcast(bad), pairs.l_suppkey == bad.s_suppkey,
                       "left_anti")
            .join(F.broadcast(part), pairs.l_partkey == part.p_partkey)
            .groupBy("p_brand", "p_type", "p_size")
            .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
            .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size"))


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (Q20 shape): the nested semi-join chain —
    suppliers (one nation) who hold "excess stock" of name-matched parts.
    Availqty is emulated as the supplier's all-time shipped quantity of the
    part; the threshold is half the part's 1996 shipped total (quantities
    are integral, so both aggregates are exact)."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate")
    ps = (li.groupBy("l_partkey", "l_suppkey")
          .agg(F.sum("l_quantity").alias("qty_total")))
    yr = (li.where((F.col("l_shipdate") >= F.lit("1996-01-01"))
                   & (F.col("l_shipdate") < F.lit("1997-01-01")))
          .groupBy("l_partkey")
          .agg((F.sum("l_quantity") * 0.5).alias("half_qty")))
    parts = (load(spark, sf_dir, "part")
             .where(F.col("p_name").like("%ge%")).select("p_partkey"))
    excess = (ps.join(F.broadcast(parts), ps.l_partkey == parts.p_partkey,
                      "left_semi")
              .join(yr, "l_partkey")
              .where(F.col("qty_total") > F.col("half_qty"))
              .select("l_suppkey").distinct())
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    return (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .join(excess, F.col("s_suppkey") == excess.l_suppkey, "left_semi")
            .select("s_name", "s_acctbal")
            .orderBy("s_name"))


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (Q21 shape): per supplier, count
    finalized multi-supplier orders where THIS supplier was the unique
    latest shipper. l_shipdate's per-order maximum stands in for the absent
    commit/receipt dates; the exists/not-exists pair of the original
    becomes nsupp ≥ 2 ∧ n_latest = 1 computed in one aggregation over the
    per-order max — same semantics, one shuffle less than two correlated
    subqueries."""
    from pyspark.sql import Window

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate")
    # ONE shuffle of lineitem on l_orderkey, then unbounded-frame window
    # aggregates (max date, distinct-supplier sets) instead of a
    # groupBy+join per derived quantity — measured 2.66 s → 0.94 s at
    # sf0.1. Duplicate (order, supplier) latest rows are harmless: the
    # final numwait is a COUNT(DISTINCT l_orderkey).
    w = Window.partitionBy("l_orderkey")
    x = (li.withColumn("mx", F.max("l_shipdate").over(w))
           .withColumn("nsupp", F.size(F.collect_set("l_suppkey").over(w))))
    x = x.withColumn("nlast", F.size(F.collect_set(
            F.when(F.col("l_shipdate") == F.col("mx"),
                   F.col("l_suppkey"))).over(w)))
    waiting = x.where((F.col("l_shipdate") == F.col("mx"))
                      & (F.col("nsupp") >= 2) & (F.col("nlast") == 1))
    orders_f = (load(spark, sf_dir, "orders")
                .where(F.col("o_orderstatus") == "F").select("o_orderkey"))
    nation = load(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_1")
    supp = (load(spark, sf_dir, "supplier")
            .join(F.broadcast(nation),
                  F.col("s_nationkey") == F.col("n_nationkey"))
            .select("s_suppkey", "s_name"))
    return (waiting.join(orders_f, waiting.l_orderkey == orders_f.o_orderkey)
            .join(F.broadcast(supp), waiting.l_suppkey == supp.s_suppkey)
            .groupBy("s_name")
            .agg(F.countDistinct("l_orderkey").alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(100))


QUERIES = {
    "q_tpch_q1": q_tpch_q1,
    "q_tpch_q2": q_tpch_q2,
    "q_tpch_q11": q_tpch_q11,
    "q_tpch_q12": q_tpch_q12,
    "q_tpch_q16": q_tpch_q16,
    "q_tpch_q20": q_tpch_q20,
    "q_tpch_q21": q_tpch_q21,
    "q_tpch_q3": q_tpch_q3,
    "q_tpch_q4": q_tpch_q4,
    "q_tpch_q5": q_tpch_q5,
    "q_tpch_q6": q_tpch_q6,
    "q_tpch_q7": q_tpch_q7,
    "q_tpch_q8": q_tpch_q8,
    "q_tpch_q9": q_tpch_q9,
    "q_tpch_q10": q_tpch_q10,
    "q_tpch_q13": q_tpch_q13,
    "q_tpch_q14": q_tpch_q14,
    "q_tpch_q15": q_tpch_q15,
    "q_tpch_q17": q_tpch_q17,
    "q_tpch_q18": q_tpch_q18,
    "q_tpch_q19": q_tpch_q19,
    "q_tpch_q22": q_tpch_q22,
}

_REV = "l_extendedprice * (1 - l_discount)"

ORACLES = {
    "q_tpch_q2": (
        "WITH ps AS (SELECT l_partkey, l_suppkey, "
        "CAST(ROUND(MIN(CAST(l_extendedprice / l_quantity "
        "AS DECIMAL(18,6))), 4) AS DOUBLE) AS cost "
        "FROM lineitem GROUP BY l_partkey, l_suppkey), "
        "cand AS (SELECT s_acctbal, s_name, n_name, "
        "l_partkey AS p_partkey, cost, "
        "MIN(cost) OVER (PARTITION BY l_partkey) AS mn "
        "FROM ps JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE r_name = 'ASIA' AND p_size = 10) "
        "SELECT s_acctbal, s_name, n_name, p_partkey, cost FROM cand "
        "WHERE cost = mn "
        "ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100"),
    "q_tpch_q11": (
        "WITH vals AS (SELECT l_partkey, "
        "SUM(l_extendedprice * l_quantity) AS value "
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_1' GROUP BY l_partkey) "
        "SELECT l_partkey, ROUND(value, 2) AS value FROM vals "
        "WHERE value > (SELECT SUM(value) * 0.001 FROM vals) "
        "ORDER BY value DESC, l_partkey"),
    "q_tpch_q12": (
        "SELECT l_returnflag, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_returnflag IN ('A', 'N') "
        "AND l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND CAST(l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + 30 "
        "GROUP BY l_returnflag ORDER BY l_returnflag"),
    "q_tpch_q16": (
        "SELECT p_brand, p_type, p_size, "
        "COUNT(DISTINCT l_suppkey) AS supplier_cnt "
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand <> 'Brand#1' "
        "AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35, 40, 45) "
        "AND l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY p_brand, p_type, p_size "
        "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"),
    "q_tpch_q20": (
        "WITH ps AS (SELECT l_partkey, l_suppkey, "
        "SUM(l_quantity) AS qty_total FROM lineitem "
        "GROUP BY l_partkey, l_suppkey), "
        "yr AS (SELECT l_partkey, SUM(l_quantity) * 0.5 AS half_qty "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' GROUP BY l_partkey) "
        "SELECT s_name, s_acctbal FROM supplier "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE n_name = 'NATION_1' AND s_suppkey IN "
        "(SELECT ps.l_suppkey FROM ps "
        "JOIN yr ON ps.l_partkey = yr.l_partkey "
        "WHERE ps.l_partkey IN "
        "(SELECT p_partkey FROM part WHERE p_name LIKE '%ge%') "
        "AND ps.qty_total > yr.half_qty) "
        "ORDER BY s_name"),
    "q_tpch_q21": (
        "WITH lmax AS (SELECT l_orderkey, MAX(l_shipdate) AS mx "
        "FROM lineitem GROUP BY l_orderkey), "
        "per_order AS (SELECT l.l_orderkey, "
        "COUNT(DISTINCT l.l_suppkey) AS nsupp, "
        "COUNT(DISTINCT CASE WHEN l.l_shipdate = lmax.mx "
        "THEN l.l_suppkey END) AS nlast "
        "FROM lineitem l JOIN lmax ON l.l_orderkey = lmax.l_orderkey "
        "GROUP BY l.l_orderkey), "
        "waiting AS (SELECT DISTINCT l.l_orderkey, l.l_suppkey "
        "FROM lineitem l JOIN lmax ON l.l_orderkey = lmax.l_orderkey "
        "AND l.l_shipdate = lmax.mx "
        "JOIN per_order po ON po.l_orderkey = l.l_orderkey "
        "WHERE po.nsupp >= 2 AND po.nlast = 1) "
        "SELECT s_name, COUNT(DISTINCT w.l_orderkey) AS numwait "
        "FROM waiting w JOIN orders ON w.l_orderkey = o_orderkey "
        "JOIN supplier ON w.l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE o_orderstatus = 'F' AND n_name = 'NATION_1' "
        "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 100"),
    "q_tpch_q1": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        f"ROUND(SUM({_REV}), 2) AS sum_disc_price, "
        f"ROUND(SUM({_REV} * (1 + l_tax)), 2) AS sum_charge, "
        "ROUND(AVG(l_quantity), 6) AS avg_qty, "
        "ROUND(AVG(l_extendedprice), 6) AS avg_price, "
        "ROUND(AVG(l_discount), 6) AS avg_disc, "
        "COUNT(*) AS count_order "
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02' "
        "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"),
    "q_tpch_q3": (
        f"SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate, "
        f"ROUND(SUM({_REV}), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND o_orderdate < TIMESTAMP '1996-03-15' "
        "AND l_shipdate > TIMESTAMP '1996-03-15' "
        "GROUP BY l_orderkey, CAST(o_orderdate AS DATE) "
        "ORDER BY revenue DESC, l_orderkey LIMIT 10"),
    "q_tpch_q4": (
        "SELECT o_orderpriority, COUNT(*) AS order_count FROM orders "
        "WHERE o_orderdate >= TIMESTAMP '1996-07-01' "
        "AND o_orderdate < TIMESTAMP '1996-10-01' "
        "AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey "
        "AND l_shipdate > o_orderdate) "
        "GROUP BY o_orderpriority ORDER BY o_orderpriority"),
    "q_tpch_q5": (
        f"SELECT n_name, ROUND(SUM({_REV}), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' "
        "GROUP BY n_name ORDER BY revenue DESC, n_name"),
    "q_tpch_q6": (
        "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"),
    "q_tpch_q7": (
        "SELECT supp_nation, cust_nation, l_year, ROUND(SUM(volume), 2) AS revenue FROM ("
        "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, "
        f"CAST(YEAR(l_shipdate) AS BIGINT) AS l_year, {_REV} AS volume "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation n1 ON s_nationkey = n1.n_nationkey "
        "JOIN nation n2 ON c_nationkey = n2.n_nationkey "
        "WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2') "
        "OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')"
        ") GROUP BY supp_nation, cust_nation, l_year "
        "ORDER BY supp_nation, cust_nation, l_year"),
    "q_tpch_q8": (
        "SELECT o_year, ROUND(SUM(CASE WHEN supp_nation = 'NATION_3' "
        "THEN volume ELSE 0.0 END) / SUM(volume), 6) AS mkt_share FROM ("
        "SELECT CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, "
        f"{_REV} AS volume, n2.n_name AS supp_nation "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation n1 ON c_nationkey = n1.n_nationkey "
        "JOIN region ON n1.n_regionkey = r_regionkey "
        "JOIN nation n2 ON s_nationkey = n2.n_nationkey "
        "WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'"
        ") GROUP BY o_year ORDER BY o_year"),
    "q_tpch_q9": (
        f"SELECT n_name AS nation, CAST(YEAR(o_orderdate) AS BIGINT) AS o_year, "
        f"ROUND(SUM({_REV}), 0) AS sum_profit "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "WHERE p_name LIKE '%widget%' "
        "GROUP BY n_name, o_year ORDER BY n_name, o_year DESC"),
    "q_tpch_q10": (
        "SELECT c_custkey, c_name, c_acctbal, n_name, "
        f"ROUND(SUM({_REV}), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE o_orderdate >= TIMESTAMP '1996-10-01' "
        "AND o_orderdate < TIMESTAMP '1997-01-01' AND l_returnflag = 'R' "
        "GROUP BY c_custkey, c_name, c_acctbal, n_name "
        "ORDER BY revenue DESC, c_custkey LIMIT 20"),
    "q_tpch_q13": (
        "SELECT c_count, COUNT(*) AS custdist FROM ("
        "SELECT c_custkey, COUNT(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN orders ON c_custkey = o_custkey "
        "AND o_orderpriority <> '1-URGENT' "
        "GROUP BY c_custkey) "
        "GROUP BY c_count ORDER BY custdist DESC, c_count DESC"),
    "q_tpch_q14": (
        f"SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'ECONOMY' THEN {_REV} "
        f"ELSE 0.0 END) / SUM({_REV}), 4) AS promo_revenue_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-09-01' "
        "AND l_shipdate < TIMESTAMP '1996-10-01'"),
    "q_tpch_q15": (
        "WITH revenue AS (SELECT l_suppkey AS supplier_no, "
        f"ROUND(SUM({_REV}), 2) AS total_revenue "
        "FROM lineitem WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1996-04-01' GROUP BY l_suppkey) "
        "SELECT s_suppkey, s_name, total_revenue "
        "FROM revenue JOIN supplier ON supplier_no = s_suppkey "
        "WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue) "
        "ORDER BY s_suppkey"),
    "q_tpch_q17": (
        "SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand = 'Brand#1' AND p_size <= 20 "
        "AND l_quantity < (SELECT AVG(l_quantity) * 0.8 FROM lineitem l2 "
        "WHERE l2.l_partkey = lineitem.l_partkey)"),
    "q_tpch_q18": (
        "SELECT c_name, c_custkey, o_orderkey, "
        "CAST(o_orderdate AS DATE) AS o_orderdate, o_totalprice, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty "
        "FROM orders JOIN customer ON o_custkey = c_custkey "
        "JOIN lineitem ON o_orderkey = l_orderkey "
        "WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem "
        "GROUP BY l_orderkey HAVING SUM(l_quantity) > 300) "
        "GROUP BY c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE), o_totalprice "
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"),
    "q_tpch_q19": (
        f"SELECT ROUND(SUM({_REV}), 2) AS revenue "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 "
        "AND l_quantity BETWEEN 1 AND 11) "
        "OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 "
        "AND l_quantity BETWEEN 10 AND 20) "
        "OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 "
        "AND l_quantity BETWEEN 20 AND 30)"),
    "q_tpch_q22": (
        "SELECT CAST(c_nationkey AS BIGINT) AS cntry, COUNT(*) AS numcust, "
        "ROUND(SUM(c_acctbal), 2) AS totacctbal "
        "FROM customer WHERE c_acctbal > "
        "(SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0) "
        "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND o_orderpriority = '1-URGENT') "
        "GROUP BY cntry ORDER BY cntry"),
}
