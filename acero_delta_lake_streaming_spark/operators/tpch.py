"""Headline analytical queries (TPC-H-shaped) over the star-schema fixtures.

The reference's analytical workload is five dashboard panels over two small
tables (visualizer.py:85-184); these queries are the same operator classes
(filter → join → group → top-k) at star-schema scale, and double as the
bench.py anchors. Aggregate doubles are rounded to 2 decimals on both sides
so summation-order ULP differences between engines never flip the hash.

Scale notes:
* Q1 is the canonical partial-aggregation stress: 600k rows → 6 groups,
  map-side combine reduces shuffle to |groups| per task.
* Q3/Q5 are multiway joins: dimension sides are filtered first and
  broadcast (AQE converts to broadcast-hash when < threshold); the fact
  table never shuffles for the dimension joins.
* Q6 is pure scan+filter+sum — at 100 TB it's bounded by parquet I/O and
  predicate pushdown, which `.explain` confirms reaches the scan.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.functions.timeutil import (
    day_between,
    day_ge,
    day_gt,
    day_le,
    day_lt,
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: big scan, 6-group aggregate with several measures."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(day_le("l_shipdate", "2000-12-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dimension filter → fact join → top-k by
    revenue. Customer side is broadcast; top-10 via TakeOrderedAndProject."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        day_lt("o_orderdate", "1998-01-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        day_gt("l_shipdate", "1996-01-01")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"))
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 5-way join through the dimension chain, revenue per
    nation. All dimensions broadcast; only the order/lineitem join shuffles
    (and AQE will broadcast the filtered orders side at small SF)."""
    region = load_table(spark, sf_dir, "region")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        day_between("o_orderdate", "1995-01-01", "1997-12-31")
    )
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: scan + pushed-down conjunctive filter + single sum."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue")
        )
    )


def q4_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS-correlated semi join with a non-equi
    condition (a lineitem shipped after the order date), counted by
    priority. The semi join shuffles on orderkey once; the extra
    predicate rides along, no second pass."""
    orders = load_table(spark, sf_dir, "orders").filter(
        day_between("o_orderdate", "1995-01-01", "1996-12-31")
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q7_nation_trade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: supplier-nation × customer-nation trade volume by
    year. Both nation dimensions broadcast twice under different aliases;
    the fact side shuffles only for the orderkey join."""
    nation = load_table(spark, sf_dir, "nation")
    supp_nation = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1995-01-01", "1996-12-31")
    )
    # Decimal accumulation: with ~1200 output groups, double-sum ULP
    # differences vs the oracle land on rounding boundaries; decimal
    # addition is exact and order-independent, so partial aggregation
    # order can't flip the rounded result.
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("c_nk"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        pairs.groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(
            F.round(F.sum(revenue), 2).cast("double").alias("revenue")
        )
    )


def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue with
    their nation; TakeOrderedAndProject caps the shuffle at k rows per
    partition."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        day_between("o_orderdate", "1995-01-01", "1995-12-31")
    )
    li = load_table(spark, sf_dir, "lineitem").filter("l_returnflag = 'R'")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(revenue), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregate ratio (promo parts' share
    of revenue) over one month; the part dimension broadcasts."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1996-03-01", "1996-03-31")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    promo = F.sum(F.when(F.col("p_type") == "PROMO", revenue).otherwise(0.0))
    return joined.agg(
        F.round(100.0 * promo / F.sum(revenue), 4).alias("promo_share_pct")
    )


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING on a grouped sum, then join back to the
    order/customer detail; the qualifying-keys side is small and
    broadcast back against the facts."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 180)
    )
    return (
        orders.join(F.broadcast(big), orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("o_date"),
            "o_totalprice",
            "total_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(50)
    )


def q19_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs disjunctive predicate across the
    part join — Catalyst extracts the common partkey equi-condition, the
    disjunction evaluates post-join on the broadcast side."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    joined = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#11") & (F.col("p_size") <= 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#22") & (F.col("p_size") <= 25)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#33") & (F.col("p_size") <= 35)
           & F.col("l_quantity").between(20, 40))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return joined.filter(cond).agg(
        F.round(F.sum(revenue), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and year for a part
    subset (LIKE filter broadcast through the part dimension); profit =
    revenue minus a retail-price-based cost proxy (the fixture lacks
    ps_supplycost). Decimal accumulation for cross-engine rounding."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("red")
    )
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    ).cast("decimal(18,6)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's share of a region's market for one
    part type, by order year — conditional-sum ratio over a 7-way join.
    Every dimension (part subset, supplier, customer, both nation roles,
    region) broadcasts; the only shuffle is lineitem⋈orders on orderkey
    and the final tiny per-year aggregate. Volume accumulates in
    decimal(18,6) so numerator and denominator are exact before the one
    double division (CLAUDE.md decimal invariant)."""
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    ).select("p_partkey")
    supplier = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").filter(
        day_between("o_orderdate", "1995-01-01", "1996-12-31")
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    cust_nation = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    supp_nation = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    vol = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    base = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(cust_nation), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(region), F.col("c_rk") == region.r_regionkey)
        .join(F.broadcast(supp_nation), F.col("s_nationkey") == F.col("s_nk"))
    )
    target = F.when(F.col("supp_nation") == "NATION_6", vol).otherwise(
        F.lit(0).cast("decimal(18,6)")
    )
    return (
        base.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(target).cast("double") / F.sum(vol).cast("double"), 6
            ).alias("mkt_share")
        )
    )


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: per-supplier revenue over one quarter, keep the
    supplier(s) at the global maximum — aggregate, scalar-max, equality
    join-back. Revenue stays decimal(18,6) through the max comparison so
    the tie test is exact (a double max would make 'equals the max' a
    ULP lottery); rounding to display precision happens after."""
    supplier = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        day_between("l_shipdate", "1996-01-01", "1996-03-31")
    )
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(18,6)"
    )
    per_supp = li.groupBy("l_suppkey").agg(F.sum(rev).alias("total_rev"))
    mx = per_supp.agg(F.max("total_rev").alias("max_rev")).withColumn(
        "jk", F.lit(1)
    )
    return (
        per_supp.withColumn("jk", F.lit(1))
        .join(F.broadcast(mx), "jk")
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == supplier.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 2).alias(
                "total_revenue"
            ),
        )
    )


def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (partsupp stands in as lineitem revenue): per-key
    totals kept only when they exceed a fraction of the GLOBAL total —
    aggregate + HAVING against a scalar subquery. Both the per-part and
    the global sums accumulate in decimal(18,6) (the strict threshold
    comparison is the boundary-flip surface); the 1-row global joins
    back via broadcast, Spark's own physical shape for an uncorrelated
    scalar subquery."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
    ).cast("decimal(18,6)")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(rev).cast("double").alias("v")
    )
    tot = (
        per_part.agg(
            F.sum(F.col("v").cast("decimal(18,6)")).cast("double").alias("t")
        )
        .withColumn("jk", F.lit(1))
    )
    return (
        per_part.withColumn("jk", F.lit(1))
        .join(F.broadcast(tot), "jk")
        .filter(F.col("v") > F.col("t") * 0.0005)
        .select("l_partkey", F.round("v", 2).alias("part_revenue"))
    )


def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join with a join-side predicate, then a
    distribution over the per-key counts (two cascaded aggregations).
    The outer join keeps zero-order customers — the c_count=0 bucket is
    the part an inner join would silently lose."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_custkey", "o_orderkey")
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar subquery (per-part average
    quantity) decorrelated into a window over the part key — one shuffle
    on l_partkey instead of a per-row subquery. The per-part average
    accumulates in decimal(18,6): the 0.2·avg threshold feeds a strict
    comparison, and a ULP of partial-agg drift there flips rows in and
    out of the sum (CLAUDE.md's decimal invariant)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    ).select("p_partkey")
    li_p = li.join(
        F.broadcast(parts), li.l_partkey == parts.p_partkey
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    w = Window.partitionBy("l_partkey")
    avg_q = (
        F.sum(F.col("l_quantity").cast("decimal(18,6)")).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li_p.withColumn("avg_q", avg_q)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_q"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,6)")
                ).cast("double")
                / 7.0,
                2,
            ).alias("avg_yearly")
        )
    )


def q22_dormant_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (nationkey standing in for the phone country
    code): customers with above-average positive balance and no orders
    since 2000 — a scalar-aggregate threshold feeding a left anti join.
    The dummy-key join against the 1-row aggregate constant-folds into a
    single-build-row BroadcastNestedLoopJoin — that is Spark's own
    physical shape for an uncorrelated scalar subquery (O(|cust|·1),
    no blowup), chosen here over a driver-side collect which would break
    the no-collect invariant. Non-vacuous by construction (every fixture customer
    has SOME order, so plain no-orders would test nothing; 55 rows at
    sf0.01). Threshold and totals accumulate in decimal(18,6) for the
    same boundary-flip reason as q17."""
    cust = load_table(spark, sf_dir, "customer")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(day_ge("o_orderdate", "2000-01-01"))
        .select("o_custkey")
    )
    thr = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_bal")
        )
        .withColumn("jk", F.lit(1))
    )
    rich = (
        cust.withColumn("jk", F.lit(1))
        .join(F.broadcast(thr), "jk")
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
    )
    dormant = rich.join(
        orders, rich.c_custkey == orders.o_custkey, "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(
            F.sum(F.col("c_acctbal").cast("decimal(18,6)")).cast("double"), 2
        ).alias("totacctbal"),
    )


def q2_cheapest_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: groupwise-minimum selection — the correlated
    ``price = (SELECT min(...) WHERE same group)`` subquery decorrelated
    into a min-window over p_type (one shuffle on the group key; the
    classic plan would re-scan part per row). Equality on the min is
    safe float-wise: selection of an existing value, no arithmetic."""
    from pyspark.sql import Window

    part = load_table(spark, sf_dir, "part")
    w = Window.partitionBy("p_type")
    return (
        part.withColumn("mp", F.min("p_retailprice").over(w))
        .filter(F.col("p_retailprice") == F.col("mp"))
        .select(
            "p_type",
            "p_partkey",
            "p_name",
            "p_brand",
            F.round("p_retailprice", 2).alias("p_retailprice"),
        )
    )


def q12_priority_class_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (l_linestatus standing in for l_shipmode): fact-
    fact join then a two-way conditional aggregation — counts of
    critical vs non-critical order priorities per line class in one
    pass. Integer-only measures; the orderkey join is the one shuffle
    (co-located for free under the bucketed layout proven in
    tests/test_bucketing.py)."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(
            day_ge("l_shipdate", "1996-01-01")
            & day_lt("l_shipdate", "1998-01-01")
        )
        .select("l_orderkey", "l_linestatus")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    crit = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(crit, 1).otherwise(0))
            .cast("bigint")
            .alias("high_line_count"),
            F.sum(F.when(crit, 0).otherwise(1))
            .cast("bigint")
            .alias("low_line_count"),
        )
    )


def q16_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (lineitem is the part↔supplier association —
    the fixtures ship no partsupp): distinct supplier count per part
    attribute triple, for parts outside an excluded brand/type and
    suppliers outside a NOT-IN set (negative balances). No standalone
    distinct on the fact projection: the final countDistinct's partial
    aggregate already collapses duplicate (part, supplier) pairs
    map-side before its shuffle, so a pre-distinct was a second full
    exchange of the same keys for the same result (guide §2.4 — a
    distinct on data the aggregate dedups anyway; removed r13, one
    Exchange fewer, 2.0 -> measured in OPTIMIZATION_r13.md). Both
    dimension joins broadcast."""
    assoc = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey"
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    parts = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4") & (~F.col("p_type").like("MEDIUM%"))
    )
    return (
        assoc.join(
            F.broadcast(bad), assoc.l_suppkey == bad.s_suppkey, "left_anti"
        )
        .join(F.broadcast(parts), assoc.l_partkey == parts.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


def q20_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested aggregate inside a semi-join chain —
    suppliers in one nation who moved more than a threshold of 'red'
    parts in 1996. The per-(supplier, part) sum accumulates in
    decimal(18,6) (strict > threshold is a boundary-flip surface); both
    dimension probes broadcast; the supplier list reduces via left-semi
    so no duplicate s_name rows ever materialize."""
    red = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        day_ge("l_shipdate", "1996-01-01") & day_lt("l_shipdate", "1997-01-01")
    )
    moved = (
        li.join(F.broadcast(red), li.l_partkey == red.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(18,6)"))
            .cast("double")
            .alias("qty")
        )
        .filter(F.col("qty") > 40.0)
        .select("l_suppkey")
        .distinct()
    )
    nat = load_table(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    supp = load_table(spark, sf_dir, "supplier").join(
        F.broadcast(nat),
        F.col("s_nationkey") == F.col("n_nationkey"),
        "left_semi",
    )
    return supp.join(
        moved, supp.s_suppkey == moved.l_suppkey, "left_semi"
    ).select("s_suppkey", "s_name")


def q21_sole_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: the EXISTS / NOT-EXISTS double correlation —
    suppliers credited for finished orders where no OTHER supplier
    shipped a line. Decorrelated: distinct (order, supplier) pairs,
    per-order supplier count, keep n_supp = 1 — two aggregations on
    the same orderkey partitioning instead of two correlated rescans
    of lineitem (the oracle keeps the NOT EXISTS form to prove
    equivalence)."""
    pairs = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    n_supp = pairs.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp")
    )
    solo = pairs.join(
        n_supp.filter(F.col("n_supp") == 1).select("l_orderkey"),
        "l_orderkey",
        "left_semi",
    )
    fin = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    per_supp = (
        solo.join(fin, solo.l_orderkey == fin.o_orderkey)
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return per_supp.join(
        F.broadcast(supp), per_supp.l_suppkey == supp.s_suppkey
    ).select("s_name", "numwait")


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q2_cheapest_part": q2_cheapest_part,
    "q12_priority_class_shipping": q12_priority_class_shipping,
    "q16_supplier_variety": q16_supplier_variety,
    "q20_excess_shippers": q20_excess_shippers,
    "q21_sole_supplier_orders": q21_sole_supplier_orders,
    "q3_shipping_priority": q3_shipping_priority,
    "q4_late_shipment_priority": q4_late_shipment_priority,
    "q5_region_revenue": q5_region_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q7_nation_trade": q7_nation_trade,
    "q8_market_share": q8_market_share,
    "q9_product_profit": q9_product_profit,
    "q10_returned_revenue": q10_returned_revenue,
    "q11_important_parts": q11_important_parts,
    "q13_customer_distribution": q13_customer_distribution,
    "q14_promo_revenue_share": q14_promo_revenue_share,
    "q15_top_supplier": q15_top_supplier,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
    "q18_large_orders": q18_large_orders,
    "q19_brand_revenue": q19_brand_revenue,
    "q22_dormant_balances": q22_dormant_balances,
}

ORACLES = {
    "q2_cheapest_part": (
        "SELECT p_type, p_partkey, p_name, p_brand, "
        "round(p_retailprice, 2) AS p_retailprice FROM ("
        "SELECT *, min(p_retailprice) OVER (PARTITION BY p_type) AS mp "
        "FROM part) WHERE p_retailprice = mp"
    ),
    "q12_priority_class_shipping": (
        "SELECT l_linestatus, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, "
        "CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') "
        "THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "WHERE l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1998-01-01' GROUP BY 1"
    ),
    "q16_supplier_variety": (
        "SELECT p_brand, p_type, p_size, "
        "CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt "
        "FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) a "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE p_brand <> 'Brand#4' AND p_type NOT LIKE 'MEDIUM%' "
        "AND l_suppkey NOT IN "
        "(SELECT s_suppkey FROM supplier WHERE s_acctbal < 0) "
        "GROUP BY 1, 2, 3"
    ),
    "q20_excess_shippers": (
        "SELECT s_suppkey, s_name FROM supplier "
        "WHERE s_nationkey IN "
        "(SELECT n_nationkey FROM nation WHERE n_name = 'NATION_3') "
        "AND s_suppkey IN (SELECT l_suppkey FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "WHERE p_name LIKE 'red%' "
        "AND l_shipdate >= TIMESTAMP '1996-01-01' "
        "AND l_shipdate < TIMESTAMP '1997-01-01' "
        "GROUP BY l_suppkey, l_partkey "
        "HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) "
        "> 40.0)"
    ),
    "q21_sole_supplier_orders": (
        "WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey "
        "FROM lineitem) "
        "SELECT s_name, CAST(count(*) AS BIGINT) AS numwait "
        "FROM pairs p "
        "JOIN orders ON o_orderkey = p.l_orderkey AND o_orderstatus = 'F' "
        "JOIN supplier ON s_suppkey = p.l_suppkey "
        "WHERE NOT EXISTS (SELECT 1 FROM lineitem l2 "
        "WHERE l2.l_orderkey = p.l_orderkey "
        "AND l2.l_suppkey <> p.l_suppkey) "
        "GROUP BY 1"
    ),
    "q1_pricing_summary": (
        "SELECT l_returnflag, l_linestatus, "
        "ROUND(SUM(l_quantity), 2) AS sum_qty, "
        "ROUND(SUM(l_extendedprice), 2) AS sum_base_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) "
        "  AS sum_charge, "
        "ROUND(AVG(l_quantity), 2) AS avg_qty, "
        "ROUND(AVG(l_extendedprice), 2) AS avg_price, "
        "ROUND(AVG(l_discount), 4) AS avg_disc, "
        "count(*) AS count_order "
        "FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '2000-12-01' "
        "GROUP BY 1, 2"
    ),
    "q3_shipping_priority": (
        "SELECT l_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "WHERE c_mktsegment = 'BUILDING' "
        "AND CAST(o_orderdate AS DATE) < DATE '1998-01-01' "
        "AND CAST(l_shipdate AS DATE) > DATE '1996-01-01' "
        "GROUP BY 1, 2 ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
    ),
    "q5_region_revenue": (
        "SELECT r_name, n_name, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "JOIN region ON n_regionkey = r_regionkey "
        "WHERE CAST(o_orderdate AS DATE) "
        "BETWEEN DATE '1995-01-01' AND DATE '1997-12-31' "
        "GROUP BY 1, 2"
    ),
    "q6_forecast_revenue": (
        "SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue "
        "FROM lineitem WHERE l_discount BETWEEN 0.05 AND 0.07 "
        "AND l_quantity < 24"
    ),
    "q4_late_shipment_priority": (
        "SELECT o_orderpriority, count(*) AS order_count FROM orders "
        "WHERE CAST(o_orderdate AS DATE) "
        "BETWEEN DATE '1995-01-01' AND DATE '1996-12-31' "
        "AND EXISTS (SELECT 1 FROM lineitem "
        "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) "
        "GROUP BY 1"
    ),
    "q7_nation_trade": (
        "SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation, "
        "CAST(year(l_shipdate) AS INT) AS l_year, "
        "CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) "
        "AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "WHERE CAST(l_shipdate AS DATE) "
        "BETWEEN DATE '1995-01-01' AND DATE '1996-12-31' "
        "AND sn.n_name <> cn.n_name "
        "GROUP BY 1, 2, 3"
    ),
    "q9_product_profit": (
        "SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year, "
        "CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount) "
        "- p_retailprice * l_quantity * 0.1 AS DECIMAL(18,6))), 2) AS DOUBLE) "
        "AS profit "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN nation ON s_nationkey = n_nationkey "
        "WHERE contains(p_name, 'red') "
        "GROUP BY 1, 2"
    ),
    "q10_returned_revenue": (
        "SELECT c_custkey, c_name, n_name, "
        "ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue "
        "FROM lineitem "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation ON c_nationkey = n_nationkey "
        "WHERE l_returnflag = 'R' "
        "AND CAST(o_orderdate AS DATE) "
        "BETWEEN DATE '1995-01-01' AND DATE '1995-12-31' "
        "GROUP BY 1, 2, 3 ORDER BY revenue DESC, c_custkey ASC LIMIT 20"
    ),
    "q14_promo_revenue_share": (
        "SELECT ROUND(100.0 * "
        "SUM(CASE WHEN p_type = 'PROMO' "
        "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) / "
        "SUM(l_extendedprice * (1 - l_discount)), 4) AS promo_share_pct "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE CAST(l_shipdate AS DATE) "
        "BETWEEN DATE '1996-03-01' AND DATE '1996-03-31'"
    ),
    "q18_large_orders": (
        "WITH big AS (SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty "
        "FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 180) "
        "SELECT c_custkey, c_name, o_orderkey, "
        "strftime(o_orderdate, '%Y-%m-%d') AS o_date, o_totalprice, total_qty "
        "FROM orders JOIN big ON o_orderkey = l_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50"
    ),
    "q19_brand_revenue": (
        "SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
        "count(*) AS n_items "
        "FROM lineitem JOIN part ON l_partkey = p_partkey "
        "WHERE (p_brand = 'Brand#11' AND p_size <= 15 "
        "AND l_quantity BETWEEN 1 AND 20) "
        "OR (p_brand = 'Brand#22' AND p_size <= 25 "
        "AND l_quantity BETWEEN 10 AND 30) "
        "OR (p_brand = 'Brand#33' AND p_size <= 35 "
        "AND l_quantity BETWEEN 20 AND 40)"
    ),
    "q8_market_share": (
        "SELECT CAST(year(o_orderdate) AS INT) AS o_year, "
        "ROUND(CAST(SUM(CASE WHEN sn.n_name = 'NATION_6' "
        "THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6)) "
        "ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE) "
        "/ CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
        "AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share "
        "FROM lineitem "
        "JOIN part ON l_partkey = p_partkey "
        "JOIN supplier ON l_suppkey = s_suppkey "
        "JOIN orders ON l_orderkey = o_orderkey "
        "JOIN customer ON o_custkey = c_custkey "
        "JOIN nation cn ON c_nationkey = cn.n_nationkey "
        "JOIN region ON cn.n_regionkey = r_regionkey "
        "JOIN nation sn ON s_nationkey = sn.n_nationkey "
        "WHERE p_type = 'ECONOMY' AND r_name = 'AMERICA' "
        "AND CAST(o_orderdate AS DATE) "
        "BETWEEN DATE '1995-01-01' AND DATE '1996-12-31' "
        "GROUP BY 1"
    ),
    "q15_top_supplier": (
        "WITH per_supp AS (SELECT l_suppkey, "
        "SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) "
        "AS total_rev FROM lineitem "
        "WHERE CAST(l_shipdate AS DATE) "
        "BETWEEN DATE '1996-01-01' AND DATE '1996-03-31' GROUP BY 1) "
        "SELECT s_suppkey, s_name, "
        "ROUND(CAST(total_rev AS DOUBLE), 2) AS total_revenue "
        "FROM per_supp JOIN supplier ON l_suppkey = s_suppkey "
        "WHERE total_rev = (SELECT MAX(total_rev) FROM per_supp)"
    ),
    "q11_important_parts": (
        "WITH per_part AS (SELECT l_partkey, "
        "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) "
        "AS DECIMAL(18,6))) AS DOUBLE) AS v FROM lineitem GROUP BY 1), "
        "tot AS (SELECT CAST(SUM(CAST(v AS DECIMAL(18,6))) AS DOUBLE) AS t "
        "FROM per_part) "
        "SELECT l_partkey, round(v, 2) AS part_revenue "
        "FROM per_part JOIN tot ON v > t * CAST(0.0005 AS DOUBLE)"
    ),
    "q13_customer_distribution": (
        "WITH o AS (SELECT o_custkey, o_orderkey FROM orders "
        "WHERE o_orderpriority <> '1-URGENT'), "
        "per_cust AS (SELECT c_custkey, count(o_orderkey) AS c_count "
        "FROM customer LEFT JOIN o ON c_custkey = o_custkey GROUP BY 1) "
        "SELECT c_count, count(*) AS custdist FROM per_cust GROUP BY 1"
    ),
    "q17_small_quantity_revenue": (
        "WITH li_p AS (SELECT l_partkey, l_quantity, l_extendedprice "
        "FROM lineitem JOIN part ON p_partkey = l_partkey "
        "WHERE p_brand = 'Brand#23'), "
        "st AS (SELECT *, "
        "CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) OVER "
        "(PARTITION BY l_partkey) AS DOUBLE) "
        "/ (COUNT(*) OVER (PARTITION BY l_partkey)) AS avg_q FROM li_p) "
        "SELECT ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) "
        "AS DOUBLE) / 7.0, 2) AS avg_yearly "
        "FROM st WHERE l_quantity < CAST(0.2 AS DOUBLE) * avg_q"
    ),
    "q22_dormant_balances": (
        "WITH thr AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) "
        "AS DOUBLE) / COUNT(*) AS avg_bal "
        "FROM customer WHERE c_acctbal > 0) "
        "SELECT c_nationkey, count(*) AS numcust, "
        "ROUND(CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) "
        "AS totacctbal "
        "FROM customer JOIN thr ON c_acctbal > avg_bal "
        "WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
        "AND CAST(o_orderdate AS DATE) >= DATE '2000-01-01') "
        "GROUP BY 1"
    ),
}
