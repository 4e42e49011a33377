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


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_region_revenue": q5_region_revenue,
    "q6_forecast_revenue": q6_forecast_revenue,
}

ORACLES = {
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
}
