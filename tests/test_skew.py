"""Salted aggregation: value-equivalence with the direct groupBy and the
two-exchange plan shape that spreads a hot key."""

from __future__ import annotations

import pyspark.sql.functions as F

from acero_delta_lake_streaming_spark.catalog import load_table
from acero_delta_lake_streaming_spark.plans.skew import salted_agg


def test_salted_agg_equals_direct(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    direct = {
        (r.l_returnflag): (r.n, round(r.total, 2), r.mx)
        for r in li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("total"),
            F.max("l_quantity").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r.l_returnflag): (r.n, round(r.total, 2), r.mx)
        for r in salted_agg(
            li,
            ["l_returnflag"],
            {
                "n": ("sum", F.count(F.lit(1))),
                "total": ("sum", F.sum("l_quantity")),
                "mx": ("max", F.max("l_quantity")),
            },
        ).collect()
    }
    assert salted == direct


def test_salted_agg_plan_two_stages(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    plan = (
        salted_agg(li, ["l_returnflag"], {"n": ("sum", F.count(F.lit(1)))})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the hot key is spread over (key, salt) before the per-key merge
    assert "__salt" in plan
    assert plan.count("Exchange") >= 2


def test_salted_join_equals_direct_and_broadcasts_hot(spark, sf_dir):
    """salted_join must return exactly the plain join's rows, and its
    hot path must be broadcast (the hot key never shuffles)."""
    from acero_delta_lake_streaming_spark.plans.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    # declare the 3 highest-volume orderkeys "hot"
    hot = (
        li.groupBy("l_orderkey").count()
        .orderBy(F.desc("count"), "l_orderkey").limit(3)
        .select("l_orderkey")
    )
    direct = li.join(orders, "l_orderkey")
    split = salted_join(li, orders, "l_orderkey", hot)
    a = sorted(map(tuple, direct.collect()))
    b = sorted(map(tuple, split.collect()))
    assert a == b and len(a) > 0
    plan = split._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
