"""Bucketed co-located joins — the fact-fact shuffle remedy at 100 TB.

SCALING.md claims the orderkey fact-fact joins (Q3/Q4/Q5/Q7) would be
bucketed on a real deployment so neither side shuffles at query time.
This test proves the engine's layout produces exactly that plan: two
tables bucketed+sorted on the join key join with NO shuffle exchange on
either side.
"""

from __future__ import annotations

import pytest

from acero_delta_lake_streaming_spark.catalog import load_table


@pytest.fixture()
def bucketed_pair(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders").limit(500)
    li = load_table(spark, sf_dir, "lineitem").limit(2000)
    (
        orders.write.bucketBy(4, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", str(tmp_path / "orders_b"))
        .mode("overwrite")
        .saveAsTable("orders_bucketed")
    )
    (
        li.write.bucketBy(4, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", str(tmp_path / "lineitem_b"))
        .mode("overwrite")
        .saveAsTable("lineitem_bucketed")
    )
    yield "orders_bucketed", "lineitem_bucketed"
    spark.sql("DROP TABLE IF EXISTS orders_bucketed")
    spark.sql("DROP TABLE IF EXISTS lineitem_bucketed")


def test_bucketed_join_has_no_shuffle(spark, bucketed_pair):
    t_orders, t_li = bucketed_pair
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(t_li).join(
            spark.table(t_orders),
            spark.table(t_li).l_orderkey == spark.table(t_orders).o_orderkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan
        # and it actually runs
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
