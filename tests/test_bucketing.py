"""Bucketed co-located joins: the at-rest answer to fact-fact shuffle
cost. Both sides bucketed by the join key into the same bucket count
must join with zero Exchange in the physical plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from map_reduce_spark import io as mio


def test_bucketed_fact_join_has_no_exchange(spark, sf_dir):
    orders = mio.load_table(spark, sf_dir, "orders")
    lineitem = mio.load_table(spark, sf_dir, "lineitem")
    mio.write_bucketed(orders, "orders_bkt", "o_orderkey", 8)
    mio.write_bucketed(lineitem, "lineitem_bkt", "l_orderkey", 8)
    try:
        o, li = spark.table("orders_bkt"), spark.table("lineitem_bkt")
        # force the sort-merge path so the assertion is about bucketing,
        # not broadcast
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            j = o.join(li, o.o_orderkey == li.l_orderkey).groupBy("o_orderkey").agg(
                F.count("*").alias("n")
            )
            plan = j._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan[:2000]
            # and it computes the same thing as the unbucketed join
            base = (
                orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
                .groupBy("o_orderkey")
                .agg(F.count("*").alias("n"))
            )
            assert sorted(map(tuple, j.collect())) == sorted(
                map(tuple, base.collect())
            )
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
