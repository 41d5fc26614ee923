"""Bucketed co-located joins: same results, no shuffle in the join plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from fraud_detection_etl_project_spark import sinks
from fraud_detection_etl_project_spark.sources.parquet import load_table

SF = "/root/testdata/sf0.001"


def test_bucketed_join_is_shuffle_free_and_correct(spark):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity")

    sinks.write_bucketed(orders, "orders_bkt", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    sinks.write_bucketed(lineitem, "lineitem_bkt", ["l_orderkey"], 8, sort_cols=["l_orderkey"])

    ob, lb = spark.table("orders_bkt"), spark.table("lineitem_bkt")
    # Disable auto-broadcast so the join would otherwise shuffle both sides.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob.o_orderkey == lb.l_orderkey).groupBy("o_orderkey").agg(
            F.count(F.lit(1)).alias("n")
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # Bucket layout satisfies the join's distribution: no shuffle before
        # the SortMergeJoin (the only allowed exchange is none at all here —
        # even the groupBy on the same key reuses the bucketing).
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan

        expect = (
            orders.join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
            .groupBy("o_orderkey")
            .count()
        )
        got = {(r.o_orderkey, r.n) for r in joined.collect()}
        want = {(r.o_orderkey, r["count"]) for r in expect.collect()}
        assert got == want
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_bkt")
        spark.sql("DROP TABLE IF EXISTS lineitem_bkt")
