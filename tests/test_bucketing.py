"""Bucketed-table co-located joins: pre-bucketing both fact tables on the
join key removes BOTH exchanges from the join plan — the storage-layout
lever for repeated 100 TB joins that no per-query optimization can match."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_stream_unify_order_messages_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def warehouse(spark):
    # saveAsTable needs a warehouse; bucket both sides on the join key.
    # Broadcast must be off or the planner bypasses buckets entirely at
    # this tiny scale (at 100 TB neither side broadcasts).
    import shutil

    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    # a stale warehouse dir (e.g. from a killed run) blocks saveAsTable
    shutil.rmtree("spark-warehouse/b_orders", ignore_errors=True)
    shutil.rmtree("spark-warehouse/b_lineitem", ignore_errors=True)
    (
        orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders")
    )
    (
        li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    import shutil

    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_exchange(spark, warehouse):
    joined = (
        spark.table("b_orders")
        .join(
            spark.table("b_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_part = plan[: plan.index("HashAggregate")] if "HashAggregate" in plan else plan
    # the join itself reads bucketed scans directly: no shuffle on either
    # side (the only exchange allowed is the one for the final groupBy)
    assert plan.count("Exchange") <= 1, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    # and it still returns correct results
    unbucketed = (
        load_table(spark, SF, "orders")
        .join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderpriority")
        .agg(F.sum("l_extendedprice").alias("rev"))
    )
    got = {r.o_orderpriority: round(r.rev, 2) for r in joined.collect()}
    want = {r.o_orderpriority: round(r.rev, 2) for r in unbucketed.collect()}
    assert got == want
