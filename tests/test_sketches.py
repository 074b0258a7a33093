"""Sketch aggregates for 100 TB analytics: approx_percentile and
approx_count_distinct bounded against exact answers. Sketch outputs are
engine-specific (not oracle-hashable), so accuracy is pinned here."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.sources.files import load_table

SF = "/root/testdata/sf0.01"


def test_approx_percentile_rank_error(spark):
    events = load_table(spark, SF, "events")
    rows = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx_p50"),
        F.expr("percentile(value, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(value, 0.99, 1000)").alias("approx_p99"),
    ).collect()[0]
    n = events.count()
    values = [r.value for r in events.select("value").collect()]
    values.sort()

    def rank(v):
        import bisect

        return bisect.bisect_left(values, v) / n

    # accuracy=1000 guarantees rank error <= 1/1000; allow 1% slack
    assert abs(rank(rows.approx_p50) - 0.5) <= 0.01
    assert abs(rank(rows.approx_p99) - 0.99) <= 0.011


def test_approx_count_distinct_error(spark):
    events = load_table(spark, SF, "events")
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact <= 0.1
