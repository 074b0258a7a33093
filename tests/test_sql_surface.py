"""The SQL surface the reference never had: every testdata table is
queryable through spark.sql after register_temp_views — ANSI joins,
CTEs, windows, and the engine's own registered views compose freely."""

from __future__ import annotations

from kafka_stream_unify_order_messages_spark.sources.files import (
    TABLE_NAMES,
    register_temp_views,
)

SF = "/root/testdata/sf0.001"


def test_all_tables_queryable_via_sql(spark):
    register_temp_views(spark, SF)
    for name in TABLE_NAMES:
        assert spark.sql(f"SELECT count(*) AS n FROM {name}").collect()[0].n > 0


def test_sql_cte_join_window(spark):
    register_temp_views(spark, SF)
    rows = spark.sql(
        """
        WITH region_sales AS (
            SELECT r.r_name,
                   sum(l.l_extendedprice * (1 - l.l_discount)) AS revenue
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            GROUP BY r.r_name
        )
        SELECT r_name, revenue,
               rank() OVER (ORDER BY revenue DESC) AS rnk
        FROM region_sales
        """
    ).collect()
    assert len(rows) == 5
    assert rows[0].rnk >= 1
    ranks = sorted(r.rnk for r in rows)
    assert ranks == [1, 2, 3, 4, 5]


def test_sql_over_engine_results(spark):
    # engine operator output registered as a view and post-queried in SQL
    from kafka_stream_unify_order_messages_spark.registry import QUERIES

    QUERIES["unify_projection"](spark, SF).createOrReplaceTempView("projections")
    rows = spark.sql(
        """
        SELECT position, count(*) AS n
        FROM projections GROUP BY position ORDER BY position
        """
    ).collect()
    assert [r.position for r in rows] == [1, 2, 3, 4, 5]
    assert len({r.n for r in rows}) == 1  # every position equally present
