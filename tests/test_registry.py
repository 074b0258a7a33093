"""Every registry query runs at sf0.001 and returns rows with the declared
columns; every oracle has a matching query key. (Full Spark-vs-DuckDB value
equality runs in scripts/check_oracle.py and the driver's own gate.)
"""

from __future__ import annotations

import pytest

from kafka_stream_unify_order_messages_spark import registry
from tests.conftest import SF_DIR


def test_oracles_subset_of_queries():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    rows = df.limit(5).collect()
    assert len(df.columns) > 0
    assert rows is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
