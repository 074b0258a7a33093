"""JSONL landing-zone source: schema enforcement + malformed-record
handling (the file twin of the Kafka JSON deserializer's strict/reject
modes — sources/kafka.py)."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from kafka_stream_unify_order_messages_spark.sources.files import read_jsonl

SCHEMA = StructType(
    [
        StructField("order_id", LongType()),
        StructField("type", StringType()),
    ]
)

LINES = [
    '{"order_id": 1, "type": "created"}',
    '{"order_id": 2, "type": "placed"}',
    "{not json at all",
    '{"order_id": "NaN-ish", "type": "cancelled"}',
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "landing.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_permissive_quarantines_malformed(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA)
    rows = df.collect()
    assert len(rows) == 4
    good = [r for r in rows if r._corrupt_record is None]
    bad = [r for r in rows if r._corrupt_record is not None]
    assert {r.order_id for r in good} == {1, 2}
    # the raw line survives for audit/quarantine routing
    assert any("not json" in r._corrupt_record for r in bad)
    # type-mismatched field nulls out but the row is kept
    assert any(
        r.order_id is None and "NaN-ish" in r._corrupt_record for r in bad
    )


def test_dropmalformed_keeps_only_clean_rows(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA, mode="DROPMALFORMED")
    assert sorted(r.order_id for r in df.collect()) == [1, 2]


def test_failfast_raises_on_first_malformed(spark, jsonl_path):
    df = read_jsonl(spark, jsonl_path, SCHEMA, mode="FAILFAST")
    with pytest.raises(Exception) as ei:
        df.collect()
    assert "Malformed" in str(ei.value) or "FAILFAST" in str(ei.value)
