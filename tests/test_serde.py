"""Kafka JSON serde layer (S3/S4): field extraction, byte-faithful
order_details passthrough, corrupt-record policy (reject column vs strict
failure — the reference kills the stream thread, SURVEY.md §1.3)."""

from __future__ import annotations

import pytest

from kafka_stream_unify_order_messages_spark.sources.kafka import (
    parse_order_events,
)

GOOD = (
    '{"order-id":"o1","type":"created","timestamp":"2026-01-01T00:00:00.000Z",'
    '"order_details":{"total":12.30,"items":[{"sku":"a","q":2}]}}'
)
BAD = '{"order-id": truncated'


def raw_df(spark, values):
    return spark.createDataFrame(
        [(f"k{i}", v, "order-created") for i, v in enumerate(values)],
        "key string, value string, topic string",
    )


def test_parse_extracts_fields_and_passthrough_bytes(spark):
    [row] = parse_order_events(raw_df(spark, [GOOD])).collect()
    assert row.order_id == "o1"
    assert row.type == "created"
    assert row.timestamp == "2026-01-01T00:00:00.000Z"
    assert row.topic == "order-created"
    assert not row.corrupt
    # order_details passes through byte-faithfully: field order and float
    # formatting preserved exactly as on the wire (no from_json/to_json
    # normalization — SURVEY.md §7.3.3)
    assert row.order_details == '{"total":12.30,"items":[{"sku":"a","q":2}]}'


def test_corrupt_rows_flagged_not_dropped(spark):
    out = parse_order_events(raw_df(spark, [GOOD, BAD])).collect()
    by_corrupt = {bool(r.corrupt): r for r in out}
    assert by_corrupt[True].order_id is None  # corrupt: flagged, retained
    assert by_corrupt[False].order_id == "o1"


def test_strict_mode_fails_on_corrupt(spark):
    strict = parse_order_events(raw_df(spark, [GOOD, BAD]), strict=True)
    with pytest.raises(Exception) as exc_info:
        strict.collect()
    assert "malformed order event" in str(exc_info.value)


def test_strict_mode_passes_clean_input(spark):
    strict = parse_order_events(raw_df(spark, [GOOD]), strict=True)
    assert strict.count() == 1
