"""Batch unification semantics against hand-built fixtures.

Scenario coverage mirrors the reference harness (FIXTURES.md §A): complete,
missing, duplicate, shuffled, alias/junk types, null ids.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_stream_unify_order_messages_spark.operators.unify import (
    unify_events,
    unify_events_flat,
)

COLS = ["order_id", "type", "topic", "arrival_seq", "order_details"]


def make_events(spark, rows):
    return spark.createDataFrame([tuple(r) for r in rows], COLS)


def collect_projections(df):
    return {
        r["order_id"]: [(e["type"], e["order_details"]) for e in r["events"]]
        for r in df.collect()
    }


def run(spark, rows):
    df = make_events(spark, rows)
    out = unify_events(
        df,
        id_col="order_id",
        type_col="type",
        arrival_cols=["arrival_seq"],
        payload_cols=["type", "arrival_seq", "order_details"],
        topic_col="topic",
    )
    return {
        r["order_id"]: [(e["type"], e["order_details"]) for e in r["events"]]
        for r in out.collect()
    }


def test_complete_lifecycle_shuffled_order(spark):
    # out-of-order arrival; output must still be created->placed->cancelled
    rows = [
        ("o1", "cancelled", "order-cancelled", 1, "c3"),
        ("o1", "created", "order-created", 2, "c1"),
        ("o1", "placed", "order-placed", 3, "c2"),
    ]
    assert run(spark, rows) == {
        "o1": [("created", "c1"), ("placed", "c2"), ("cancelled", "c3")]
    }


def test_missing_event_drops_order(spark):
    rows = [
        ("o1", "created", "order-created", 1, "a"),
        ("o1", "placed", "order-placed", 2, "b"),
    ]
    assert run(spark, rows) == {}


def test_duplicate_type_first_wins(spark):
    rows = [
        ("o1", "created", "order-created", 5, "late-created"),
        ("o1", "created", "order-created", 1, "first-created"),
        ("o1", "placed", "order-placed", 2, "p"),
        ("o1", "cancelled", "order-cancelled", 3, "x"),
    ]
    assert run(spark, rows)["o1"][0] == ("created", "first-created")


def test_alias_and_case_canonicalization(spark):
    rows = [
        ("o1", "ORDER-CREATED", "order-created", 1, "a"),
        ("o1", "Placed", "order-placed", 2, "b"),
        ("o1", "order-cancelled", "order-cancelled", 3, "c"),
    ]
    assert run(spark, rows) == {
        "o1": [("created", "a"), ("placed", "b"), ("cancelled", "c")]
    }


def test_junk_type_falls_back_to_topic(spark):
    # junk type on the order-created topic counts as created
    rows = [
        ("o1", "bogus", "order-created", 1, "a"),
        ("o1", "placed", "order-placed", 2, "b"),
        ("o1", "cancelled", "order-cancelled", 3, "c"),
    ]
    assert run(spark, rows)["o1"][0] == ("created", "a")


def test_junk_type_unknown_topic_is_ignored(spark):
    # neither the type nor the topic canonicalizes -> event ignored entirely
    rows = [
        ("o1", "bogus", "mystery-topic", 1, "a"),
        ("o1", "created", "order-created", 2, "b"),
        ("o1", "placed", "order-placed", 3, "c"),
        ("o1", "cancelled", "order-cancelled", 4, "d"),
    ]
    assert run(spark, rows)["o1"] == [
        ("created", "b"),
        ("placed", "c"),
        ("cancelled", "d"),
    ]


def test_null_order_id_filtered(spark):
    rows = [
        (None, "created", "order-created", 1, "a"),
        ("o2", "created", "order-created", 2, "a"),
        ("o2", "placed", "order-placed", 3, "b"),
        ("o2", "cancelled", "order-cancelled", 4, "c"),
    ]
    assert set(run(spark, rows)) == {"o2"}


def test_multiple_orders_independent(spark):
    rows = []
    for i in range(5):
        rows += [
            (f"o{i}", "placed", "order-placed", 3 * i + 1, f"p{i}"),
            (f"o{i}", "created", "order-created", 3 * i + 2, f"c{i}"),
        ]
        if i % 2 == 0:
            rows.append(
                (f"o{i}", "cancelled", "order-cancelled", 3 * i + 3, f"x{i}")
            )
    out = run(spark, rows)
    assert set(out) == {"o0", "o2", "o4"}


def test_flat_positions(spark):
    rows = [
        ("o1", "cancelled", "order-cancelled", 1, "c3"),
        ("o1", "created", "order-created", 2, "c1"),
        ("o1", "placed", "order-placed", 3, "c2"),
    ]
    df = make_events(spark, rows)
    flat = unify_events_flat(
        df,
        id_col="order_id",
        type_col="type",
        arrival_cols=["arrival_seq"],
        payload_cols=["type", "order_details"],
        topic_col="topic",
    )
    got = sorted(
        (r["position"], r["type"], r["order_details"]) for r in flat.collect()
    )
    assert got == [(1, "created", "c1"), (2, "placed", "c2"), (3, "cancelled", "c3")]


def test_partial_required_count_gate(spark):
    # generalized gate: require any 2 distinct types instead of all 3;
    # events stay priority-ordered and nulls never leak into the array
    rows = [
        ("o1", "created", "order-created", 1, "a"),   # 1 type -> dropped
        ("o2", "placed", "order-placed", 2, "b"),
        ("o2", "created", "order-created", 3, "c"),   # 2 types -> emitted
        ("o3", "created", "order-created", 4, "d"),
        ("o3", "placed", "order-placed", 5, "e"),
        ("o3", "cancelled", "order-cancelled", 6, "f"),  # 3 types -> dropped (!= 2)
    ]
    df = make_events(spark, rows)
    out = unify_events(
        df,
        id_col="order_id",
        type_col="type",
        arrival_cols=["arrival_seq"],
        payload_cols=["type", "order_details"],
        topic_col="topic",
        required_count=2,
    )
    got = {
        r["order_id"]: [(e["type"], e["order_details"]) for e in r["events"]]
        for r in out.collect()
    }
    assert got == {"o2": [("created", "c"), ("placed", "b")]}
