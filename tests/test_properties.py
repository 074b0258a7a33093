"""Property-based and generator-golden tests (SURVEY.md §5.4).

1. hypothesis over the streaming state function: ANY interleaving /
   duplication / batch-splitting of a lifecycle inside the buffer window
   yields exactly one canonical projection; any proper subset of types
   yields nothing.
2. The seeded scenario generator (G1-G5) against an independent pure-
   Python oracle of the unification semantics, through the BATCH operator.
"""

from __future__ import annotations

import json

import pandas as pd
from hypothesis import given, settings, strategies as st

from kafka_stream_unify_order_messages_spark.operators.unify import unify_events
from kafka_stream_unify_order_messages_spark.sources.generator import (
    generate_order_events,
    order_events_df,
)
from kafka_stream_unify_order_messages_spark.streaming import make_unify_fn

from tests.test_unify_stream import COLS, Clock, FakeState

REQUIRED = ("created", "placed", "cancelled")


# ---------------------------------------------------------------------------
# 1. hypothesis on the state function
# ---------------------------------------------------------------------------

# a lifecycle delivery plan: which types arrive (possibly repeated), in
# which order; each event also gets a batch-boundary flag
deliveries = st.lists(
    st.tuples(
        st.sampled_from(REQUIRED + ("bogus",)),
        st.booleans(),  # True -> start a new micro-batch before this event
    ),
    min_size=1,
    max_size=12,
)


def run_plan(plan):
    """Feed the delivery plan through the state fn, then fire the timeout.
    Returns (emissions, first_arrival_details_per_type)."""
    clock = Clock(50_000)
    fn = make_unify_fn(buffer_ms=5000, clock=clock)
    state = FakeState()

    batches: list[list[tuple]] = [[]]
    for i, (etype, new_batch) in enumerate(plan):
        if new_batch and batches[-1]:
            batches.append([])
        batches[-1].append(
            ("o", etype, f"t{i}", json.dumps({"arrival": i}))
        )

    emissions = []
    for batch in batches:
        pdfs = iter([pd.DataFrame(batch, columns=COLS)])
        emissions += list(fn(("o",), pdfs, state))
        clock.ms += 100  # well inside the window

    if state.exists:
        state.hasTimedOut = True
        emissions += list(fn(("o",), iter([]), state))

    firsts = {}
    for i, (etype, _) in enumerate(plan):
        if etype in REQUIRED and etype not in firsts:
            firsts[etype] = i
    return emissions, firsts


@settings(max_examples=60, deadline=None)
@given(deliveries)
def test_any_interleaving_yields_canonical_projection_or_nothing(plan):
    emissions, firsts = run_plan(plan)
    types_seen = set(firsts)

    if types_seen == set(REQUIRED):
        assert len(emissions) == 1
        [payload] = [
            json.loads(p) for df in emissions for p in df["payload"]
        ]
        assert [e["type"] for e in payload["events"]] == list(REQUIRED)
        # first-wins: each emitted event is the FIRST arrival of its type
        for e in payload["events"]:
            assert e["order_details"] == {"arrival": firsts[e["type"]]}
    else:
        assert emissions == []  # proper subset: dropped silently


# ---------------------------------------------------------------------------
# 2. generator scenarios vs a pure-Python oracle through the batch operator
# ---------------------------------------------------------------------------


def python_oracle(events):
    """Independent reimplementation of the unification semantics over the
    generator's event list (arrival_seq = arrival order)."""
    by_order: dict[str, dict[str, dict]] = {}
    for e in sorted(events, key=lambda e: e["arrival_seq"]):
        if e["order_id"] is None or e["type"] not in REQUIRED:
            continue
        by_order.setdefault(e["order_id"], {}).setdefault(e["type"], e)
    return {
        oid: [evs[t]["order_details"] for t in REQUIRED]
        for oid, evs in by_order.items()
        if set(evs) == set(REQUIRED)
    }


def run_batch(spark, events):
    df = order_events_df(spark, events)
    out = unify_events(
        df,
        id_col="order_id",
        type_col="type",
        arrival_cols=["arrival_seq"],
        payload_cols=["type", "order_details"],
        topic_col="topic",
    )
    return {
        r["order_id"]: [e["order_details"] for e in r["events"]]
        for r in out.collect()
    }


def test_generator_missing_scenarios_match_oracle(spark):
    events = generate_order_events(60, seed=7, missing_probability=0.4)
    assert run_batch(spark, events) == python_oracle(events)
    # sanity: the scenario actually produced incomplete lifecycles
    assert len(python_oracle(events)) < 60


def test_generator_duplicate_scenarios_match_oracle(spark):
    events = generate_order_events(60, seed=11, duplicate_probability=0.5)
    got = run_batch(spark, events)
    assert got == python_oracle(events)
    assert len(got) == 60  # duplicates never destroy a lifecycle
    assert len(events) > 180  # injection actually duplicated something


def test_generator_validation_parity():
    import pytest

    with pytest.raises(ValueError):
        generate_order_events(1, missing_probability=0.5, duplicate_probability=0.5)
    with pytest.raises(ValueError):
        generate_order_events(1, missing_probability=1.5)


# ---------------------------------------------------------------------------
# 3. the SAME interleaving property over the v2 (TWS) processor — both
# stateful implementations must satisfy identical semantics
# ---------------------------------------------------------------------------


def run_plan_tws(plan):
    from tests.test_unify_tws import (
        FakeExpiredTimer,
        FakeHandle,
        FakeTimerValues,
    )
    from kafka_stream_unify_order_messages_spark.streaming.unify_tws import (
        OrderUnifyProcessor,
    )

    proc = OrderUnifyProcessor(buffer_ms=5000)
    handle = FakeHandle()
    proc.init(handle)
    now = 50_000

    batches: list[list[tuple]] = [[]]
    for i, (etype, new_batch) in enumerate(plan):
        if new_batch and batches[-1]:
            batches.append([])
        batches[-1].append(("o", etype, f"t{i}", json.dumps({"arrival": i})))

    emissions = []
    for batch in batches:
        pdfs = iter([pd.DataFrame(batch, columns=COLS)])
        emissions += list(
            proc.handleInputRows(("o",), pdfs, FakeTimerValues(now))
        )
        now += 100  # well inside the window

    for deadline in list(handle.timers):
        emissions += list(
            proc.handleExpiredTimer(
                ("o",), FakeTimerValues(deadline), FakeExpiredTimer(deadline)
            )
        )

    firsts = {}
    for i, (etype, _) in enumerate(plan):
        if etype in REQUIRED and etype not in firsts:
            firsts[etype] = i
    return emissions, firsts


@settings(max_examples=60, deadline=None)
@given(deliveries)
def test_tws_processor_matches_v1_semantics(plan):
    emissions, firsts = run_plan_tws(plan)
    types_seen = set(firsts)

    if types_seen == set(REQUIRED):
        assert len(emissions) == 1
        [payload] = [
            json.loads(p) for df in emissions for p in df["payload"]
        ]
        assert [e["type"] for e in payload["events"]] == list(REQUIRED)
        for e in payload["events"]:
            assert e["order_details"] == {"arrival": firsts[e["type"]]}
    else:
        assert emissions == []


# ---------------------------------------------------------------------------
# 3. hypothesis on the KMV sketch: for ANY pair of integer sets, the
# sketch with k >= |union| degenerates to the exact answer, and the
# small-k estimator stays inside its hard bounds.
# ---------------------------------------------------------------------------

set_pairs = st.tuples(
    st.sets(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
    st.sets(st.integers(min_value=0, max_value=400), min_size=1, max_size=60),
)


@settings(max_examples=8, deadline=None)
@given(set_pairs)
def test_kmv_exact_below_k_and_bounded_above(spark, pair):
    import pyspark.sql.functions as F  # noqa: F401

    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    sa, sb = pair
    rows = [("a", i) for i in sa] + [("b", i) for i in sb]
    df = spark.createDataFrame(rows, ["g", "item"])

    exact_inter = len(sa & sb)
    exact_union = len(sa | sb)

    # k >= |union| -> every estimate is exactly the true value
    big = SK.kmv_pair_overlap(df, "g", "item", k=512).collect()[0]
    assert big.exact_inter == exact_inter
    assert big.exact_union == exact_union
    assert big.kmv_union_est == float(exact_union)
    assert big.kmv_inter_est == float(exact_inter)

    # small k -> hard bounds that hold for EVERY input, not on average
    small = SK.kmv_pair_overlap(df, "g", "item", k=8).collect()[0]
    assert 0.0 <= small.kmv_jaccard <= 1.0
    assert small.kmv_union_est > 0.0
    assert small.exact_inter == exact_inter  # audit side always exact
    assert small.exact_union == exact_union
