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


# ---------------------------------------------------------------------------
# 4. hypothesis on the streaming dedup bucket kernels: for ANY batching
# and ANY within-batch arrival shuffle, the bucket's exemplar is the
# min-seq row of the earliest batch that touched it, everyone else is
# flagged against exactly that exemplar, and re-processing order inside
# a batch never matters (the kernel sorts by seq).
# ---------------------------------------------------------------------------

from kafka_stream_unify_order_messages_spark.streaming.dedup_stream import (  # noqa: E402
    make_bucket_first_wins_fn,
    make_bucket_verified_fn,
)

bucket_plans = st.lists(
    st.lists(st.integers(0, 999), min_size=1, max_size=6, unique=True),
    min_size=1,
    max_size=4,
).filter(lambda bs: len({s for b in bs for s in b}) == sum(len(b) for b in bs))


def _isnull(x):
    return x is None or (isinstance(x, float) and pd.isna(x))


def _run_bucket(fn, batches, sig_of=None):
    state = FakeState()
    out = []
    for batch in batches:
        cols = {
            "doc_id": [7000 + s for s in batch],
            "seq": batch,
        }
        if sig_of is not None:
            cols["_sig"] = [sig_of(s) for s in batch]
        pdf = pd.DataFrame(cols)
        for res in fn((3, "bk"), iter([pdf]), state):
            out.extend(res.to_dict("records"))
    return out, state


@settings(max_examples=60, deadline=None)
@given(bucket_plans)
def test_bucket_first_wins_exemplar_is_earliest_batch_min_seq(batches):
    out, state = _run_bucket(make_bucket_first_wins_fn(), batches)
    exemplar_seq = min(batches[0])
    exemplar_id = 7000 + exemplar_seq
    assert state.get == (exemplar_seq, exemplar_id)
    by_id = {r["doc_id"]: r for r in out}
    assert len(out) == len(by_id) == sum(len(b) for b in batches)
    for r in out:
        assert r["band"] == 3
        if r["doc_id"] == exemplar_id:
            assert not r["is_dup"] and _isnull(r["dup_of"])
        else:
            assert r["is_dup"] and r["dup_of"] == exemplar_id


@settings(max_examples=60, deadline=None)
@given(
    bucket_plans,
    st.integers(0, 16),  # how many signature components match the exemplar
)
def test_bucket_verified_threshold_gates_and_exemplar_is_stable(
    batches, n_match
):
    # exemplar's signature is all zeros; every other doc matches it in
    # exactly n_match of 16 components (the mismatching components are
    # made unique per doc so docs never accidentally equal each other)
    exemplar_seq = min(batches[0])

    def sig_of(seq):
        if seq == exemplar_seq:
            return [0] * 16
        return [0] * n_match + [1000 + seq] * (16 - n_match)

    out, state = _run_bucket(
        make_bucket_verified_fn(0.5, 16), batches, sig_of=sig_of
    )
    first_seq, first_id, first_sig = state.get
    assert (first_seq, first_id) == (exemplar_seq, 7000 + exemplar_seq)
    assert list(first_sig) == [0] * 16  # exemplar NEVER replaced
    should_dup = (n_match / 16) >= 0.5
    for r in out:
        if r["doc_id"] == first_id:
            assert not r["is_dup"] and _isnull(r["est"])
        else:
            assert r["est"] == n_match / 16
            assert bool(r["is_dup"]) == should_dup
            assert (r["dup_of"] == first_id) if should_dup else _isnull(
                r["dup_of"]
            )


# ---------------------------------------------------------------------------
# 5. hypothesis on the histogram quantile sketch: for ANY value multiset
# and ANY grouping, (a) merged per-group sketches == the direct one-pass
# histogram (mergeability identity), (b) every interpolated quantile is
# within one bin width of the true quantile.
# ---------------------------------------------------------------------------

value_sets = st.lists(
    st.tuples(
        st.integers(0, 2),  # group
        st.floats(
            min_value=-100, max_value=100,
            allow_nan=False, allow_infinity=False,
        ),
    ),
    min_size=4,
    max_size=40,
)


@settings(max_examples=6, deadline=None)
@given(value_sets)
def test_histogram_sketch_merge_identity_and_error_bound(spark, rows):
    import numpy as np

    from kafka_stream_unify_order_messages_spark.operators import (
        sketches as SK,
    )

    df = spark.createDataFrame(
        [(f"g{g}", float(v)) for g, v in rows], "g string, v double"
    )
    merged = SK.merge_histogram_sketches(
        SK.histogram_sketch(df, "g", "v", n_bins=8)
    )
    got = {r["bin"]: r["cnt"] for r in merged.collect()}
    vals = np.array([v for _, v in rows], dtype=float)
    lo, hi = vals.min(), vals.max()
    if hi == lo:
        assert got == {0: len(vals)}
        return
    bins = np.minimum(
        np.floor((vals - lo) / (hi - lo) * 8).astype(int), 7
    )
    want = {int(b): int(c) for b, c in zip(*np.unique(bins, return_counts=True))}
    assert got == want
    est = {
        r["q"]: r["estimate"]
        for r in SK.histogram_quantiles(merged, [0.25, 0.5, 0.9], 8).collect()
    }
    width = (hi - lo) / 8
    for q in (0.25, 0.5, 0.9):
        # the sketch's guarantee is RANK-based: the estimate lies in the
        # bin holding the ceil(q*N)-th sorted value (inverse-CDF
        # quantile). The interpolated (type-7) quantile can sit a whole
        # inter-value gap away when ties straddle bins — hypothesis
        # found [0,0,0,1] @ q=0.9 — so that is NOT the bound we claim.
        rank_q = np.quantile(vals, q, method="inverted_cdf")
        assert abs(est[q] - rank_q) <= width + 1e-9
