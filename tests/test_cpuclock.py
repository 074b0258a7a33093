"""Unit coverage for the dip-proof engine-CPU clock
(kafka_stream_unify_order_messages_spark/cpuclock.py).

The retirement arithmetic is what makes the bench/ramp CPU anchor
trustworthy: the naive live-tree sum dips when a pyspark.daemon is
killed without reaping its workers (they reparent to init and take
their accumulated ticks out of the tree), and best-of-N's min() then
records the corrupted sample — the 0.0-CPU rows seen on multi-second
queries in the r12/r13 sweeps. These tests stage each kernel
accounting path with synthetic /proc tables (the real sequences cannot
be staged reliably with live processes) and pin:

- clean reap  -> contribution preserved exactly, no double count;
- orphaning   -> last-seen ticks retired, no loss;
- daemon+pool chain death, both modes;
- monotonicity across every staged transition.
"""

from __future__ import annotations

from kafka_stream_unify_order_messages_spark.cpuclock import EngineCpuClock

HZ = None  # resolved lazily — reads scale by os.sysconf("SC_CLK_TCK")


def _hz() -> int:
    import os

    return os.sysconf("SC_CLK_TCK")


ROOT = 100


def _clock() -> EngineCpuClock:
    return EngineCpuClock(root=ROOT)


def _ticks(c: EngineCpuClock, rows) -> int:
    """read() in integer ticks, for exact assertions."""
    return round(c.read(_rows=rows) * _hz())


def test_live_tree_sum_includes_descendants_and_cutime():
    c = _clock()
    rows = {
        ROOT: (1, 50, 7),     # jvm: own 50, cutime 7 (already-reaped)
        200: (ROOT, 10, 3),   # daemon with reaped-worker cutime 3
        201: (200, 5, 0),     # live worker
        999: (1, 1000, 0),    # unrelated process — not in the tree
    }
    assert _ticks(c, rows) == 50 + 7 + 10 + 3 + 5


def test_clean_reap_preserves_contribution_exactly():
    c = _clock()
    t0 = {ROOT: (1, 50, 0), 200: (ROOT, 10, 4)}
    assert _ticks(c, t0) == 64
    # child 200 exits; ROOT reaps it: cutime grows by the child's full
    # own+child total (10+4). No retirement — exact preservation.
    t1 = {ROOT: (1, 55, 14)}
    assert _ticks(c, t1) == 55 + 14
    assert c._retired_ticks == 0


def test_orphaned_worker_is_retired_not_lost():
    c = _clock()
    t0 = {ROOT: (1, 50, 0), 200: (ROOT, 10, 0), 201: (200, 30, 0)}
    assert _ticks(c, t0) == 90
    # daemon 200 SIGKILLed; ROOT reaps the daemon (cutime +10) but the
    # worker 201 reparents to init with its 30 ticks — naive sum would
    # read 60+30(lost)=dip. The clock retires the worker's 30.
    t1 = {ROOT: (1, 50, 10)}
    v = _ticks(c, t1)
    assert v == 50 + 10 + 30
    assert c._retired_ticks == 30


def test_naive_dip_scenario_is_monotone_here():
    """The exact shape that minted 0.0-CPU rows: pool with big
    accumulated CPU vanishes uncredited mid-query; the clock must not
    go backwards."""
    c = _clock()
    t0 = {ROOT: (1, 100, 0), 200: (ROOT, 20, 0)}
    t0.update({210 + i: (200, 500, 0) for i in range(4)})  # 2000 ticks
    v0 = _ticks(c, t0)
    # whole pool orphaned, zero credit anywhere
    t1 = {ROOT: (1, 101, 0)}
    v1 = _ticks(c, t1)
    assert v1 >= v0
    assert c._retired_ticks == 20 + 2000


def test_chain_death_clean_reap_no_double_count():
    """Daemon reaps its workers (after our last snapshot), then exits;
    ROOT's cutime credit covers the whole chain — nothing retired."""
    c = _clock()
    t0 = {ROOT: (1, 50, 0), 200: (ROOT, 10, 6), 201: (200, 30, 0)}
    assert _ticks(c, t0) == 96
    # 201 dies (reaped by 200: its 30 flow into 200's cutime), then 200
    # dies (reaped by ROOT: cutime grows by 200's own 10 + cutime 36).
    t1 = {ROOT: (1, 50, 46)}
    assert _ticks(c, t1) == 96
    assert c._retired_ticks == 0


def test_chain_death_partial_credit_is_conservative_and_monotone():
    """Daemon reaped by ROOT but workers orphaned: retire exactly the
    uncredited remainder."""
    c = _clock()
    t0 = {ROOT: (1, 50, 0), 200: (ROOT, 10, 6), 201: (200, 30, 0)}
    assert _ticks(c, t0) == 96
    # ROOT reaps the daemon only: credit 10+6; worker's 30 uncredited.
    t1 = {ROOT: (1, 50, 16)}
    assert _ticks(c, t1) == 96
    assert c._retired_ticks == 30


def test_post_snapshot_burn_flows_through_credit():
    """Ticks a child burns after our last snapshot but before a clean
    reap arrive via the parent's cutime — counted once, not lost."""
    c = _clock()
    t0 = {ROOT: (1, 50, 0), 200: (ROOT, 10, 0)}
    assert _ticks(c, t0) == 60
    # child burns 5 more (unseen), then is reaped: credit 15.
    t1 = {ROOT: (1, 50, 15)}
    assert _ticks(c, t1) == 65
    assert c._retired_ticks == 0


def test_new_pool_after_retirement_counts_fresh():
    c = _clock()
    t0 = {ROOT: (1, 50, 0), 200: (ROOT, 40, 0)}
    _ticks(c, t0)
    t1 = {ROOT: (1, 50, 0)}  # orphaned: retire 40
    assert _ticks(c, t1) == 90
    # a NEW daemon (different pid) spins up
    t2 = {ROOT: (1, 52, 0), 300: (ROOT, 8, 0)}
    assert _ticks(c, t2) == 52 + 8 + 40


def test_root_gone_returns_none():
    c = _clock()
    assert c.read(_rows={999: (1, 5, 0)}) is None
    c2 = EngineCpuClock(root=None)
    assert c2.read(_rows={ROOT: (1, 5, 0)}) is None


def test_monotone_under_random_pool_churn():
    """Property-style sweep: random spawn/die (orphan or clean-reap)
    transitions must never move the clock backwards."""
    import random

    rng = random.Random(13)
    c = _clock()
    rows = {ROOT: (1, 100, 0)}
    prev = _ticks(c, rows)
    next_pid = 500
    for _ in range(200):
        # everyone burns
        rows = {
            p: (pp, own + rng.randrange(0, 20), ch)
            for p, (pp, own, ch) in rows.items()
        }
        roll = rng.random()
        if roll < 0.3:
            rows[next_pid] = (ROOT, 0, 0)
            next_pid += 1
        elif roll < 0.5 and len(rows) > 1:
            victim = rng.choice([p for p in rows if p != ROOT])
            pp, own, ch = rows.pop(victim)
            # reparent any children of the victim out of the tree too
            # (kernel: orphaned to init) half the time; other half the
            # parent cleanly reaps (credit own+child into its cutime)
            orphans = [p for p, (q, _, _) in rows.items() if q == victim]
            for p in orphans:
                rows.pop(p)
            if rng.random() < 0.5 and pp in rows:
                qpp, qown, qch = rows[pp]
                rows[pp] = (qpp, qown, qch + own + ch)
        cur = _ticks(c, rows)
        assert cur >= prev, "clock dipped"
        prev = cur


def test_real_session_smoke(spark):
    """Against the live session the clock must read, be monotone, and
    agree with the one-shot instrument's definition at rest."""
    from kafka_stream_unify_order_messages_spark.cpuclock import (
        EngineCpuClock,
        engine_cpu_seconds,
    )

    c = EngineCpuClock(spark)
    a = c.read()
    one_shot = engine_cpu_seconds(spark)
    spark.range(10_000_00).selectExpr("sum(id * 2)").collect()
    b = c.read()
    assert a is not None and b is not None and one_shot is not None
    assert b >= a
    assert abs(a - one_shot) < 5.0  # same tree, same definition
