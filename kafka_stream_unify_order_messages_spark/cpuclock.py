"""The measurement-grade CPU clock shared by bench.py and the scaling
ramp: cumulative user+system CPU seconds of the WHOLE engine process
tree.

Why a CPU clock at all: wall-clock on this host swings up to 2x on
identical code under co-tenant load (round-11 finding: four full bench
sweeps on near-identical code spanned 201-247 s with disjoint random
spikes while the 53-query common set was flat at 1.003x). CPU seconds
are robust to losing cores to co-tenants — inflated only by
memory-stall cycles — so BASELINE.md makes the CPU total the
cross-round trend anchor and SCALING.md publishes CPU-based exponents
alongside wall.

Why the whole TREE and not just the JVM: MapInPandas / Pandas-UDF
stages burn their CPU in pyspark.daemon and the Arrow python workers it
forks, not in the gateway JVM. A JVM-only clock (the ramp's original
instrument, rounds 9-12) under-counts Python-heavy queries; the bench
counted the full tree from round 12. Round 13 unifies the two on this
helper so the bench anchor and the ramp exponents read the same
instrument.

Validity: this works precisely because both harnesses run local-mode —
the entire "cluster" (driver + every executor thread + python workers)
is one process tree rooted at the gateway JVM, so /proc accounting
captures all query work, JVM- and Python-side.

THE DIP PROBLEM (round 13). The naive instrument — sum utime+stime+
cutime+cstime over the live tree — can go BACKWARDS: when a
pyspark.daemon is killed without reaping its workers, the orphaned
workers reparent to init, leave the tree while still holding their
accumulated ticks, and the sum drops by that amount. A per-query delta
taken across such a dip reads low or negative; best-of-N's min() then
prefers exactly the corrupted sample. This minted impossible 0.0-CPU
rows for multi-second queries in the r12/r13 sweeps
(clustering_coefficient 4.2 s / 0.0 in the r12 anchor;
contamination_profile, ngram_novelty, quantile_sketch_by_group in an
r13 sweep — each right after a heavy pandas sibling, where pools die).

`EngineCpuClock` is the dip-proof replacement. It is stateful: each
`read()` rescans the tree and, for every previously-seen descendant
that has VANISHED, adds a retirement credit of its last-seen own+child
ticks MINUS whatever its nearest live ancestor's cutime growth already
credits for it this interval. The arithmetic makes the two kernel
accounting paths agree:

- clean reap (child waited on by its parent): the parent's cutime grows
  by the child's own+cutime total, the retirement max(0, S - credited)
  is 0, and the child's contribution is exactly preserved — no double
  count;
- orphaned (parent SIGKILLed, child reparented out of the tree): no
  tree ancestor's cutime grows, so the full last-seen S is retired —
  no loss;
- mixed/partial credit: contribution is max(S, credited) — monotone,
  never a dip, at worst over by ticks the child genuinely burned after
  the last snapshot (which the cutime credit legitimately includes).

Vanish-detection coincides with reap for in-tree deaths (a zombie still
has a /proc stat row, so a pid only disappears once its parent has
waited on it — the same interval its cutime credit appears in), which
is what lets the interval-local credit comparison work.

Residual under-count: ticks a process burns between the last snapshot
and an UNCREDITED death (orphan case only) — bounded by one
measurement interval's burn of the dying pool, a few CPU-s, versus the
hundreds of accumulated CPU-s the naive sum loses. Snapshots bracket
every bench/ramp run, so the interval is one run.

The stateless `engine_cpu_seconds` remains for one-shot reads (and as
the documented raw instrument); the measurement loops use the clock.
"""

from __future__ import annotations

import os


def _scan_proc() -> dict[int, tuple[int, int, int]]:
    """One pass over /proc: {pid: (ppid, own_ticks, child_ticks)} where
    own = utime+stime and child = cutime+cstime (reaped descendants)."""
    rows: dict[int, tuple[int, int, int]] = {}
    for entry in os.listdir("/proc"):
        if not entry.isdigit():
            continue
        try:
            with open(f"/proc/{entry}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
        except (OSError, IndexError):
            continue  # process exited mid-scan
        rows[int(entry)] = (
            int(parts[1]),
            int(parts[11]) + int(parts[12]),
            int(parts[13]) + int(parts[14]),
        )
    return rows


def _tree_of(rows: dict[int, tuple[int, int, int]], root: int) -> set[int]:
    children: dict[int, list[int]] = {}
    for pid, (ppid, _, _) in rows.items():
        children.setdefault(ppid, []).append(pid)
    tree: set[int] = set()
    stack = [root]
    while stack:
        p = stack.pop()
        if p in rows and p not in tree:
            tree.add(p)
            stack.extend(children.get(p, []))
    return tree


def _jvm_root(spark) -> int | None:
    try:
        return spark.sparkContext._gateway.proc.pid
    except AttributeError:
        return None


def engine_cpu_seconds(spark) -> float | None:
    """One-shot cumulative user+system CPU seconds of the engine process
    tree: the gateway JVM (driver + every executor thread in local mode)
    plus every live descendant — pyspark.daemon and the Arrow python
    workers that execute MapInPandas/Pandas-UDF stages. Returns None
    when the JVM pid is not discoverable (connect/cluster session);
    callers then degrade to wall-only.

    NOT dip-proof (see the module docstring): a series of these can go
    backwards when a worker pool is orphaned. Measurement loops that
    difference consecutive readings should use `EngineCpuClock`."""
    root = _jvm_root(spark)
    if root is None:
        return None
    try:
        rows = _scan_proc()
        if root not in rows:
            return None
        total = sum(
            rows[p][1] + rows[p][2] for p in _tree_of(rows, root)
        )
        return total / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None


class EngineCpuClock:
    """Monotone engine-tree CPU clock (see the module docstring for the
    retirement arithmetic). Create one per session; call `read()` at
    each measurement boundary and difference consecutive readings.

    The first `read()` establishes the baseline tick universe; every
    later one folds vanished descendants into a retirement balance so
    the series never dips when a worker pool dies.
    """

    def __init__(self, spark=None, root: int | None = None):
        self._root = root if root is not None else _jvm_root(spark)
        # last-seen (ppid, own, child) per tree pid, from the previous read
        self._seen: dict[int, tuple[int, int, int]] = {}
        self._retired_ticks = 0

    def read(self, _rows=None) -> float | None:
        """Cumulative CPU seconds: live-tree ticks + retirement balance.
        Monotone across worker-pool deaths. None when the root pid is
        unknown or gone (callers degrade to wall-only, matching
        `engine_cpu_seconds`).

        `_rows` injects a synthetic {pid: (ppid, own, child)} table in
        place of the /proc scan — unit-test seam for the retirement
        arithmetic (the orphan/clean-reap cases cannot be staged
        reliably with real processes)."""
        if self._root is None:
            return None
        try:
            rows = _scan_proc() if _rows is None else _rows
        except OSError:
            return None
        if self._root not in rows:
            return None
        tree = _tree_of(rows, self._root)

        vanished = {p: v for p, v in self._seen.items() if p not in tree}
        if vanished:
            # Group the dead by their nearest still-live ancestor (walk
            # last-known ppids through other dead pids), then net each
            # group's last-seen own ticks against that ancestor's cutime
            # growth this interval — the clean-reap credit path.
            groups: dict[int, int] = {}
            for pid, (ppid, own, child) in vanished.items():
                anc = ppid
                hops = 0
                while anc in vanished and hops < 64:
                    anc = vanished[anc][0]
                    hops += 1
                if anc not in tree:
                    anc = self._root
                # own + child: a dying daemon's cutime (its own reaped
                # workers) leaves the live sum with it, so it is part of
                # what the ancestor's credit must cover
                groups[anc] = groups.get(anc, 0) + own + child
            for anc, dead_own in groups.items():
                prev_child = (
                    self._seen[anc][2] if anc in self._seen else 0
                )
                credited = max(0, rows[anc][2] - prev_child)
                self._retired_ticks += max(0, dead_own - credited)

        self._seen = {p: rows[p] for p in tree}
        live = sum(rows[p][1] + rows[p][2] for p in tree)
        try:
            hz = os.sysconf("SC_CLK_TCK")
        except (OSError, ValueError):
            return None
        return (live + self._retired_ticks) / hz
