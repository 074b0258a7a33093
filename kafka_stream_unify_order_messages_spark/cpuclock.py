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
captures all query work, JVM- and Python-side. Each /proc stat row also
adds cutime/cstime (CPU of already-reaped children), which keeps the
series continuous when a worker exits between two samples: while alive
its CPU is counted from its own row, after reaping from the parent's
cutime — never both, never neither.
"""

from __future__ import annotations

import os


def engine_cpu_seconds(spark) -> float | None:
    """Cumulative user+system CPU seconds of the engine process tree:
    the gateway JVM (driver + every executor thread in local mode) plus
    every live descendant — pyspark.daemon and the Arrow python workers
    that execute MapInPandas/Pandas-UDF stages. Returns None when the
    JVM pid is not discoverable (connect/cluster session); callers then
    degrade to wall-only."""
    try:
        root = spark.sparkContext._gateway.proc.pid
    except AttributeError:
        return None
    ticks: dict[int, int] = {}
    children: dict[int, list[int]] = {}
    try:
        for entry in os.listdir("/proc"):
            if not entry.isdigit():
                continue
            try:
                with open(f"/proc/{entry}/stat") as f:
                    parts = f.read().rsplit(")", 1)[1].split()
            except (OSError, IndexError):
                continue  # process exited mid-scan
            ppid = int(parts[1])
            pid = int(entry)
            ticks[pid] = sum(int(parts[i]) for i in (11, 12, 13, 14))
            children.setdefault(ppid, []).append(pid)
        if root not in ticks:
            return None
        total = 0
        stack = [root]
        while stack:
            p = stack.pop()
            total += ticks[p]
            stack.extend(children.get(p, []))
        return total / os.sysconf("SC_CLK_TCK")
    except (OSError, IndexError, ValueError):
        return None
