"""Compare two bench artifacts on both clocks and classify the movers.

Usage:
    python scripts/bench_diff.py OLD.json NEW.json [--top N]

Inputs are BENCH_DETAIL.json-shaped files (or the driver's BENCH_r{N}
blob — same keys): `value`/`queries` for wall, and from round 12 on
`cpu_value`/`queries_cpu` for engine-CPU. Applies BASELINE.md's
trend-anchor reading rules mechanically, per query:

- wall up AND cpu up        -> REGRESSION?  (a code/plan change — investigate)
- wall up,  cpu flat        -> contention   (host noise — note, don't chase)
- wall up,  cpu DOWN        -> mixed        (work changed shape AND host busy)
- wall flat, cpu up         -> work-moved   (JVM<->python or parallel<->serial)
- wall down AND cpu down    -> improvement

"up"/"down" use a 1.5x wall and 1.3x cpu threshold with a 0.3 s wall /
0.5 cpu-s absolute floor (sub-jiffy ratios are noise); everything else
is flat. When either file lacks the cpu map (pre-round-12 artifacts)
the classification degrades to wall-only with an explicit warning —
wall-only deltas are NOT evidence of a code change on this host.
"""

from __future__ import annotations

import json
import sys

WALL_RATIO, WALL_FLOOR = 1.5, 0.3
CPU_RATIO, CPU_FLOOR = 1.3, 0.5


def _load(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


def _dir(old: float, new: float, ratio: float, floor: float) -> int:
    """-1 down / 0 flat / +1 up, with both a ratio and an absolute gate
    so sub-jiffy swings don't classify."""
    if abs(new - old) < floor:
        return 0
    if new > old * ratio:
        return 1
    if old > new * ratio:
        return -1
    return 0


def main() -> None:
    args: list[str] = []
    top = 10
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--top"):
            top = int(a.split("=", 1)[1] if "=" in a else next(it))
        else:
            args.append(a)
    if len(args) != 2:
        raise SystemExit(__doc__)
    old, new = _load(args[0]), _load(args[1])
    ow, nw = old.get("queries", {}), new.get("queries", {})
    oc, nc = old.get("queries_cpu", {}), new.get("queries_cpu", {})
    common = sorted(set(ow) & set(nw))
    cpu_ok = bool(oc) and bool(nc)

    print(f"wall total: {old.get('value')} -> {new.get('value')}"
          f"  (common {len(common)}: "
          f"{round(sum(ow[k] for k in common), 1)} -> "
          f"{round(sum(nw[k] for k in common), 1)})")
    if cpu_ok:
        cpu_common = sorted(set(oc) & set(nc))
        print(f"cpu total:  {old.get('cpu_value')} -> "
              f"{new.get('cpu_value')}  (common {len(cpu_common)}: "
              f"{round(sum(oc[k] for k in cpu_common), 1)} -> "
              f"{round(sum(nc[k] for k in cpu_common), 1)})")
    else:
        print("cpu map missing in one input — WALL-ONLY diff: on this "
              "host a wall delta without a CPU delta is NOT evidence "
              "of a code change (BASELINE.md trend-anchor policy)")

    buckets: dict[str, list] = {}
    for k in common:
        dw = _dir(ow[k], nw[k], WALL_RATIO, WALL_FLOOR)
        if cpu_ok and k in oc and k in nc:
            dc = _dir(oc[k], nc[k], CPU_RATIO, CPU_FLOOR)
        else:
            dc = None
        if dw == 0 and not dc:
            continue
        if dc is None:
            cls = "wall-only move"
        elif dw > 0 and dc > 0:
            cls = "REGRESSION?"
        elif dw > 0 and dc < 0:
            # cheaper on CPU while wall regressed: NOT contention (the
            # docstring defines that as wall up / cpu FLAT) — the work
            # changed shape and the host was also busy; look at both.
            cls = "mixed"
        elif dw > 0:
            cls = "contention"
        elif dw == 0 and dc > 0:
            cls = "work-moved"
        elif dw < 0 and (dc or 0) <= 0:
            cls = "improvement"
        else:
            cls = "mixed"
        mag = nw[k] / max(ow[k], 1e-9)
        buckets.setdefault(cls, []).append((mag, k))

    order = ["REGRESSION?", "work-moved", "contention", "mixed",
             "wall-only move", "improvement"]
    for cls in order:
        rows = buckets.get(cls)
        if not rows:
            continue
        rows.sort(reverse=(cls != "improvement"))
        print(f"\n{cls} ({len(rows)}):")
        for mag, k in rows[:top]:
            line = (f"  {k:40s} wall {ow[k]:7.2f} -> {nw[k]:7.2f}"
                    f"  ({mag:5.2f}x)")
            if cpu_ok and k in oc and k in nc:
                line += f"   cpu {oc[k]:7.1f} -> {nc[k]:7.1f}"
            print(line)
    if not buckets:
        print("\nno per-query movers past thresholds — flat round.")


if __name__ == "__main__":
    main()
