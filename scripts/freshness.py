"""Print the PARITY.md freshness-ledger row for each recorded round.

Usage:
    python scripts/freshness.py

For every driver artifact CORRECTNESS_r{N}.json (in round order), take
each query's most recent PASSING round at-or-before N (hash_match true,
no err) and report the registry-wide MINIMUM — the "freshness floor":
how stale the least recently driver-confirmed query is. The stalest-
first window rotation's job is to keep this floor moving; the ledger
row for a new round is appended to PARITY.md §"Freshness ledger" once
the driver's artifact lands. Also prints what the NEXT round's window
will target (the current stalest rows), for the forward-looking cell.

The forward view is REGISTRY-AWARE: it imports the live registry and
treats any registered query with no passing artifact row as last-green
round 0 — exactly how registry's stalest-first rotation ranks it — so
a freshly added query shows up LEADING the projected window instead of
being invisible (it has no artifact row to be found in). The historic
ledger rows stay artifact-only on purpose: a query registered in round
N did not exist in rounds < N and must not drag their floors to r00.
"""

from __future__ import annotations

import json
import re
import sys
from collections import Counter
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))


def main() -> None:
    hist: dict[str, list[int]] = {}
    rounds: list[int] = []
    for p in sorted(_ROOT.glob("CORRECTNESS_r*.json")):
        m = re.match(r"CORRECTNESS_r(\d+)\.json$", p.name)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            data = json.loads(p.read_text())
        except ValueError:
            continue
        if not isinstance(data, dict):
            continue
        rounds.append(rnd)
        for k, v in data.items():
            if isinstance(v, dict) and v.get("hash_match") and not v.get("err"):
                hist.setdefault(k, []).append(rnd)

    print("| round | union green | freshness floor after round |"
          " queries still at floor |")
    for upto in rounds:
        g = {
            name: max(r for r in rs if r <= upto)
            for name, rs in hist.items()
            if any(r <= upto for r in rs)
        }
        floor = min(g.values())
        n_floor = sum(1 for v in g.values() if v == floor)
        print(f"| r{upto:02d} | {len(g)} | r{floor:02d} | {n_floor} |")

    # forward view: what the NEXT window's 36 rotating slots target.
    # Registry-aware: seed every registered ORACLED query at round 0 so
    # never-checked queries appear (leading, exactly as the live
    # stalest-first rotation ranks them) instead of being invisible for
    # lack of an artifact row. Pinned names are excluded — they hold
    # the window's fixed block, not a rotating slot.
    from kafka_stream_unify_order_messages_spark import registry

    slots = registry._ROTATING_SLOTS
    rotating = [
        n for n in registry.ORACLES if n not in registry._PINNED
    ]
    latest = {name: 0 for name in rotating}
    latest.update(
        (name, max(rs))
        for name, rs in hist.items()
        if name in latest
    )
    dist = Counter(latest.values())
    print("\ncurrent last-green distribution (round: n queries):",
          dict(sorted(dist.items())))
    stalest = sorted(latest.items(), key=lambda kv: kv[1])[:slots]
    tiers = Counter(r for _, r in stalest)
    print(f"next window's {slots} rotating slots target:",
          dict(sorted(tiers.items())))
    never = sorted(n for n, r in latest.items() if r == 0)
    if never:
        print("never driver-checked (lead the projected window):",
              ", ".join(never))


if __name__ == "__main__":
    main()
