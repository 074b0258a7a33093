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
"""

from __future__ import annotations

import json
import re
from collections import Counter
from pathlib import Path

_ROOT = Path(__file__).resolve().parent.parent


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

    # forward view: what the NEXT window's 36 rotating slots target
    latest = {name: max(rs) for name, rs in hist.items()}
    dist = Counter(latest.values())
    print("\ncurrent last-green distribution (round: n queries):",
          dict(sorted(dist.items())))
    stalest = sorted(latest.items(), key=lambda kv: kv[1])[:36]
    tiers = Counter(r for _, r in stalest)
    print("next window's 36 rotating slots target:",
          dict(sorted(tiers.items())),
          "\n(NEVER-checked queries are invisible here — they have no"
          " artifact row — yet they sort FIRST in the real window"
          " (last-green round 0); subtract any newly-registered queries"
          " from the stalest tier above.)")


if __name__ == "__main__":
    main()
