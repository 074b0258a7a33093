"""Dump the formatted physical plan of any registry query.

    python scripts/explain.py tpch_q1 [sf_dir]
    python scripts/explain.py --all          # one-line plan summary of all

Use while iterating on an operator: the goal is the plan you'd WANT on a
1000-executor cluster (pushed filters, pruned columns, broadcast dims,
no redundant exchanges), not just the first plan that passes.
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_stream_unify_order_messages_spark import get_spark, registry


def summarize(plan: str) -> str:
    pushed_re = re.compile(r"PushedFilters: \[[^\]]")
    n_pushed = len(pushed_re.findall(plan))
    return (
        f"exchanges={plan.count('Exchange')} "
        f"broadcast_joins={plan.count('BroadcastHashJoin')} "
        f"smj={plan.count('SortMergeJoin')} "
        f"pandas={plan.count('InPandas')} "
        f"pushed={n_pushed}"
    )


def main() -> None:
    args = [a for a in sys.argv[1:]]
    sf_dir = "/root/testdata/sf0.001"
    names = []
    show_all = False
    for a in args:
        if a == "--all":
            show_all = True
        elif a.startswith("/"):
            sf_dir = a
        else:
            names.append(a)

    spark = get_spark("explain", master="local[8]")
    if show_all:
        for name, fn in registry.QUERIES.items():
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
            print(f"{name:32s} {summarize(plan)}")
    else:
        for name in names:
            df = registry.QUERIES[name](spark, sf_dir)
            print(f"===== {name}")
            df.explain("formatted")
    spark.stop()


if __name__ == "__main__":
    main()
