"""Streaming heavy hitters: sharded Misra-Gries candidate state OVER
THE STREAM, the streaming twin of the batch two-pass operator
`operators/sketches.py:heavy_hitters_exact` (registry query
`bigram_heavy_hitters`).

The batch operator answers "which items exceed frequency n/den" with
two corpus scans; a continuous ingest pipeline cannot re-scan history,
so the stream keeps the SAME capacity-k Misra-Gries summary as
persistent keyed state and folds every micro-batch into it (Misra &
Gries 1982; merge per Agarwal, Cormode, Huang, Phillips, Wei, Yi,
"Mergeable Summaries", PODS 2012). This is the reference's KV-state
shape — per-key state in a store, updated per arrival, emitted
downstream (OrderProjectionTopology.java:48-52 / RocksDB) — with the
key being a SHARD of the item space instead of an order id.

Sharding: items hash to one of ``shards`` state shards
(`pmod(xxhash64(item), shards)`), so ALL occurrences of an item land in
the same shard and the shard-local count IS the global count. That
gives the two properties a distributed summary needs:

- parallelism: the stateful shuffle spreads over ``shards`` keys —
  size it ~2-4x the executor-core count at scale (state per shard is
  <= k items, so total state is shards x k rows however large the
  corpus);
- a per-shard error bound that never crosses shards: within shard s,
  every item's Misra-Gries counter ``lb`` satisfies
  ``true - d <= lb <= true`` with ``d <= (n_s - sum(lb)) / (k + 1)``
  (the merge-formulation bound from Mergeable Summaries) — emitted per
  snapshot as ``d_max``, so downstream consumers get sound intervals
  [lb, lb + d_max] without any global coordination.

Guarantee (same argument as the batch operator's superset comment in
operators/sketches.py): an item with global count >= ceil(N/den)
survives in its shard's summary whenever k >= den — even in the worst
case where every row hashes to ONE shard (n_s = N). The default
k = max(64, 2*den) keeps the batch operator's safety margin. Sharding
only ever helps: with mass spread over P shards the effective bound
shrinks to ~N/(P*(k+1)).

What streaming cannot give: the batch operator's second pass makes the
output EXACT (candidates recounted, false positives removed). A stream
has no second pass, so the emission is the candidate summary itself —
sound per-item bounds, a guaranteed superset of the true heavy
hitters, possibly with borderline extras. `heavy_hitters_from_candidates`
applies the threshold test ``lb + d_max >= ceil(N/den)`` (include iff
the interval ADMITS heaviness), which is exactly the superset the
two-pass batch operator would then recount. Pipelines that need
exactness run that recount as a batch join over the archived stream —
the lambda shape this module is designed to feed.

Emission: append-mode rows ``(shard, item, lb, n_shard, d_max)`` — one
snapshot of a shard's full candidate set per micro-batch that touched
it. ``n_shard`` is strictly monotone per shard (a shard only emits
when it absorbed rows), so "latest snapshot" = max n_shard per shard
(`latest_candidate_snapshot`).

State is permanent by design (frequency over all time); there is no
TTL option because expiring part of a frequency summary silently
changes what "count" means — bounded-horizon frequency belongs to
windowed aggregation (streaming/windowed.py), not to this operator.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CANDIDATE_SCHEMA = (
    "shard long, item string, lb long, n_shard long, d_max long"
)
SHARD_STATE_SCHEMA = "items array<string>, lbs array<long>, n_shard long"


def make_shard_mg_fn(k: int) -> Callable:
    """Stateful kernel: fold each micro-batch's arrivals for one shard
    into the shard's capacity-``k`` Misra-Gries summary, persist it,
    and emit the post-batch snapshot.

    Same vectorized merge as the batch kernel
    (operators/sketches.py:misra_gries_partition_summaries): the batch
    collapses through pandas ``value_counts`` (C-side), then the
    Mergeable-Summaries reduction (subtract the (k+1)-th largest
    counter, drop non-positives) enforces capacity — O(distinct) per
    micro-batch, never a per-element decrement loop.
    """
    if k < 1:
        raise ValueError(f"capacity k must be >= 1 (got {k})")

    def fn(
        key: Any,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        shard = int(key[0])
        if state.exists:
            items, lbs, n = state.get
            counts = pd.Series(
                [int(x) for x in lbs], index=list(items), dtype="int64"
            )
            n = int(n)
        else:
            counts = pd.Series(dtype="int64")
            n = 0
        for pdf in pdfs:
            vc = pdf["item"].value_counts()
            n += int(vc.sum())
            counts = counts.add(vc, fill_value=0).astype("int64")
            if len(counts) > k:
                cut = counts.nlargest(k + 1).iloc[-1]
                counts = counts[counts > cut] - cut
        state.update((list(counts.index), [int(v) for v in counts], n))
        # merge-formulation error bound: every decrement event removes
        # >= k+1 count units, so the per-item undercount is at most
        # (units removed) / (k+1) — integer arithmetic, no float
        d_max = (n - int(counts.sum())) // (k + 1)
        yield pd.DataFrame(
            {
                "shard": shard,
                "item": list(counts.index),
                "lb": [int(v) for v in counts],
                "n_shard": n,
                "d_max": d_max,
            }
        )

    return fn


def heavy_hitter_candidates_stream(
    items: DataFrame,
    item_col: str = "item",
    den: int = 800,
    shards: int = 32,
    k: int | None = None,
) -> DataFrame:
    """Maintain per-shard Misra-Gries heavy-hitter candidates over a
    stream of items; emit each touched shard's candidate snapshot per
    micro-batch (CANDIDATE_SCHEMA — see the module docstring for the
    bound semantics).

    ``den`` is the integer reciprocal of the target frequency phi =
    1/den, matching the batch operator; it only sizes the default
    capacity ``k = max(64, 2*den)`` (the summary itself is
    threshold-free — apply any ``den' <= den`` downstream via
    `heavy_hitters_from_candidates`). Passing ``k`` explicitly must
    respect k >= 2*den for the worst-case survival guarantee, exactly
    like the batch operator.

    The only shuffle is the stateful groupBy on the shard key —
    scan-local hash, no pre-aggregation (a streaming aggregation ahead
    of arbitrary state is not append-mode-legal; the Arrow-batched
    ``value_counts`` inside the kernel does the collapsing instead).
    """
    if den < 1:
        raise ValueError(f"den must be >= 1 (got {den})")
    if shards < 1:
        raise ValueError(f"shards must be >= 1 (got {shards})")
    if k is None:
        k = max(64, 2 * den)
    elif k < 2 * den:
        raise ValueError(
            f"capacity k={k} breaks the survival guarantee for den={den}:"
            f" need k >= {2 * den} (worst case puts all mass in one"
            " shard, where ceil(n/den) must exceed n/(k+1))"
        )
    keyed = items.select(
        F.col(item_col).cast("string").alias("item"),
        F.pmod(F.xxhash64(F.col(item_col).cast("string")), F.lit(shards))
        .cast("long")
        .alias("shard"),
    )
    return keyed.groupBy("shard").applyInPandasWithState(
        make_shard_mg_fn(k),
        outputStructType=CANDIDATE_SCHEMA,
        stateStructType=SHARD_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def latest_candidate_snapshot(emissions: DataFrame) -> DataFrame:
    """Reduce an archive of per-trigger emissions to each shard's most
    recent snapshot. ``n_shard`` is strictly monotone per shard (a
    shard emits only when it absorbed rows), so the latest snapshot is
    the max-``n_shard`` row group. Batch function (run it on the
    stream's sink table)."""
    w = Window.partitionBy("shard")
    return (
        emissions.withColumn("_mx", F.max("n_shard").over(w))
        .filter(F.col("n_shard") == F.col("_mx"))
        .drop("_mx")
    )


def heavy_hitters_from_candidates(
    snapshot: DataFrame, den: int
) -> DataFrame:
    """Threshold a candidate snapshot: keep items whose sound interval
    [lb, lb + d_max] admits global frequency >= ceil(N/den), where N is
    the total item count (sum of the per-shard exact totals). Output
    ``(item, lb, ub)`` — a guaranteed SUPERSET of the exact heavy
    hitters (every true heavy hitter satisfies lb + d_max >= threshold;
    see the module docstring), with per-item bounds for downstream
    triage or an exact batch recount.

    All frames here are candidate-sized (<= shards x k rows), so the
    total is a broadcast — no data-sized work at any corpus size.
    """
    if den < 1:
        raise ValueError(f"den must be >= 1 (got {den})")
    totals = snapshot.groupBy("shard").agg(
        F.first("n_shard").alias("_n")
    )
    total = totals.agg(F.sum("_n").alias("_total"))
    return (
        snapshot.crossJoin(F.broadcast(total))
        .filter(
            F.col("lb") + F.col("d_max")
            >= F.expr(f"(_total + {den - 1}) DIV {den}")
        )
        .select(
            "item",
            "lb",
            (F.col("lb") + F.col("d_max")).alias("ub"),
        )
    )
