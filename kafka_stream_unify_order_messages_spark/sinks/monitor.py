"""Operational monitoring for streaming queries: a StreamingQueryListener
that accumulates per-batch progress (rows/s, state-store size, observed
metrics) — the at-scale replacement for the reference's printf logging
(`[source:...]`/`[transform]`/`[punctuate]` printfs,
OrderProjectionTopology.java:75-78, OrderProjectionTransformer.java:
47-120), which is per-record and unusable at 100 TB. Spark's progress
events are per-micro-batch and O(1) per trigger regardless of row volume.

Composes with ``functions/normalize.py:observe_counts`` (P1 parity):
observed metrics ride the progress event and land in each record here.
"""

from __future__ import annotations

import json
import threading
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class ProgressRecord:
    query_id: str
    batch_id: int
    num_input_rows: int
    input_rows_per_second: float
    process_rows_per_second: float
    state_rows: int | None
    # Sum of numRowsDroppedByWatermark across the batch's stateful
    # operators. THE alarm metric for event-time pipelines: a sustained
    # non-zero rate means the source's arrival order violates the
    # watermark delay and the engine is silently discarding data —
    # e.g. an out-of-order backfill dribbled through a rate limit
    # (measured failure mode: docs/DEPLOYMENT.md §5 and the round-11
    # STREAMING.md narrative, where exactly this froze a sustained
    # event-time run at 467/2000 projections). Page on it; don't graph
    # it quietly.
    rows_dropped_by_watermark: int = 0
    observed: dict[str, Any] = field(default_factory=dict)


class ProgressMonitor(StreamingQueryListener):
    """Collects one ProgressRecord per micro-batch across all queries on
    the session. Thread-safe; ``records`` is append-only so readers can
    snapshot without locking.
    """

    def __init__(self) -> None:
        self.records: list[ProgressRecord] = []
        self._lock = threading.Lock()

    # -- listener callbacks -------------------------------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        rec = ProgressRecord(
            query_id=p.get("id", ""),
            batch_id=int(p.get("batchId", -1)),
            num_input_rows=int(p.get("numInputRows", 0)),
            input_rows_per_second=float(p.get("inputRowsPerSecond", 0.0)),
            process_rows_per_second=float(
                p.get("processedRowsPerSecond", 0.0)
            ),
            state_rows=(
                int(state[0]["numRowsTotal"]) if state else None
            ),
            rows_dropped_by_watermark=sum(
                int(op.get("numRowsDroppedByWatermark", 0) or 0)
                for op in state
            ),
            observed=p.get("observedMetrics", {}) or {},
        )
        with self._lock:
            self.records.append(rec)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    # -- convenience --------------------------------------------------------

    def totals(self) -> dict[str, Any]:
        """Aggregate view: total input rows, max state rows, merged
        observed metric sums (numeric values only)."""
        with self._lock:
            recs = list(self.records)
        observed_sums: dict[str, float] = {}
        for r in recs:
            for metrics in r.observed.values():
                if isinstance(metrics, dict):
                    for k, v in metrics.items():
                        if isinstance(v, (int, float)):
                            observed_sums[k] = observed_sums.get(k, 0) + v
        return {
            "batches": len(recs),
            "input_rows": sum(r.num_input_rows for r in recs),
            "max_state_rows": max(
                (r.state_rows for r in recs if r.state_rows is not None),
                default=None,
            ),
            "rows_dropped_by_watermark": sum(
                r.rows_dropped_by_watermark for r in recs
            ),
            "observed": observed_sums,
        }


def attach_monitor(spark: SparkSession) -> ProgressMonitor:
    """Register and return a ProgressMonitor on the session. Caller owns
    detaching: ``spark.streams.removeListener(monitor)``."""
    monitor = ProgressMonitor()
    spark.streams.addListener(monitor)
    return monitor
