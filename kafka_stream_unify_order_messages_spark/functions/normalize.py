"""Type canonicalization and priority ordering as pure Column expressions.

Reference semantics (parity targets, cited into /root/reference):
- alias table + case-insensitive lookup:
  src/main/java/com/example/stream/model/OrderEventType.java:12-19,37-43
- canonicalize with per-topic fallback when the raw type is unknown:
  src/main/java/com/example/stream/OrderProjectionTopology.java:84-97
- integer priorities 10/20/30 define output order:
  src/main/java/com/example/stream/model/OrderEventType.java:7-11,
  OrderProjection.java:74-84

Everything here is a JVM-side Column expression (map literal + lower +
coalesce) — no UDFs, fully codegen-able, safe in a 100 TB scan.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F

# canonical name -> sort priority (lower emits first)
TYPE_PRIORITIES: dict[str, int] = {"created": 10, "placed": 20, "cancelled": 30}

REQUIRED_TYPES: tuple[str, ...] = ("created", "placed", "cancelled")

# raw (lowercased) -> canonical
TYPE_ALIASES: dict[str, str] = {
    "created": "created",
    "order-created": "created",
    "placed": "placed",
    "order-placed": "placed",
    "cancelled": "cancelled",
    "order-cancelled": "cancelled",
}

# source topic -> canonical fallback type (topicStream wiring,
# OrderProjectionTopology.java:39-46)
TOPIC_FALLBACK_TYPES: dict[str, str] = {
    "order-created": "created",
    "order-placed": "placed",
    "order-cancelled": "cancelled",
}


def _map_literal(mapping: dict[str, str]) -> Column:
    pairs: list[Column] = []
    for k, v in mapping.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.create_map(*pairs)


def canonicalize_type(
    type_col: Column | str,
    fallback: Column | str | None = None,
    aliases: dict[str, str] | None = None,
) -> Column:
    """Canonical event type: alias-map lookup (case-insensitive), else the
    fallback (a topic-derived Column or literal), else the raw value
    unchanged (the reference keeps the event untouched when both the type
    and the fallback are unknown — it is then ignored at buffer time).
    """
    col = F.col(type_col) if isinstance(type_col, str) else type_col
    alias_map = _map_literal(aliases or TYPE_ALIASES)
    looked_up = F.element_at(alias_map, F.lower(col))
    if fallback is None:
        return F.coalesce(looked_up, col)
    fb = F.lit(fallback) if isinstance(fallback, str) else fallback
    return F.coalesce(looked_up, fb, col)


def topic_fallback(topic_col: Column | str) -> Column:
    """Map a source-topic column to its canonical fallback type."""
    col = F.col(topic_col) if isinstance(topic_col, str) else topic_col
    return F.element_at(_map_literal(TOPIC_FALLBACK_TYPES), col)


def observe_counts(df, name: str = "source"):
    """P1 parity (the reference's peek/log at OrderProjectionTopology.java:
    75-78): attach named observation metrics — record count and null-id
    count — without touching the data. Works on batch and streaming
    DataFrames; read back via ``df.observedMetrics`` /
    ``StreamingQueryProgress.observedMetrics`` (vs the reference's
    printf-per-record, which no 100 TB pipeline can afford).
    """
    return df.observe(
        name,
        F.count(F.lit(1)).alias("n_records"),
        F.sum(F.col("order_id").isNull().cast("long")).alias("n_null_ids"),
    )


def type_priority(
    type_col: Column | str, priorities: dict[str, int] | None = None
) -> Column:
    """Integer sort priority for a canonical type; null for unknown types."""
    col = F.col(type_col) if isinstance(type_col, str) else type_col
    prios = priorities or TYPE_PRIORITIES
    pairs: list[Column] = []
    for k, v in prios.items():
        pairs.append(F.lit(k))
        pairs.append(F.lit(v))
    return F.element_at(F.create_map(*pairs), col)
