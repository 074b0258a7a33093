"""Query registry: every implemented operator exposed as a (Spark query,
DuckDB oracle SQL) pair for the driver's correctness gate.

Each Spark callable takes ``(spark, sf_dir)`` and returns a DataFrame; each
oracle is ANSI SQL DuckDB runs against the same parquet registered as views.
Column names and types are aligned on both sides (the driver sorts columns
by name and hashes values). Double-typed aggregates are rounded identically
on both sides to absorb summation-order float drift.

Operator IDs in comments refer to SURVEY.md §2.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.sources.files import load_table
from kafka_stream_unify_order_messages_spark.functions.normalize import (
    canonicalize_type,
)
from kafka_stream_unify_order_messages_spark.operators.unify import (
    unify_events_flat,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Flagship: the reference's full unification pipeline (P2+P3+T1+T5+T7+T8+T9)
# run against the `events` table — user_id plays order-id, the five event
# types play the lifecycle, completeness requires all five. Flattened
# (one row per projected event, 1-based position) for hash stability.
# ---------------------------------------------------------------------------

EVENTS_PRIORITIES = {
    "click": 10,
    "view": 20,
    "signup": 30,
    "purchase": 40,
    "error": 50,
}
EVENTS_ALIASES = {t: t for t in EVENTS_PRIORITIES}

_EVENTS_PRIORITY_SQL = (
    "CASE event_type WHEN 'click' THEN 10 WHEN 'view' THEN 20 "
    "WHEN 'signup' THEN 30 WHEN 'purchase' THEN 40 WHEN 'error' THEN 50 END"
)


@query(
    "unify_projection",
    f"""
WITH firsts AS (
    SELECT user_id, event_type, event_id, ts, value,
           row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) AS rn
    FROM events
    WHERE user_id IS NOT NULL
      AND lower(event_type) IN ('click','view','signup','purchase','error')
), first1 AS (
    SELECT user_id, lower(event_type) AS event_type, event_id, ts, value
    FROM firsts WHERE rn = 1
), complete AS (
    SELECT user_id FROM first1 GROUP BY user_id HAVING count(*) = 5
)
SELECT f.user_id,
       row_number() OVER (
           PARTITION BY f.user_id ORDER BY {_EVENTS_PRIORITY_SQL}
       ) AS position,
       f.event_id, f.event_type, f.ts, f.value
FROM first1 f
JOIN complete c USING (user_id)
""",
)
def unify_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return unify_events_flat(
        events,
        id_col="user_id",
        type_col="event_type",
        arrival_cols=["ts", "event_id"],
        payload_cols=["event_id", "event_type", "ts", "value"],
        priorities=EVENTS_PRIORITIES,
        aliases=EVENTS_ALIASES,
    )


# ---------------------------------------------------------------------------
# P2/P6 — type canonicalization: alias map, case-insensitive, topic fallback
# ---------------------------------------------------------------------------

_CANON_ALIASES = {
    **{t: t for t in EVENTS_PRIORITIES},
    **{f"evt-{t}": t for t in EVENTS_PRIORITIES},
}

_CANON_TOPICS = {f"topic-{t}": t for t in EVENTS_PRIORITIES}

_CANON_CASE_SQL = " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in _CANON_ALIASES.items()
)
_TOPIC_CASE_SQL = " ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in _CANON_TOPICS.items()
)


@query(
    "canonicalize_types",
    f"""
WITH raw AS (
    SELECT event_id,
           CASE CAST(event_id % 3 AS INTEGER)
               WHEN 0 THEN upper(event_type)
               WHEN 1 THEN 'evt-' || event_type
               ELSE 'junk-' || CAST(event_id % 7 AS VARCHAR)
           END AS raw_type,
           'topic-' || event_type AS topic
    FROM events
)
SELECT event_id, raw_type,
       coalesce(
           CASE lower(raw_type) {_CANON_CASE_SQL} END,
           CASE topic {_TOPIC_CASE_SQL} END,
           raw_type
       ) AS canonical_type
FROM raw
""",
)
def canonicalize_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    raw = events.select(
        "event_id",
        F.when(F.col("event_id") % 3 == 0, F.upper("event_type"))
        .when(F.col("event_id") % 3 == 1, F.concat(F.lit("evt-"), "event_type"))
        .otherwise(F.concat(F.lit("junk-"), (F.col("event_id") % 7).cast("string")))
        .alias("raw_type"),
        F.concat(F.lit("topic-"), "event_type").alias("topic"),
    )
    topic_map = F.create_map(
        *[F.lit(x) for kv in _CANON_TOPICS.items() for x in kv]
    )
    return raw.select(
        "event_id",
        "raw_type",
        canonicalize_type(
            F.col("raw_type"),
            fallback=F.element_at(topic_map, F.col("topic")),
            aliases=_CANON_ALIASES,
        ).alias("canonical_type"),
    )


# ---------------------------------------------------------------------------
# P3 — null/invalid filter (drop records with null id)
# ---------------------------------------------------------------------------


@query(
    "null_filter",
    """
WITH tagged AS (
    SELECT event_id, nullif(user_id, 3) AS user_id, event_type
    FROM events
)
SELECT event_id, user_id, event_type
FROM tagged
WHERE user_id IS NOT NULL AND event_type IS NOT NULL
""",
)
def null_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    tagged = events.select(
        "event_id",
        F.expr("nullif(user_id, 3)").alias("user_id"),
        "event_type",
    )
    return tagged.filter(
        F.col("user_id").isNotNull() & F.col("event_type").isNotNull()
    )


# ---------------------------------------------------------------------------
# T5 — first-wins dedup per (id, type) by arrival order
# ---------------------------------------------------------------------------


@query(
    "first_wins_dedup",
    """
WITH ranked AS (
    SELECT user_id, event_type, event_id, ts, value,
           row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
           ) AS rn
    FROM events
)
SELECT user_id, event_type, event_id, ts, value
FROM ranked WHERE rn = 1
""",
)
def first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    first = events.groupBy("user_id", "event_type").agg(
        F.min_by(
            F.struct("event_id", "ts", "value"), F.struct("ts", "event_id")
        ).alias("e")
    )
    return first.select(
        "user_id",
        "event_type",
        F.col("e.event_id").alias("event_id"),
        F.col("e.ts").alias("ts"),
        F.col("e.value").alias("value"),
    )


# ---------------------------------------------------------------------------
# T7 — completeness gate (all distinct types present)
# ---------------------------------------------------------------------------


@query(
    "completeness_gate",
    """
SELECT user_id, count(DISTINCT event_type) AS n_types
FROM events
GROUP BY user_id
HAVING count(DISTINCT event_type) = 5
""",
)
def completeness_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    # size(collect_set) instead of countDistinct: one exchange with
    # map-side partial sets (countDistinct plans a two-phase expand);
    # set cardinality is bounded by the closed type vocabulary
    return (
        events.groupBy("user_id")
        .agg(F.size(F.collect_set("event_type")).cast("long").alias("n_types"))
        .filter(F.col("n_types") == 5)
    )


# ---------------------------------------------------------------------------
# T8 — priority-ordered collect (sorted list aggregation, CSV-flattened)
# ---------------------------------------------------------------------------


@query(
    "priority_collect",
    """
SELECT user_id, event_type,
       string_agg(CAST(event_id AS VARCHAR), ',' ORDER BY ts, event_id)
           AS event_ids
FROM events
GROUP BY user_id, event_type
""",
)
def priority_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy("user_id", "event_type").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id"))),
                lambda s: s["event_id"].cast("string"),
            ),
            ",",
        ).alias("event_ids")
    )


# ---------------------------------------------------------------------------
# T1 — stream union (three tagged slices re-merged)
# ---------------------------------------------------------------------------


@query(
    "union_streams",
    """
SELECT event_id, 'clicks' AS stream FROM events WHERE event_type = 'click'
UNION ALL
SELECT event_id, 'purchases' AS stream FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT event_id, 'errors' AS stream FROM events WHERE event_type = 'error'
""",
)
def union_streams(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")

    def slice_(t: str, tag: str) -> DataFrame:
        return events.filter(F.col("event_type") == t).select(
            "event_id", F.lit(tag).alias("stream")
        )

    return (
        slice_("click", "clicks")
        .unionByName(slice_("purchase", "purchases"))
        .unionByName(slice_("error", "errors"))
    )


# ---------------------------------------------------------------------------
# P7 — ISO-8601 timestamp format/parse round-trip
# ---------------------------------------------------------------------------


@query(
    "timestamp_roundtrip",
    """
SELECT event_id,
       strftime(ts, '%Y-%m-%dT%H:%M:%S.%f') AS iso,
       strptime(strftime(ts, '%Y-%m-%dT%H:%M:%S.%f'),
                '%Y-%m-%dT%H:%M:%S.%f') AS reparsed
FROM events
""",
)
def timestamp_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    fmt = "yyyy-MM-dd'T'HH:mm:ss.SSSSSS"
    iso = F.date_format("ts", fmt)
    return events.select(
        "event_id",
        iso.alias("iso"),
        F.to_timestamp(iso, fmt).cast("timestamp_ntz").alias("reparsed"),
    )


# ---------------------------------------------------------------------------
# P8 — regex filter (the Wasm transform analogue: forward iff value matches)
# ---------------------------------------------------------------------------

_REGEX = "(spark|stream)[ ]+(join|window|scan)"


@query(
    "regex_filter",
    f"""
SELECT doc_id, lang, n_chars
FROM documents
WHERE regexp_matches(text, '{_REGEX}')
""",
)
def regex_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(F.col("text").rlike(_REGEX)).select(
        "doc_id", "lang", "n_chars"
    )


# ---------------------------------------------------------------------------
# P9 — strict JSON field extraction + validation (schema-registry analogue)
# ---------------------------------------------------------------------------


@query(
    "json_validate",
    """
SELECT event_id,
       CAST(props ->> '$.k' AS BIGINT) AS k
FROM events
WHERE props IS NOT NULL
  AND CAST(props ->> '$.k' AS BIGINT) BETWEEN 0 AND 99
""",
)
def json_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.filter(F.col("props").isNotNull())
        .select("event_id", k.alias("k"))
        .filter(F.col("k").between(0, 99))
    )


# ---------------------------------------------------------------------------
# R1/R2 — deterministic 1→N fan-out via explode(sequence)
# ---------------------------------------------------------------------------


@query(
    "fanout_explode",
    """
SELECT event_id,
       unnest(generate_series(1, 1 + CAST(event_id % 3 AS BIGINT)))
           AS copy_idx
FROM events
""",
)
def fanout_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.explode(
            F.sequence(F.lit(1).cast("long"), F.lit(1) + F.col("event_id") % 3)
        ).alias("copy_idx"),
    )


# ---------------------------------------------------------------------------
# R2 — array unarchive: one JSON-array message -> one row per element
# (the Redpanda-Connect `unarchive: json_array` stage,
# docker-compose.yml:249-250) as explode(from_json(.., array<struct>))
# ---------------------------------------------------------------------------


@query(
    "json_unarchive",
    """
SELECT event_id, CAST(i AS INTEGER) AS idx,
       CAST(props ->> '$.k' AS BIGINT) AS k
FROM events, unnest(generate_series(0, 1)) AS t(i)
WHERE props IS NOT NULL
""",
)
def json_unarchive(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import ArrayType, LongType, StructField, StructType

    events = load_table(spark, sf_dir, "events")
    # build a 2-element JSON array message from each props payload, then
    # split it back into one row per element — the R2 shape end-to-end
    arr = F.concat(F.lit("["), "props", F.lit(","), "props", F.lit("]"))
    elem = StructType([StructField("k", LongType())])
    return (
        events.filter(F.col("props").isNotNull())
        .select(
            "event_id",
            F.posexplode(F.from_json(arr, ArrayType(elem))).alias("idx", "e"),
        )
        .select("event_id", "idx", F.col("e.k").alias("k"))
    )


# ---------------------------------------------------------------------------
# R3/R4 — conditional multi-topic routing as a derived column
# ---------------------------------------------------------------------------


@query(
    "topic_routing",
    """
SELECT event_id,
       CASE WHEN event_type = 'error' THEN 'errors'
            WHEN event_type = 'purchase' THEN 'transactions'
            ELSE 'activity' END AS topic
FROM events
""",
)
def topic_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.when(F.col("event_type") == "error", "errors")
        .when(F.col("event_type") == "purchase", "transactions")
        .otherwise("activity")
        .alias("topic"),
    )


# ---------------------------------------------------------------------------
# Relational surface: TPC-H-style Q1 (scan-heavy aggregation)
# ---------------------------------------------------------------------------


@query(
    "tpch_q1",
    """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       round(sum(l_extendedprice), 2) AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       round(avg(l_quantity), 4) AS avg_qty,
       round(avg(l_discount), 4) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
)
def tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-12-01 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# Register the extended query families (import side effect populates
# QUERIES/ORACLES; placed at module end so the decorator exists first).
import kafka_stream_unify_order_messages_spark.queries_relational  # noqa: E402,F401
import kafka_stream_unify_order_messages_spark.queries_llm  # noqa: E402,F401
import kafka_stream_unify_order_messages_spark.queries_training  # noqa: E402,F401
import kafka_stream_unify_order_messages_spark.queries_analytics  # noqa: E402,F401


# ---------------------------------------------------------------------------
# Registration order doubles as the driver's verification window (the
# correctness gate samples the first N≈50 entries of ``queries()``).
# Ordering policy (also documented in PARITY.md §"Driver window rotation"):
#
# 1. The SURVEY.md §2 reference pipeline (14 queries) is PINNED first —
#    the reference's own semantics get a driver-checked row every round.
# 2. Every other ORACLED query follows STALEST-DRIVER-CHECK-FIRST: sort
#    by the round of the query's most recent driver-GREEN row in a
#    CORRECTNESS_r{N}.json, ascending (never-checked counts as round 0,
#    so new queries still enter the window before everything else; ties
#    break on stable registration order). Since round 10 every query has
#    at least one green row, so the job of the window is no longer
#    coverage but FRESHNESS: rows checked in r01-r03 were verified
#    against code that has since changed many times — rolling the window
#    through the stalest rows keeps "driver-green" a live property (each
#    round re-verifies the ~36 least recently confirmed queries, full
#    re-verification cycle ≈ ceil(n/36) rounds). Self-advancing like the
#    old coverage-first policy: this round's artifact bumps its window's
#    last-green rounds, so next round's window starts where freshness
#    actually stops. The builder's strict sweep stays the per-round
#    safety net for everything outside the window.
# 3. Rows-only queries (no oracle) sort last: a driver window slot spent
#    on a rows-only check verifies strictly less than one spent on a
#    value-hash check.
#
# The order is deterministic for the whole round: it depends only on the
# committed CORRECTNESS_r{N}.json artifacts (the driver writes round N's
# artifact only after running round N's gate).
# ---------------------------------------------------------------------------

_PINNED = [
    # SURVEY.md §2 reference pipeline (registered above, kept first).
    "unify_projection",
    "canonicalize_types",
    "null_filter",
    "first_wins_dedup",
    "completeness_gate",
    "priority_collect",
    "union_streams",
    "timestamp_roundtrip",
    "regex_filter",
    "json_validate",
    "fanout_explode",
    "json_unarchive",
    "topic_routing",
    "tpch_q1",
]

_ROTATING_SLOTS = 36  # driver window (~50) minus the pinned block


def _driver_green_rounds() -> dict[str, int]:
    """Map each query name to the HIGHEST round N whose driver
    CORRECTNESS_r{N}.json holds a PASSING row for it (hash_match true and
    no recorded error — a failed driver row does not refresh the query's
    last-green round, so the next round re-checks it).

    This is the freshness index behind the stalest-first window ordering
    above: names absent from the map have never been driver-green and
    sort first (round 0); the rest sort by how long ago their green row
    was earned, so re-verification rolls through the whole registry
    instead of letting r01-era rows go stale forever.
    """
    import json
    import re
    from pathlib import Path

    green: dict[str, int] = {}
    for root in (Path(__file__).resolve().parent.parent, Path.cwd()):
        files = sorted(root.glob("CORRECTNESS_r*.json"))
        for p in files:
            m = re.match(r"CORRECTNESS_r(\d+)\.json$", p.name)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                data = json.loads(p.read_text())
            except (OSError, ValueError):
                continue
            if not isinstance(data, dict):
                # malformed artifact (e.g. a list-format file): skip it
                # like a parse failure instead of crashing query ordering
                continue
            for k, v in data.items():
                if (
                    isinstance(v, dict)
                    and v.get("hash_match")
                    and not v.get("err")
                ):
                    green[k] = max(green.get(k, 0), rnd)
        if files:
            break
    return green


# Canonical base order, captured once at import: rotation must slice a
# STABLE sequence — rotating the current (already-rotated) dict would
# compound offsets and break the disjoint-slices-per-round guarantee.
_BASE_ORDER: list[str] = []


def _apply_registration_order(
    round_no: int | None = None,
    green_rounds: dict[str, int] | None = None,
) -> None:
    # round_no is an ignored legacy/test parameter: ordering stopped
    # being round-indexed when the stalest-green-first policy landed
    # (r11); it stays so callers/tests can assert determinism per round
    # without churning signatures.
    del round_no
    if green_rounds is None:
        green_rounds = _driver_green_rounds()
    if not _BASE_ORDER:
        _BASE_ORDER.extend(_PINNED)
        _BASE_ORDER.extend(n for n in QUERIES if n not in _PINNED)
    else:
        # queries registered after the first ordering pass (late module
        # import, test fixture) append to the stable base instead of
        # silently vanishing on the next rebuild
        _BASE_ORDER.extend(n for n in QUERIES if n not in _BASE_ORDER)
    # deregistered queries (fixture teardown, conditional registration)
    # must not survive in the base order — indexing QUERIES[stale] on
    # the next rebuild would raise KeyError
    _BASE_ORDER[:] = [n for n in _BASE_ORDER if n in QUERIES]
    ordered: dict[str, QueryFn] = {}
    for name in _PINNED:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    oracled = [
        n for n in _BASE_ORDER if n not in ordered and n in ORACLES
    ]
    rows_only = [
        n for n in _BASE_ORDER if n not in ordered and n not in ORACLES
    ]
    # stalest-driver-check-first: sort oracled queries by the round of
    # their most recent driver-green row, ascending (never-checked = 0,
    # so new queries still lead; ties keep stable base order — Python's
    # sort is stable). See _driver_green_rounds and the policy block
    # above.
    oracled.sort(key=lambda n: green_rounds.get(n, 0))
    for name in oracled + rows_only:
        ordered[name] = QUERIES[name]
    QUERIES.clear()
    QUERIES.update(ordered)


def benchmark_order() -> list[str]:
    """Registry names in the STABLE registration (source-file) order —
    the order bench.py measures in, independent of the driver-window
    rotation above. Measurement order is part of the measurement on a
    shared-JVM benchmark: related queries registered adjacently share
    codegen/JIT-warm paths, so a per-round rotation of execution order
    would move individual timings ±2-3x (observed in round 11: the
    stalest-first window rotation scrambled family adjacency and
    inflated the bench total ~15% on identical plans) and make the
    cross-round trend line — the driver's 2x-gate evidence — compare
    ordering noise instead of code. The driver window keeps rotating;
    the bench order never does."""
    return list(_BASE_ORDER)


_apply_registration_order()
