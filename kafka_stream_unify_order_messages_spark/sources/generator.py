"""Deterministic order-lifecycle scenario generator (G1-G5) + rate-source
synthetic stream (S8).

Replicates the reference's Go traffic producer semantics
(test-consumer-app/main.go): per lifecycle one UUID order and three events
with monotone timestamps (gaps 0-100 ms, main.go:208-212), publish order
always shuffled (main.go:289-292), optional missing-event injection
(one of three patterns, main.go:317-343) and duplicate injection (2-5
copies of the first one-or-two events, main.go:345-375). Mutually
exclusive flags and p in [0,1] validation (main.go:39-45).

Two implementations:
- ``generate_order_events``  — seeded-RNG driver-side list -> DataFrame;
  exact goldens for tests (small N).
- ``generate_order_events_distributed`` — spark.range + deterministic
  md5-derived expressions; same statistical shape at any scale, no
  driver-side materialization (the 100 TB fixture path).
- ``rate_order_event_stream`` — streaming variant over the rate source,
  matching the Bloblang generator's role (docker-compose.yml:233-244).
"""

from __future__ import annotations

import json
import random
import uuid

from pyspark.sql import DataFrame, SparkSession
import pyspark.sql.functions as F

TOPICS = {
    "created": "order-created",
    "placed": "order-placed",
    "cancelled": "order-cancelled",
}

# main.go:317-343 — the three missing-event patterns
MISSING_PATTERNS = (
    ("placed", "cancelled"),  # skip created
    ("created", "cancelled"),  # skip placed
    ("created",),  # created only
)


def _details(rng: random.Random, etype: str, order_id: str) -> str:
    if etype == "created":
        payload = {
            "customer_id": f"cust-{rng.randrange(1000)}",
            "items": [
                {
                    "sku": f"sku-{rng.randrange(100)}",
                    "quantity": rng.randrange(1, 5),
                    "unit_price": round(rng.uniform(1, 100), 2),
                }
                for _ in range(rng.randrange(1, 4))
            ],
            "total": round(rng.uniform(10, 400), 2),
            "currency": "USD",
        }
    elif etype == "placed":
        payload = {
            "payment_reference": f"pay-{rng.randrange(10**6)}",
            "shipping_method": rng.choice(["standard", "express"]),
            "shipping_address": {
                "line1": f"{rng.randrange(1, 999)} Main St",
                "city": "Springfield",
                "state": "OR",
                "postal_code": f"{rng.randrange(10000, 99999)}",
                "country": "US",
            },
        }
    else:
        payload = {
            "reason": rng.choice(["customer_request", "payment_failed"]),
            "cancelled_by": rng.choice(["customer", "system"]),
            "refund_reference": f"ref-{rng.randrange(10**6)}",
        }
    return json.dumps(payload, separators=(",", ":"))


def generate_order_events(
    n_lifecycles: int,
    seed: int = 42,
    missing_probability: float = 0.0,
    duplicate_probability: float = 0.0,
    base_ms: int = 1_700_000_000_000,
) -> list[dict]:
    """Deterministic event list; one dict per published message.

    Flags are mutually exclusive like the reference CLI (main.go:39-45).
    Each lifecycle is 1 s apart (main.go:125-127); intra-lifecycle gaps are
    0-100 ms monotone. ``arrival_seq`` is the global publish order after
    the always-on shuffle.
    """
    if missing_probability and duplicate_probability:
        raise ValueError("missing and duplicate injection are mutually exclusive")
    for p in (missing_probability, duplicate_probability):
        if not 0.0 <= p <= 1.0:
            raise ValueError(f"probability {p} outside [0, 1]")

    rng = random.Random(seed)
    out: list[dict] = []
    seq = 0
    for i in range(n_lifecycles):
        order_id = str(uuid.UUID(int=rng.getrandbits(128), version=4))
        t = base_ms + i * 1000
        events = []
        for etype in ("created", "placed", "cancelled"):
            events.append(
                {
                    "order_id": order_id,
                    "type": etype,
                    "topic": TOPICS[etype],
                    "timestamp_ms": t,
                    "order_details": _details(rng, etype, order_id),
                }
            )
            t += rng.randrange(0, 101)

        if missing_probability and rng.random() < missing_probability:
            keep = rng.choice(MISSING_PATTERNS)
            events = [e for e in events if e["type"] in keep]
        elif duplicate_probability and rng.random() < duplicate_probability:
            n_dup_events = rng.choice([1, 2])
            copies = rng.randrange(2, 6)
            dups = [
                dict(e) for e in events[:n_dup_events] for _ in range(copies - 1)
            ]
            events = events + dups

        rng.shuffle(events)  # always-on out-of-order publish
        for e in events:
            e["arrival_seq"] = seq
            seq += 1
        out.extend(events)
    return out


def order_events_df(spark: SparkSession, events: list[dict]) -> DataFrame:
    """Events list -> DataFrame with ISO-8601 string timestamps (wire form)."""
    rows = [
        (
            e["order_id"],
            e["type"],
            e["topic"],
            e["timestamp_ms"],
            e["order_details"],
            e["arrival_seq"],
        )
        for e in events
    ]
    df = spark.createDataFrame(
        rows,
        "order_id string, type string, topic string, timestamp_ms long,"
        " order_details string, arrival_seq long",
    )
    return df.withColumn(
        "timestamp",
        F.date_format(
            F.timestamp_millis(F.col("timestamp_ms")),
            "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
        ),
    ).drop("timestamp_ms")


def generate_order_events_distributed(
    spark: SparkSession,
    n_lifecycles: int,
    missing_probability: float = 0.0,
    seed: int = 42,
    base_ms: int = 1_700_000_000_000,
) -> DataFrame:
    """Scale-path generator: no driver materialization, fully columnar.

    Each lifecycle row fans out to its three events via explode; the
    missing-pattern draw is a deterministic md5 hash of (seed, lifecycle),
    so any executor count yields identical data.
    """
    base = spark.range(n_lifecycles).select(
        F.col("id").alias("lifecycle"),
        F.md5(F.concat(F.lit(f"order:{seed}:"), F.col("id"))).alias("oid_hash"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"miss:{seed}:"), F.col("id"))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 1000
        ).alias("miss_draw"),
    )
    events = base.select(
        "lifecycle",
        F.col("oid_hash").alias("order_id"),
        "miss_draw",
        F.explode(
            F.array(F.lit("created"), F.lit("placed"), F.lit("cancelled"))
        ).alias("type"),
    )
    pattern = (F.col("miss_draw") % 3).cast("int")
    threshold = int(missing_probability * 1000)
    affected = F.col("miss_draw") < F.lit(threshold)
    dropped = affected & (
        ((pattern == 0) & (F.col("type") == "created"))
        | ((pattern == 1) & (F.col("type") == "placed"))
        | ((pattern == 2) & (F.col("type") != "created"))
    )
    gap = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.lit("gap"), "order_id", "type")), 1, 4
            ),
            16,
            10,
        ).cast("long")
        % 101
    )
    type_idx = F.when(F.col("type") == "created", 0).when(
        F.col("type") == "placed", 1
    ).otherwise(2)
    return (
        events.filter(~dropped)
        .select(
            "order_id",
            "type",
            F.element_at(
                F.create_map(
                    *[F.lit(x) for kv in TOPICS.items() for x in kv]
                ),
                F.col("type"),
            ).alias("topic"),
            F.date_format(
                F.timestamp_millis(
                    F.lit(base_ms)
                    + F.col("lifecycle") * 1000
                    + type_idx * gap
                ),
                "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'",
            ).alias("timestamp"),
            F.to_json(
                F.struct(
                    F.col("order_id").alias("src"), F.col("type").alias("t")
                )
            ).alias("order_details"),
        )
    )


def rate_order_event_stream(
    spark: SparkSession, rows_per_second: int = 3
) -> DataFrame:
    """Streaming synthetic generator over the rate source (S8 parity):
    emits canonical-typed order events, one lifecycle per 3 rows.
    """
    rate = spark.readStream.format("rate").option(
        "rowsPerSecond", rows_per_second
    ).load()
    lifecycle = F.floor(F.col("value") / 3)
    type_idx = (F.col("value") % 3).cast("int")
    etype = (
        F.when(type_idx == 0, "created")
        .when(type_idx == 1, "placed")
        .otherwise("cancelled")
    )
    return rate.select(
        F.md5(F.concat(F.lit("rate-order:"), lifecycle)).alias("order_id"),
        etype.alias("type"),
        F.element_at(
            F.create_map(*[F.lit(x) for kv in TOPICS.items() for x in kv]),
            etype,
        ).alias("topic"),
        F.date_format(
            F.col("timestamp"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"
        ).alias("timestamp"),
        F.to_json(F.struct(F.col("value").alias("seq"))).alias("order_details"),
    )
