"""Temporal join operators Spark lacks natively: as-of join and range
(band) join, both expressed in scale-safe shapes.

As-of join — "for each left row, the latest right row at-or-before its
timestamp, per key" — is NOT implemented as an inequality join (which
Spark executes as a broadcast-nested-loop or a full sort-merge with
per-pair filtering). Instead: union the tagged sides and take a running
``last(right_payload, ignorenulls)`` over (key) ordered by (ts, tag,
tiebreak). One shuffle on the key, one sort, zero row multiplication —
the same shape a 1000-executor cluster wants at 100 TB.

Range join — "pairs within [lower, upper) time distance, per key" — uses
interval bucketing: each side maps to floor(ts / bucket) buckets (the
right side also to the neighbor bucket), the join becomes an equi-join on
(key, bucket), and the exact band predicate filters the candidates. The
equi-join shuffles hash-partitioned and AQE-skew-splittable; candidate
count is bounded by bucket co-occupancy, never |L|x|R| per key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tiebreak: str | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """Backward as-of join: left rows joined to the latest right row with
    ``right_ts <= left_ts`` on the same key (inclusive), nulls when none.

    ``tiebreak``: right column ordering equal-timestamp right rows — the
    largest wins (deterministic output; required for oracle checking when
    timestamps can collide).

    Returns all left columns plus ``right_cols`` suffixed with ``suffix``.
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]

    l_tagged = left.withColumn("_tag", F.lit(1)).withColumn(
        "_ats", F.col(left_ts)
    )
    payload = F.struct(*[F.col(c) for c in right_cols])
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("_ats"),
        *( [F.col(tiebreak).alias("_tie")] if tiebreak else [F.lit(0).alias("_tie")] ),
        payload.alias("_rpayload"),
    ).withColumn("_tag", F.lit(0))

    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    # right rows sort before left rows at equal ts (tag 0 < 1): ties are
    # matches; among equal-ts right rows the largest tiebreak lands last
    w = (
        Window.partitionBy(on)
        .orderBy("_ats", "_tag", "_tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "_match", F.last("_rpayload", ignorenulls=True).over(w)
    )
    out_cols = [F.col(c) for c in left.columns] + [
        F.col(f"_match.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.filter(F.col("_tag") == 1).select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    lower_s: float = 0.0,
    upper_s: float = 60.0,
) -> DataFrame:
    """Band join: pairs with ``left_ts + lower_s <= right_ts < left_ts +
    upper_s`` (seconds) on the same key, via interval bucketing.

    Bucket width = the band width; each left row probes the buckets its
    band can touch (two consecutive ones), making the join a pure
    equi-join on (key, bucket) — hash-shuffled, AQE-skew-splittable —
    with the exact band predicate as a post-filter.

    Returns left columns prefixed ``l_`` and right prefixed ``r_``.
    """
    width_us = int((upper_s - lower_s) * 1_000_000)
    lower_us = int(lower_s * 1_000_000)
    upper_us = int(upper_s * 1_000_000)

    l = left.select(
        F.col(on).alias("_lon"),
        F.unix_micros(F.col(left_ts).cast("timestamp")).alias("_lus"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
    )
    # the band [lts+lower, lts+upper) spans at most two width-sized buckets
    l = l.withColumn(
        "_bucket",
        F.explode(
            F.array_distinct(
                F.array(
                    F.floor((F.col("_lus") + lower_us) / width_us),
                    F.floor((F.col("_lus") + upper_us - 1) / width_us),
                )
            )
        ),
    )
    r = right.select(
        F.col(on).alias("_ron"),
        F.unix_micros(F.col(right_ts).cast("timestamp")).alias("_rus"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
    ).withColumn("_bucket", F.floor(F.col("_rus") / width_us))

    # equi-join on (key, bucket) so the shuffle co-partitions both
    joined = l.join(
        r,
        (l["_bucket"] == r["_bucket"]) & (F.col("_lon") == F.col("_ron")),
    ).filter(
        (F.col("_rus") >= F.col("_lus") + lower_us)
        & (F.col("_rus") < F.col("_lus") + upper_us)
    )
    out = [
        F.col(f"_l.{c}").alias(f"l_{c}") for c in left.columns
    ] + [F.col(f"_r.{c}").alias(f"r_{c}") for c in right.columns]
    return joined.select(*out)
