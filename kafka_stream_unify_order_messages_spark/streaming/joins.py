"""Stream-stream joins and streaming deduplication — capabilities the
reference lacks (SURVEY.md §2.6: no joins anywhere) that fall out of the
Spark-first design, wrapped with the watermark discipline that bounds
state at 100 TB.

Stream-stream joins REQUIRE both watermarks and an event-time range
condition: that is what lets Spark expire join state (otherwise both
sides buffer forever). State per side is O(rows within the range window),
not O(stream length).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "timestamp",
    right_ts: str = "timestamp",
    watermark_delay: str = "10 seconds",
    max_lag: str = "60 seconds",
    how: str = "inner",
    left_prefix: str = "l_",
    right_prefix: str = "r_",
) -> DataFrame:
    """Event-time-bounded stream-stream join on ``on``: right rows within
    ``[left_ts, left_ts + max_lag]``. Both sides are watermarked so join
    state expires.
    """
    l = left.withColumn("_lts", F.to_timestamp(left_ts)).withWatermark(
        "_lts", watermark_delay
    )
    r = right.withColumn("_rts", F.to_timestamp(right_ts)).withWatermark(
        "_rts", watermark_delay
    )
    l = l.select(
        F.col(on).alias("_lon"),
        "_lts",
        *[F.col(c).alias(f"{left_prefix}{c}") for c in left.columns],
    )
    r = r.select(
        F.col(on).alias("_ron"),
        "_rts",
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns],
    )
    cond = (
        (F.col("_lon") == F.col("_ron"))
        & (F.col("_rts") >= F.col("_lts"))
        & (F.col("_rts") <= F.col("_lts") + F.expr(f"INTERVAL {max_lag}"))
    )
    return l.join(r, cond, how).drop("_lon", "_ron", "_lts", "_rts")


def dedup_within_watermark(
    df: DataFrame,
    keys: list[str],
    ts_col: str = "timestamp",
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming exact deduplication on ``keys`` with bounded state:
    duplicates arriving within the watermark delay are dropped; state for
    a key is freed once the watermark passes. The streaming counterpart
    of batch ``dedup_exact`` — at 100 TB the delay bound is what keeps
    the dedup state from growing with the stream.
    """
    with_ts = df.withColumn("_event_time", F.to_timestamp(ts_col))
    watermarked = with_ts.withWatermark("_event_time", watermark_delay)
    return watermarked.dropDuplicatesWithinWatermark(keys).drop("_event_time")
