"""Event-time windowed streaming aggregations with watermark-managed
state — the capability family the reference lacks entirely (SURVEY.md
§2.6: no TimeWindows/SessionWindows anywhere) but any general engine
needs: tumbling/sliding counts and session windows over late-arriving
data.

State per window is the aggregate only (Spark drops it once the watermark
passes window end + delay); late rows inside the delay merge into their
window, later ones are discarded — standard Structured Streaming
semantics, appropriate for the 100 TB design point because state size is
O(active windows), not O(events).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def tumbling_counts(
    events: DataFrame,
    ts_col: str = "timestamp",
    key_col: str | None = "type",
    window: str = "10 seconds",
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """Append-mode tumbling-window counts per key: (window_start,
    window_end, key?, n). Works on batch DataFrames too (same code path,
    no watermark needed there — pass it anyway for streaming).
    """
    with_ts = events.withColumn("_event_time", F.to_timestamp(ts_col))
    if events.isStreaming:
        with_ts = with_ts.withWatermark("_event_time", watermark_delay)
    group_cols = [F.window("_event_time", window)]
    if key_col:
        group_cols.append(F.col(key_col))
    out = with_ts.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    cols = [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n")


def sliding_counts(
    events: DataFrame,
    ts_col: str = "timestamp",
    key_col: str | None = "type",
    window: str = "10 seconds",
    slide: str = "5 seconds",
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """Sliding-window counts per key: each event contributes to
    window/slide overlapping windows — (window_start, window_end, key?,
    n). State is O(active windows × keys); the watermark bounds how many
    slides stay active, so overlap factor is the state/shuffle
    multiplier to budget for (each input row expands into
    window÷slide window assignments before the aggregation).
    """
    with_ts = events.withColumn("_event_time", F.to_timestamp(ts_col))
    if events.isStreaming:
        with_ts = with_ts.withWatermark("_event_time", watermark_delay)
    group_cols = [F.window("_event_time", window, slide)]
    if key_col:
        group_cols.append(F.col(key_col))
    out = with_ts.groupBy(*group_cols).agg(F.count(F.lit(1)).alias("n"))
    cols = [
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
    ]
    if key_col:
        cols.append(F.col(key_col))
    return out.select(*cols, "n")


def session_windows(
    events: DataFrame,
    ts_col: str = "timestamp",
    key_col: str = "order_id",
    gap: str = "30 seconds",
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """Session-window aggregation (gap-based): one row per (key, session)
    with the session bounds and event count. The dynamic-gap session is
    what the reference's hand-rolled 5 s buffer approximates; here it is
    the built-in ``session_window`` — state managed by the watermark.
    """
    with_ts = events.withColumn("_event_time", F.to_timestamp(ts_col))
    if events.isStreaming:
        with_ts = with_ts.withWatermark("_event_time", watermark_delay)
    out = with_ts.groupBy(
        F.session_window("_event_time", gap), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("n_events"))
    return out.select(
        F.col(key_col),
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
    )


def rank_topk(
    counts: DataFrame, k: int = 3, by: str = "n"
) -> DataFrame:
    """Per-window top-k over a (window_start, window_end, key, n) count
    frame — ties break on the key so the cut is deterministic. A literal
    rank filter over row_number becomes a WindowGroupLimit (map-side
    prune), so a window with a million keys ships k rows per partition.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("window_start").orderBy(
        F.desc(by), *[c for c in counts.columns
                      if c not in ("window_start", "window_end", by)]
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )


def trending_topk(
    events: DataFrame,
    ts_col: str = "timestamp",
    key_col: str = "type",
    window: str = "10 seconds",
    k: int = 3,
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """Trending keys: top-``k`` keys per tumbling window by event count.

    Batch: windowed counts + per-window rank in one plan. Streaming:
    ranking inside an append-mode stream would re-rank on every update,
    so compose ``tumbling_counts`` (watermark-managed state) with
    ``rank_topk`` applied in a ``foreachBatch`` sink — the standard
    "aggregate in the stream, rank at the edge" split; see
    tests/test_windowed_stream.py for the wiring.
    """
    counts = tumbling_counts(
        events, ts_col, key_col, window, watermark_delay
    )
    if events.isStreaming:
        return counts
    return rank_topk(counts, k=k)


def windowed_value_histogram(
    events: DataFrame,
    ts_col: str = "timestamp",
    value_col: str = "value",
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = 16,
    window: str = "10 seconds",
    watermark_delay: str = "5 seconds",
) -> DataFrame:
    """Per-tumbling-window equi-width value histogram: (window_start,
    window_end, bin, cnt) — the STREAMING leg of the mergeable histogram
    quantile sketch (operators/sketches.py:histogram_sketch). Bounds are
    FIXED parameters rather than data-derived (a stream cannot take a
    global min/max pass); values outside [lo, hi] clamp into the edge
    bins, preserving counts so downstream quantile reads stay
    rank-correct at the ends.

    Because the sketch is additive, each emitted window row-set merges
    with any other sketch over the same binning (merge_histogram_sketches
    after renaming lo/hi literals in) — e.g. roll 10 s windows into
    minutes, or union the stream's sketch with the batch corpus's.
    State per window is n_bins counters, watermark-dropped; append mode.
    """
    v = F.col(value_col).cast("double")
    bin_ = F.least(
        F.greatest(
            F.floor((v - F.lit(lo)) / F.lit(hi - lo) * n_bins).cast("long"),
            F.lit(0).cast("long"),
        ),
        F.lit(n_bins - 1).cast("long"),
    )
    with_ts = events.withColumn("_event_time", F.to_timestamp(ts_col))
    if events.isStreaming:
        with_ts = with_ts.withWatermark("_event_time", watermark_delay)
    out = with_ts.groupBy(
        F.window("_event_time", window), bin_.alias("bin")
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return out.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "bin",
        "cnt",
    )
