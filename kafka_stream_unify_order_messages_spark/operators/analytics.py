"""Event-sequence analytics: funnels, cohort retention, Markov
transitions, and robust (median/MAD) outlier screens.

The reference is an event-stream unifier (SURVEY.md §2.3); once events
are unified per key, the questions a user asks next are sequence-shaped:
"how far through the lifecycle do users get" (funnel), "do users come
back" (cohort retention), "what follows what" (transition matrix), and
"which readings are anomalous" (robust outliers). These extend the
engine along that axis; every operator is oracle-checked in the
registry (queries_analytics.py).

Scale shapes:

- ``funnel_stages`` — one shuffle on the entity key. Per-key events are
  collected into a sorted array and folded scan-locally with
  ``F.aggregate`` (greedy earliest-completion, which is optimal for
  ordered funnels), so per-task memory is bounded by events-per-key —
  the same bound the reference's per-key state store already assumes —
  and the fold stays in codegen, no Python.
- ``cohort_retention`` — first-touch per key (one shuffle), join back
  on the same key (co-partitioned; AQE reuses the exchange), then a
  tiny (cohort, offset) aggregation.
- ``event_transitions`` — one window shuffle on the key for ``lag``,
  then an aggregation on the (prev, next) pair space, which is
  |types|^2-bounded and map-side combinable.
- ``robust_outliers`` — per-group exact median and MAD are two compact
  aggregations (group cardinality = |event types|); the per-row screen
  is a broadcast join + scan-local filter. At 100 TB the exact
  ``percentile`` per small group-count is fine (each group's values
  stream through a single agg buffer); for huge groups swap in
  ``percentile_approx`` — the operator takes the column expression.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def funnel_stages(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    max_gap_seconds: int | None = None,
) -> DataFrame:
    """Per-key funnel depth: how many of ``steps`` (in order) the key
    completed, taking the earliest valid occurrence of each next step.

    Returns (key, stage, stage_ts) where ``stage`` is the 1-based count
    of completed steps (0 if the first step never occurred, with a null
    ``stage_ts``). Greedy earliest-next-step is optimal: completing a
    step as early as possible can only widen the window for later steps.
    With ``max_gap_seconds`` each next step must also land within that
    many seconds of the previous stage (the "conversion window" form:
    view -> click within a day, click -> purchase within a day).
    Greedy-from-earliest is NOT optimal under a deadline — a later
    step-1 occurrence can rescue an expired chain — so the bounded form
    switches to the reachability DP: the fold tracks, per stage, the
    LATEST time that stage was completed by ANY valid chain (later is
    always weakly better for meeting the next deadline), and the depth
    is the deepest stage ever reached.

    One shuffle (groupBy key). Both folds run over the sorted
    (ts, tiebreak, type) array entirely in codegen via ``F.aggregate``;
    the unbounded state is (stage, ts-of-last-completed-stage), the
    bounded state is one latest-completion timestamp per stage.
    """
    relevant = events.filter(F.col(type_col).isin(steps)).select(
        F.col(key),
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(tiebreak_col).alias("tb"),
            F.col(type_col).alias("et"),
        ).alias("ev"),
    )
    per_key = relevant.groupBy(key).agg(
        F.array_sort(F.collect_list("ev")).alias("evs")
    )
    step_arr = F.array(*[F.lit(s) for s in steps])
    n_steps = len(steps)

    if max_gap_seconds is None:
        fold = F.aggregate(
            "evs",
            F.struct(
                F.lit(0).alias("stage"),
                F.lit(None).cast("timestamp").alias("stage_ts"),
            ),
            lambda acc, ev: F.when(
                (acc["stage"] < n_steps)
                & (ev["et"] == F.element_at(step_arr, acc["stage"] + 1))
                & (acc["stage_ts"].isNull() | (ev["ts"] > acc["stage_ts"])),
                F.struct(
                    (acc["stage"] + 1).alias("stage"),
                    ev["ts"].alias("stage_ts"),
                ),
            ).otherwise(acc),
        )
        return per_key.select(
            key,
            fold.getField("stage").alias("stage"),
            fold.getField("stage_ts").alias("stage_ts"),
        )

    if len(set(steps)) != len(steps):
        raise ValueError("bounded funnel requires distinct step names")

    def advance(acc, ev):
        outs = []
        for i, s in enumerate(steps):
            cond = ev["et"] == F.lit(s)
            if i > 0:
                prev = acc[f"s{i - 1}"]
                # NTZ has no direct long cast; go through LTZ (session
                # tz = UTC) seconds, as in sessionize
                ev_s = ev["ts"].cast("timestamp").cast("long")
                prev_s = prev.cast("timestamp").cast("long")
                cond = (
                    cond
                    & prev.isNotNull()
                    & (ev["ts"] > prev)
                    & (ev_s <= prev_s + max_gap_seconds)
                )
            outs.append(
                F.when(cond, ev["ts"]).otherwise(acc[f"s{i}"]).alias(f"s{i}")
            )
        return F.struct(*outs)

    fold = F.aggregate(
        "evs",
        F.struct(
            *[
                F.lit(None).cast("timestamp").alias(f"s{i}")
                for i in range(n_steps)
            ]
        ),
        advance,
    )
    bound = per_key.select(key, fold.alias("_f"))
    # s_i set implies s_{i-1} set, so depth = count of set stages and
    # stage_ts = the deepest stage's latest completion time
    stage = sum(
        F.col(f"_f.s{i}").isNotNull().cast("int") for i in range(n_steps)
    )
    stage_ts = F.coalesce(
        *[F.col(f"_f.s{i}") for i in reversed(range(n_steps))],
        F.lit(None).cast("timestamp"),
    )
    return bound.select(
        key, stage.alias("stage"), stage_ts.alias("stage_ts")
    )


def funnel_report(
    events: DataFrame,
    steps: list[str],
    key: str = "user_id",
    **kwargs,
) -> DataFrame:
    """Classic funnel rollup: one row per step with the number of keys
    that reached at least that stage and the conversion rate from step
    1. Built as ONE conditional aggregation over the per-key stage
    frame (map-side combinable, |steps| counters per task) unpivoted
    with ``stack`` — no window, no join, nothing driver-side."""
    stages = funnel_stages(events, steps, key=key, **kwargs)
    wide = stages.agg(
        *[
            F.sum((F.col("stage") >= i + 1).cast("long")).alias(f"_s{i + 1}")
            for i in range(len(steps))
        ]
    )
    stack_args = ", ".join(
        f"{i + 1}, '{s}', _s{i + 1}" for i, s in enumerate(steps)
    )
    return wide.select(
        F.expr(
            f"stack({len(steps)}, {stack_args}) AS (step, step_name, users)"
        ),
        F.col("_s1").alias("_first"),
    ).select(
        "step",
        "step_name",
        "users",
        F.round(F.col("users") / F.col("_first"), 4).alias("conv_rate"),
    )


def cohort_retention(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    max_offset: int | None = None,
) -> DataFrame:
    """Weekly cohort retention: cohort = Monday-truncated week of the
    key's first event; one output row per (cohort_week, week_offset)
    with the count of distinct keys active in that week.

    Two shuffles on the key (first-touch agg + join back; co-partitioned
    so AQE reuses the exchange) and a final tiny aggregation over the
    (cohort, offset) grid.
    """
    week = F.date_trunc("week", F.col(ts_col))
    firsts = events.groupBy(key).agg(
        F.date_trunc("week", F.min(ts_col)).alias("cohort_week")
    )
    activity = events.select(key, week.alias("active_week")).distinct()
    joined = activity.join(firsts, key)
    offset = (
        F.datediff(F.col("active_week"), F.col("cohort_week")) / 7
    ).cast("long")
    out = (
        joined.select("cohort_week", offset.alias("week_offset"), key)
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )
    if max_offset is not None:
        out = out.filter(F.col("week_offset") <= max_offset)
    return out


def event_transitions(
    events: DataFrame,
    key: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition matrix over per-key event
    sequences: (prev_type, next_type, n, p) with p = n / sum(n) over
    each prev_type row. One window shuffle on the key; the pair space
    is |types|^2 so the final agg and the per-prev normalization window
    are negligible at any scale.
    """
    w = Window.partitionBy(key).orderBy(ts_col, tiebreak_col)
    pairs = events.select(
        F.lag(type_col).over(w).alias("prev_type"),
        F.col(type_col).alias("next_type"),
    ).filter(F.col("prev_type").isNotNull())
    counts = pairs.groupBy("prev_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    wp = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(wp), 4).alias("p"),
    )


def robust_outliers(
    df: DataFrame,
    value_col: str = "value",
    group_col: str = "event_type",
    id_cols: tuple[str, ...] = ("event_id",),
    k: float = 3.0,
    scale: float = 1.4826,
) -> DataFrame:
    """Median/MAD outlier screen per group: flag rows whose robust
    z-score |v - median| / (scale * MAD) exceeds ``k``.

    The median/MAD model is two compact aggregations over |groups|
    rows (exact ``percentile``; swap ``percentile_approx`` for huge
    groups) broadcast back onto the scan — the per-row screen is then
    a scan-local filter, no second data shuffle.
    """
    med = df.groupBy(group_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    dev = (
        df.join(F.broadcast(med), group_col)
        .groupBy(group_col)
        .agg(
            F.expr(f"percentile(abs({value_col} - med), 0.5)").alias("mad"),
            F.first("med").alias("med"),
        )
    )
    z = F.abs(F.col(value_col) - F.col("med")) / (scale * F.col("mad"))
    return (
        df.join(F.broadcast(dev), group_col)
        .select(
            *id_cols,
            group_col,
            value_col,
            F.round(z, 4).alias("robust_z"),
        )
        .filter(F.col("robust_z") > k)
    )


def rolling_active_users(
    events: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    windows: tuple[int, ...] = (1, 7, 30),
) -> DataFrame:
    """DAU/WAU/MAU-style rolling distinct actives: for every calendar
    day, the distinct keys active in the trailing 1/7/30 days.

    Distinct-over-sliding-window has no direct window-function form;
    the standard scalable shape is used instead: activity collapses to
    distinct (day, key) pairs first (one shuffle, days x keys bounded),
    the tiny day dimension broadcasts onto it with the widest trailing
    range, and every window is then a CONDITIONAL distinct count in one
    aggregation — one range join, not one per window.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    names = {1: "dau", 7: "wau", 30: "mau"}
    widest = max(windows)
    day = F.date_trunc("day", F.col(ts_col))
    activity = events.select(day.alias("aday"), F.col(key)).distinct()

    # ONE key-partitioned sort serves every window: under window w a key
    # covers days [aday, aday + w); consecutive activities less than w
    # days apart merge into one island, so the per-key coverage is a set
    # of disjoint [start, end) intervals — island breaks are just gap
    # tests against the one shared lag
    w_key = Window.partitionBy(key).orderBy("aday")
    lagged = activity.withColumn("_prev", F.lag("aday").over(w_key))
    island_cols = []
    for w in windows:
        brk = F.when(
            F.col("_prev").isNull()
            | (
                F.col("aday")
                >= F.col("_prev") + F.expr(f"INTERVAL {w} DAYS")
            ),
            1,
        ).otherwise(0)
        island_cols.append(
            F.sum(brk)
            .over(w_key.rowsBetween(Window.unboundedPreceding, 0))
            .alias(f"_isl_{w}")
        )
    islands = lagged.select(
        key, "aday", *island_cols
    ).persist(StorageLevel.MEMORY_AND_DISK)

    # per window: islands -> +1/-1 day deltas -> running coverage.
    # the delta frame collapses to O(distinct days) rows, so its ordered
    # prefix-sum window sorts ~|days| rows, never activity
    per_window = []
    for w in windows:
        spans = islands.groupBy(key, f"_isl_{w}").agg(
            F.min("aday").alias("_start"),
            (
                F.max("aday") + F.expr(f"INTERVAL {w} DAYS")
            ).alias("_end"),
        )
        deltas = spans.select(
            F.col("_start").alias("day"), F.lit(1).alias("_d")
        ).unionByName(
            spans.select(
                F.col("_end").alias("day"), F.lit(-1).alias("_d")
            )
        )
        col = names.get(w, f"active_{w}d")
        per_window.append(
            deltas.groupBy("day")
            .agg(F.sum("_d").alias("_delta"))
            .withColumn(
                col,
                F.sum("_delta").over(
                    Window.orderBy("day").rowsBetween(
                        Window.unboundedPreceding, 0
                    )
                ),
            )
            .select("day", col)
        )

    # stitch the tiny per-day frames: seed with every activity day (a
    # day between two deltas carries constant coverage and must still be
    # reported), outer-join each window's delta days, then back-fill the
    # running value per column over the merged day set
    day_dim = activity.select(F.col("aday").alias("day")).distinct()
    merged = day_dim
    for pw in per_window:
        merged = merged.join(pw, "day", "outer")
    fill = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    filled = merged.select(
        "day",
        *[
            F.coalesce(
                F.last(names.get(w, f"active_{w}d"), ignorenulls=True).over(
                    fill
                ),
                F.lit(0),
            )
            .cast("long")
            .alias(names.get(w, f"active_{w}d"))
            for w in windows
        ],
    )
    # the reported day set: days with at least one activity in the
    # trailing widest window == days whose widest coverage is positive,
    # restricted to days that actually occur as activity days
    return filled.join(day_dim, "day").filter(
        F.col(names.get(widest, f"active_{widest}d")) > 0
    )
