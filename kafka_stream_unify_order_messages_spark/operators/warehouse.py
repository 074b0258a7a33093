"""Warehouse-modeling operators: SCD type-2 interval construction and
Delta-style MERGE (upsert/delete) — the change-data shapes a lakehouse
pipeline runs next to snapshot_diff (operators/curation.py).

Scale shape: SCD2 is the gaps-and-islands pattern — two windows over the
same (key, time) partitioning (Catalyst plans ONE exchange: the island
rollup and the lead() reuse the key partitioning); MERGE is one anti
join on keys plus a union, nothing row-by-row.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str = "ts",
    tiebreak_col: str | None = None,
) -> DataFrame:
    """(key, version, attr, valid_from, valid_to, n_events): collapse the
    per-key attribute history into type-2 validity intervals. Consecutive
    equal values merge into one island; valid_to is the next island's
    valid_from (NULL for the current value — the open interval).

    Deterministic: ordering ties break on ``tiebreak_col``; the island
    value is min(attr) (constant within an island by construction).
    """
    order = [F.col(ts_col)] + (
        [F.col(tiebreak_col)] if tiebreak_col else []
    )
    w = Window.partitionBy(key_col).orderBy(*order)
    prev = F.lag(attr_col).over(w)
    changed = F.when(
        prev.isNull() | (prev != F.col(attr_col)), F.lit(1)
    ).otherwise(F.lit(0))
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    islands = df.select(
        key_col,
        attr_col,
        ts_col,
        F.sum(changed).over(wsum).alias("version"),
    ).groupBy(key_col, "version").agg(
        F.min(attr_col).alias(attr_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy(key_col).orderBy("version")
    return islands.select(
        key_col,
        "version",
        attr_col,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


def merge_upsert(
    target: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    op_col: str = "op",
) -> DataFrame:
    """Delta-style MERGE: apply a change set with an I/U/D op column to a
    snapshot. Upserts replace matched rows and add unmatched ones;
    deletes drop matched rows. Exactly one shuffle pair: the key anti
    join (every touched key leaves the target) and the union of the
    surviving rows with the upsert payloads.

    ``changes`` must carry the full payload for I/U rows and may carry
    anything for D rows (only keys are read).
    """
    touched = changes.select(*key_cols).distinct()
    survived = target.join(touched, key_cols, "left_anti")
    upserts = changes.filter(F.col(op_col) != "D").drop(op_col)
    return survived.unionByName(upserts)


def apply_changes(
    log: DataFrame,
    key_cols: list[str],
    seq_cols: list[str],
    op_col: str = "op",
    delete_value: str = "delete",
) -> DataFrame:
    """Collapse an ordered change LOG (CDC feed) to final table state:
    per key, the highest-sequence row wins; if that winner is a delete,
    the key vanishes. The multi-row generalization of ``merge_upsert``
    (which applies one pre-deduplicated change SET) — this is what a
    lakehouse runs on a raw Debezium/CDF stream where a key may appear
    many times per batch.

    One shuffle on the key. The per-key latest-row pick compiles to a
    row_number window, and Spark's WindowGroupLimit prunes each map-side
    partition to ONE candidate row per key before the exchange — the log
    volume never crosses the wire, only frontier rows do.
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.desc(c) for c in seq_cols]
    )
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(F.col(op_col) != delete_value)
        .drop("_rn", op_col)
    )


def compaction_plan(
    files: DataFrame,
    part_col: str = "part_key",
    file_col: str = "file_id",
    size_col: str = "size_bytes",
    target_bytes: int = 128 * 1024 * 1024,
) -> DataFrame:
    """Small-file compaction planner (the Delta/Iceberg OPTIMIZE bin-pack
    step): within each table partition, assign files to merge groups of
    ~``target_bytes`` by running-cumsum bucketing in deterministic
    ``file_col`` order — group = exclusive-prefix-sum // target, so every
    group except the last holds at least ``target_bytes`` once its last
    member is added, and assignment is stable across reruns.

    Returns one row per planned output file:
    (part, compact_group, n_files, group_bytes).

    Scale: ONE exchange on the partition key; the per-partition window is
    a sort of that partition's file COUNT (metadata rows, not data—a
    million files is a million tiny rows), and the rollup reuses the same
    partitioning. The data files themselves never move through this plan;
    it emits the work list a rewrite job executes.
    """
    from pyspark.sql import Window

    w = (
        Window.partitionBy(part_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    # integer floor-division: long `/` would detour through a double and
    # lose exactness past 2^53 total bytes — real at the 100 TB design point
    grouped = files.withColumn("_before", before).withColumn(
        "compact_group",
        F.expr(f"_before div {target_bytes}").cast("long"),
    )
    return (
        grouped.groupBy(part_col, "compact_group")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_files"),
            F.sum(size_col).cast("long").alias("group_bytes"),
        )
    )


def apply_compaction(
    spark,
    path: str,
    out_path: str,
    target_bytes: int = 128 * 1024 * 1024,
    compression: str = "zstd",
) -> tuple[int, int]:
    """Execute ``compaction_plan`` against a real (flat) parquet
    directory: list file metadata driver-side (names + sizes — O(files),
    no data), plan merge groups, then rewrite the data with one range
    exchange on the group id so each planned group lands in its own
    task → its own output file. Returns (n_files_before, n_groups).

    The rewrite goes to ``out_path`` rather than in place: swapping the
    directory after a successful write is the caller's transaction
    boundary (the same reason Delta/Iceberg commit a new snapshot
    instead of mutating files a reader may hold open).

    Scale shape: only the data REWRITE is data-sized, and it is exactly
    one exchange; planning moves metadata rows. Partitioned (nested)
    directories should be compacted per partition directory — this
    executor refuses them rather than silently flattening the layout.
    """
    import os

    entries = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if os.path.isdir(full):
            raise ValueError(
                f"{path} is partitioned; compact each partition dir"
            )
        if name.endswith(".parquet"):
            entries.append(("", name, os.path.getsize(full)))
    files = spark.createDataFrame(
        entries, ["part_key", "file_id", "size_bytes"]
    )
    groups = files.withColumn(
        "compact_group",
        F.expr(
            f"coalesce(sum(size_bytes) over "
            f"(partition by part_key order by file_id "
            f"rows between unbounded preceding and 1 preceding), 0) "
            f"div {target_bytes}"
        ).cast("long"),
    ).select("file_id", "compact_group")
    n_groups = groups.select("compact_group").distinct().count()

    tagged = spark.read.parquet(path).withColumn(
        "_file",
        F.element_at(F.split(F.input_file_name(), "/"), -1),
    )
    (
        tagged.join(
            F.broadcast(groups.withColumnRenamed("file_id", "_file")),
            "_file",
        )
        .repartitionByRange(max(n_groups, 1), "compact_group")
        .drop("_file", "compact_group")
        .write.mode("overwrite")
        .option("compression", compression)
        .parquet(out_path)
    )
    return len(entries), n_groups
