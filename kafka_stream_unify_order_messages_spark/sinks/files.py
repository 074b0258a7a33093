"""File sinks: partitioned, sorted, compressed parquet — batch and
streaming — with the layout hygiene a 100 TB table needs.

Partition columns give coarse pruning (directory-level); sort-within-
partitions gives fine pruning (parquet row-group min/max stats become
selective) and better compression. ``target_file_rows`` controls output
file sizing via repartitioning on the partition key, avoiding the
many-small-files failure mode of naive writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def write_partitioned_parquet(
    df: DataFrame,
    path: str,
    partition_cols: list[str] | None = None,
    sort_cols: list[str] | None = None,
    range_cols: list[str] | None = None,
    target_file_rows: int | None = None,
    compression: str = "zstd",
    mode: str = "overwrite",
) -> None:
    """Batch parquet write with partitioning + in-file clustering.

    ``range_cols`` range-repartitions before writing, giving a GLOBAL
    sort layout across files (file k's key range ends before file
    k+1's begins) — the layout that makes parquet row-group min/max
    stats non-overlapping across the whole table, so a point or range
    predicate prunes to O(1) files instead of one row-group per file.
    ``partition_cols`` (directory pruning) and ``range_cols`` (in-
    directory file pruning) compose; ``sort_cols`` defaults to
    ``range_cols`` so rows inside each file are clustered too.

    ``target_file_rows`` bounds output file size via Spark's
    maxRecordsPerFile (a task exceeding it rolls to a new file), the
    guard against both giant files (task-retry cost, reader
    parallelism) and the many-small-files failure mode.
    """
    out = df
    if range_cols:
        out = out.repartitionByRange(*[F.col(c) for c in range_cols])
        if sort_cols is None:
            sort_cols = range_cols
    elif partition_cols:
        # co-locate each partition's rows so every task writes one file
        # per directory instead of #tasks files per directory
        out = out.repartition(*[F.col(c) for c in partition_cols])
    if sort_cols:
        out = out.sortWithinPartitions(*sort_cols)
    writer = out.write.mode(mode).option("compression", compression)
    if target_file_rows is not None:
        writer = writer.option("maxRecordsPerFile", target_file_rows)
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def parquet_stream_writer(
    df: DataFrame,
    path: str,
    checkpoint_location: str,
    partition_cols: list[str] | None = None,
    trigger_interval: str | None = None,
    compression: str = "zstd",
):
    """Configured (unstarted) streaming parquet sink — exactly-once via
    the checkpoint + file-sink manifest (vs the Kafka sink's
    at-least-once)."""
    writer = (
        df.writeStream.format("parquet")
        .outputMode("append")
        .option("path", path)
        .option("checkpointLocation", checkpoint_location)
        .option("compression", compression)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    if trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer
