"""Token-budget shard packing for training-data assembly.

Assigning documents to fixed-token shards needs a GLOBAL running sum in a
deterministic document order — naively a ``Window.orderBy(id)`` over the
whole table, which Spark executes as a single-partition sort: the one
shape guaranteed to die at 100 TB.

Scalable form (identical output): bucket ids by a monotone function of
the order key, cumsum WITHIN buckets with a partitioned window (parallel),
compute per-bucket totals (one tiny aggregate: #buckets rows, not #docs),
prefix-sum the totals with a window over that tiny frame, and broadcast-
join the bucket offsets back. Global position = bucket offset +
within-bucket running sum. Nothing is collected to the driver and the
plan size is independent of #buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def pack_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    shard_budget: int = 5000,
    bucket_width: int = 1000,
) -> DataFrame:
    """(id, size, shard): shard = floor(running-start / budget) in id
    order. ``id_col`` must be numeric and ordering-dense-ish; bucket_width
    controls parallelism (ids per window partition).
    """
    bucket = (F.col(id_col) / bucket_width).cast("long")
    sized = df.select(
        F.col(id_col), F.col(size_col), bucket.alias("_bucket")
    )

    # parallel within-bucket running sums
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_local = sized.withColumn("_local_end", F.sum(size_col).over(w))

    # tiny per-bucket frame: exclusive prefix-sum of totals in bucket
    # order. The single-partition orderBy window is fine HERE — it sorts
    # #buckets rows (data-size / bucket_width), never #docs.
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        sized.groupBy("_bucket")
        .agg(F.sum(size_col).alias("_total"))
        .withColumn(
            "_offset", F.coalesce(F.sum("_total").over(w_off), F.lit(0))
        )
        .select("_bucket", "_offset")
    )

    start = F.col("_offset") + F.col("_local_end") - F.col(size_col)
    return with_local.join(F.broadcast(offsets), "_bucket").select(
        id_col,
        size_col,
        F.floor(start / shard_budget).cast("long").alias("shard"),
    )
