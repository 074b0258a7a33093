"""Token-budget shard packing for training-data assembly.

Assigning documents to fixed-token shards needs a GLOBAL running sum in a
deterministic document order — naively a ``Window.orderBy(id)`` over the
whole table, which Spark executes as a single-partition sort: the one
shape guaranteed to die at 100 TB.

Scalable form (identical output): bucket ids by a monotone function of
the order key, cumsum WITHIN buckets with a partitioned window (parallel),
compute per-bucket totals (one tiny aggregate), prefix-sum those totals
driver-side (#buckets rows, not #docs), and broadcast the bucket offsets
back. Global position = bucket offset + within-bucket running sum.
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

    # tiny: one row per bucket -> driver prefix-sum -> broadcast map
    totals = (
        sized.groupBy("_bucket")
        .agg(F.sum(size_col).alias("_total"))
        .collect()
    )
    offsets: dict[int, int] = {}
    acc = 0
    for row in sorted(totals, key=lambda r: r["_bucket"]):
        offsets[row["_bucket"]] = acc
        acc += row["_total"]
    offset_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )

    start = (
        F.element_at(offset_map, F.col("_bucket"))
        + F.col("_local_end")
        - F.col(size_col)
    )
    return with_local.select(
        id_col,
        size_col,
        F.floor(start / shard_budget).cast("long").alias("shard"),
    )
