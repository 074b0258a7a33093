"""Idempotent foreachBatch sink: exactly-once-by-key delivery on top of
Spark's at-least-once replay.

After a crash between sink write and checkpoint commit, Structured
Streaming REPLAYS the last micro-batch (at-least-once). The reference
has the same exposure (no processing.guarantee — SURVEY.md §4.2) and
simply documents it; here the batch id makes the replay harmless: each
micro-batch writes to a ``batch_id=N`` directory with dynamic partition
overwrite, so a replayed batch overwrites its own previous (possibly
partial) output instead of duplicating it. Readers see one projection
per (batch_id, key).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def idempotent_parquet_sink(path: str, key_col: str = "order_id"):
    """Returns a foreachBatch function writing batch-partitioned parquet
    idempotently (replay-safe). Use:

        q = (df.writeStream.foreachBatch(idempotent_parquet_sink(path))
               .option("checkpointLocation", ckpt).start())
    """

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            (
                batch_df.withColumn("batch_id", F.lit(batch_id))
                # one output file per batch partition: tiny-file hygiene
                .repartition(1)
                .write.mode("overwrite")
                .partitionBy("batch_id")
                .parquet(path)
            )
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)

    return write_batch
