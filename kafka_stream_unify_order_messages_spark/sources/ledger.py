"""Incremental-ingestion ledger: the "which files has this pipeline
already processed" bookmark (what Auto Loader / Hive streaming sources
keep internally), as an explicit, queryable parquet table.

A batch pipeline that lands files continuously needs exactly-once
per-file processing without reprocessing the whole directory each run:
list the directory (names + sizes + mtimes — metadata only), anti-join
against the ledger, process the survivors, append them to the ledger.
The ledger is tiny (one row per file ever seen) and the anti-join
broadcasts it; the data files themselves are only ever read once.

Re-landed files (same name, new size/mtime) surface again as
``changed`` so upstream re-writes are reprocessed, not silently
skipped — set ``reprocess_changed=False`` for landing zones with
immutable files.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

_LEDGER_SCHEMA = "file_name string, size_bytes long, mtime_us long"


def _listing(spark: SparkSession, path: str) -> DataFrame:
    rows = []
    for name in sorted(os.listdir(path)):
        full = os.path.join(path, name)
        if os.path.isfile(full) and not name.startswith(("_", ".")):
            st = os.stat(full)
            rows.append((name, st.st_size, int(st.st_mtime * 1_000_000)))
    return spark.createDataFrame(rows, _LEDGER_SCHEMA)


def _read_ledger(spark: SparkSession, ledger_path: str) -> DataFrame:
    if os.path.exists(ledger_path):
        return spark.read.parquet(ledger_path)
    return spark.createDataFrame([], _LEDGER_SCHEMA)


def unprocessed_files(
    spark: SparkSession,
    path: str,
    ledger_path: str,
    reprocess_changed: bool = True,
) -> DataFrame:
    """(file_name, size_bytes, mtime_us, status): the work list for this
    run — files never seen (``new``) and, when ``reprocess_changed``,
    files whose size or mtime moved since they were recorded
    (``changed``). Listing and ledger are metadata-sized; the anti/left
    join broadcasts the ledger."""
    listing = _listing(spark, path)
    ledger = _read_ledger(spark, ledger_path).select(
        "file_name",
        F.col("size_bytes").alias("_led_size"),
        F.col("mtime_us").alias("_led_mtime"),
    )
    joined = listing.join(F.broadcast(ledger), "file_name", "left")
    status = F.when(F.col("_led_size").isNull(), F.lit("new")).when(
        (F.col("size_bytes") != F.col("_led_size"))
        | (F.col("mtime_us") != F.col("_led_mtime")),
        F.lit("changed"),
    )
    out = joined.withColumn("status", status).filter(
        F.col("status").isNotNull()
    )
    if not reprocess_changed:
        out = out.filter(F.col("status") == "new")
    return out.select("file_name", "size_bytes", "mtime_us", "status")


def commit_processed(
    spark: SparkSession, processed: DataFrame, ledger_path: str
) -> None:
    """Record ``processed`` (file_name, size_bytes, mtime_us) rows,
    replacing any prior entry for the same file name (so a reprocessed
    ``changed`` file updates its bookmark instead of duplicating it).
    Rewrite-on-commit is fine: the ledger is one row per file ever
    landed — metadata-scale by construction."""
    new_rows = processed.select("file_name", "size_bytes", "mtime_us")
    old = _read_ledger(spark, ledger_path).join(
        new_rows.select("file_name"), "file_name", "left_anti"
    )
    merged = old.unionByName(new_rows).coalesce(1)
    tmp = ledger_path + "._tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(ledger_path)
    import shutil

    shutil.rmtree(tmp, ignore_errors=True)
