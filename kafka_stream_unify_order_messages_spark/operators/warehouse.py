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
