"""Skew-resilient aggregation: two-phase salted groupBy.

When one key holds a disproportionate share of rows (the classic hot-user
/ hot-document problem at 100 TB), a plain ``groupBy(key)`` sends that
key's entire volume to one reducer. Salting splits each key into
``n_salts`` subgroups for the first (heavy) aggregation, then merges the
per-salt partials with a second, tiny aggregation — both phases get
map-side combine, and the hot key's work spreads over ``n_salts`` tasks.

Use for algebraic aggregates (sum/count/min/max + anything expressible as
merge of partials). AQE's skew-join handling covers JOIN skew; this
covers AGGREGATION skew, which AQE does not rebalance (Spark's partial
aggregation usually suffices — salting is for the cases where the
per-partition distinct-key count makes hash maps spill).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column -> (input column, fn) with fn in
    {sum, count, min, max}. Example::

        salted_agg(events, ["user_id"], {"n": ("event_id", "count"),
                                         "total": ("value", "sum")})
    """
    first_phase = {
        "sum": F.sum,
        "count": F.count,
        "min": F.min,
        "max": F.max,
    }
    merge_phase = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for out, (col, fn) in aggs.items():
        if fn not in first_phase:
            raise ValueError(f"unsupported salted aggregate: {fn}")

    salted = df.withColumn(
        "_salt", (F.crc32(F.concat_ws("§", *keys)) + F.spark_partition_id()) % n_salts
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[
            first_phase[fn](col).alias(f"_p_{out}")
            for out, (col, fn) in aggs.items()
        ]
    )
    return partial.groupBy(*keys).agg(
        *[
            merge_phase[fn](f"_p_{out}").alias(out)
            for out, (col, fn) in aggs.items()
        ]
    )


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_k: int = 10,
) -> DataFrame:
    """Hot-key diagnostic — the report you run BEFORE choosing a salt
    factor or enabling a skew hint: top-``top_k`` keys by row count with
    each key's corpus share and the salt factor that would level it to
    the average key's volume.

    All published numbers are integer arithmetic (ppm share via floor
    division, salt via ceiling division ``(n * n_keys + total - 1) //
    total``), so the report is bit-stable across engines and retries.

    Scale: per-key counts are ONE map-side-combinable aggregation; the
    top-k is TakeOrderedAndProject (each partition ships k candidate
    rows, no global sort); totals are a one-row broadcast.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    counts = df.select(key.alias("key")).groupBy("key").agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    tot = counts.agg(
        F.sum("n_rows").cast("long").alias("_total"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
    )
    top = counts.orderBy(F.desc("n_rows"), "key").limit(top_k)
    return top.crossJoin(F.broadcast(tot)).select(
        "key",
        "n_rows",
        "n_keys",
        F.expr("(n_rows * 1000000) div _total").cast("long").alias(
            "share_ppm"
        ),
        F.expr("(n_rows * n_keys + _total - 1) div _total")
        .cast("long")
        .alias("salt_factor"),
    )
