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
