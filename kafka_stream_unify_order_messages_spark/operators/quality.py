"""Data-quality surface: declarative expectation checking (deequ/dbt
style) and one-pass column profiling.

A 100 TB pipeline gates every ingest batch on cheap table-level
invariants before expensive downstream work; both operators here are
built so the whole constraint set costs ONE aggregation pass over the
data (map-side combinable counters), never one scan per check.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Expectation:
    """A named violation predicate: rows where ``violated`` is true fail
    the check. ``distinct_on`` instead declares a uniqueness check over
    those columns (violations = n_rows - n_distinct)."""

    name: str
    violated: Column | None = None
    distinct_on: tuple[str, ...] | None = None


def expect_not_null(col: str) -> Expectation:
    return Expectation(f"not_null_{col}", violated=F.col(col).isNull())


def expect_in_set(col: str, values: list) -> Expectation:
    return Expectation(
        f"accepted_values_{col}",
        violated=~F.col(col).isin(values) | F.col(col).isNull(),
    )


def expect_between(col: str, lo, hi) -> Expectation:
    return Expectation(
        f"range_{col}",
        violated=~F.col(col).between(lo, hi) | F.col(col).isNull(),
    )


def expect_unique(*cols: str) -> Expectation:
    return Expectation("unique_" + "_".join(cols), distinct_on=tuple(cols))


def check_expectations(df: DataFrame, expectations: list[Expectation]) -> DataFrame:
    """Evaluate every expectation in ONE aggregation pass: conditional
    counters for predicate checks (map-side combinable) plus one
    distinct-count per uniqueness check (Catalyst plans the mixed
    distinct/non-distinct aggregate with a single Expand, still one scan).

    Returns (expectation, n_violations, passed) — |expectations| rows,
    unpivoted with ``stack`` from the one-row wide aggregate.
    """
    if not expectations:
        raise ValueError("no expectations given")
    aggs = []
    for i, e in enumerate(expectations):
        if e.distinct_on is not None:
            # dbt `unique` semantics: nulls are not duplicates (they are
            # the not_null check's business) — compare the count of rows
            # with every key column present against the distinct count,
            # which excludes the same rows.
            all_present = F.lit(True)
            for c in e.distinct_on:
                all_present = all_present & F.col(c).isNotNull()
            aggs.append(
                (
                    F.sum(all_present.cast("long"))
                    - F.countDistinct(*[F.col(c) for c in e.distinct_on])
                ).alias(f"_v{i}")
            )
        else:
            aggs.append(
                F.sum(e.violated.cast("long")).alias(f"_v{i}")
            )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{e.name}', _v{i}" for i, e in enumerate(expectations)
    )
    return wide.select(
        F.expr(
            f"stack({len(expectations)}, {stack_args})"
            " AS (expectation, n_violations)"
        )
    ).select(
        "expectation",
        F.coalesce("n_violations", F.lit(0)).alias("n_violations"),
        (F.coalesce("n_violations", F.lit(0)) == 0).alias("passed"),
    )


def profile_table(
    df: DataFrame, cols: list[str], exact: bool = True
) -> DataFrame:
    """Column profile: (column, n_rows, n_null, n_distinct, min_value,
    max_value) per profiled column, min/max rendered as strings after
    native-type comparison. Both modes share one output schema.

    ``exact=True`` (default): exact distinct counts. Instead of N
    ``countDistinct`` in one agg — which plans a single Expand that
    replicates every scan row N+1 times through the shuffle — the
    distincts run as ONE exploded two-phase aggregation: each row emits
    (column_name, encoded_value) pairs, partial aggregation collapses
    them map-side, and a second tiny agg counts per column. Measured
    2.8x faster than the Expand plan at sf0.1 (0.56 s vs 1.57 s) and
    still bit-exact: string columns are compared as-is and every other
    type is encoded via ``to_json(struct(col))`` with an explicit
    microsecond+offset timestampFormat (the default JSON format
    truncates to millis, which would collapse micros-distinct
    timestamps — top-level AND nested), so distinct native values
    never collapse. Columns whose type NESTS a float/double inside an
    array/map/struct fall back to ``countDistinct`` in the same wide
    agg: SQL grouping normalizes -0.0/0.0 and NaNs at any depth, while
    to_json renders them distinctly, so the JSON encoding would
    overcount there. (Top-level floats are cheaper: normalize -0.0 ->
    0.0 before encoding.)

    ``exact=False``: the 100 TB mode — ``approx_count_distinct`` (HLL++,
    ~2 % relative error) folds into the single null/min/max aggregation
    pass, so the whole profile is one map-side-combinable agg with no
    second pass and no Expand.
    """
    if not cols:
        raise ValueError("no columns given")
    from pyspark.sql.types import StringType

    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        FloatType,
        MapType,
        StructType,
    )

    def _nests_float(dt) -> bool:
        # float/double anywhere BELOW the top level: SQL grouping
        # normalizes -0.0/NaN at any depth but to_json renders them
        # distinctly, so those columns can't use the JSON encoding.
        if isinstance(dt, ArrayType):
            return _has_float(dt.elementType)
        if isinstance(dt, MapType):
            return _has_float(dt.keyType) or _has_float(dt.valueType)
        if isinstance(dt, StructType):
            return any(_has_float(f.dataType) for f in dt.fields)
        return False

    def _has_float(dt) -> bool:
        return isinstance(dt, (DoubleType, FloatType)) or _nests_float(dt)

    # countDistinct fallbacks ride the same wide agg (one Expand sized
    # by just these columns, usually zero of them).
    fallback = {c for c in cols if exact and _nests_float(df.schema[c].dataType)}

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max{i}"),
        ]
        if not exact:
            aggs.append(
                F.approx_count_distinct(F.col(c)).alias(f"_dist{i}")
            )
        elif c in fallback:
            aggs.append(F.countDistinct(F.col(c)).alias(f"_dist{i}"))
    wide = df.agg(*aggs)
    if exact:
        stack_args = ", ".join(
            f"'{c}', _null{i}, "
            + (f"_dist{i}, " if c in fallback else "CAST(NULL AS BIGINT), ")
            + f"_min{i}, _max{i}"
            for i, c in enumerate(cols)
        )
        base = wide.select(
            F.col("_n").alias("n_rows"),
            F.expr(
                f"stack({len(cols)}, {stack_args})"
                " AS (column_name, n_null, _cd, min_value, max_value)"
            ),
        )

        def _encode(c: str):
            col = F.col(c)
            dtype = df.schema[c].dataType
            if isinstance(dtype, StringType):
                enc = col
            else:
                # injective, lossless per-type encoding (binary/array/
                # struct/timestamp safe); plain cast-to-string is NOT
                # (binary is lossy UTF-8). Top-level floats normalize
                # -0.0 -> 0.0 first: SQL grouping (and countDistinct,
                # and the approx mode's HLL) treats them as one value,
                # but to_json renders two different strings. NaN needs
                # no special case — all NaNs encode to one "NaN".
                # Timestamps need an explicit format: the JSON default
                # truncates to millis; SSSSSS keeps full micros and
                # XXX disambiguates DST-overlapped instants.
                if isinstance(dtype, (DoubleType, FloatType)):
                    col = F.when(
                        F.col(c) == 0.0, F.lit(0.0).cast(dtype)
                    ).otherwise(F.col(c))
                enc = F.to_json(
                    F.struct(col.alias("v")),
                    {
                        "timestampFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX",
                        "timestampNTZFormat": "yyyy-MM-dd'T'HH:mm:ss.SSSSSS",
                    },
                )
            return F.when(F.col(c).isNotNull(), enc)

        enc_cols = [c for c in cols if c not in fallback]
        pairs = df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(c).alias("column_name"),
                            _encode(c).alias("v"),
                        )
                        for c in enc_cols
                    ]
                )
            ).alias("p")
        ).select("p.*").filter(F.col("v").isNotNull())
        if enc_cols:
            dist = (
                pairs.groupBy("column_name", "v")
                .agg(F.lit(1))
                .groupBy("column_name")
                .agg(F.count(F.lit(1)).alias("n_distinct"))
            )
            base = base.join(F.broadcast(dist), "column_name", "left")
        else:
            base = base.withColumn("n_distinct", F.lit(None).cast("long"))
        profiled = base.select(
            "column_name",
            "n_rows",
            "n_null",
            F.coalesce("_cd", "n_distinct", F.lit(0)).alias("n_distinct"),
            "min_value",
            "max_value",
        )
        return profiled
    stack_args = ", ".join(
        f"'{c}', _null{i}, _dist{i}, _min{i}, _max{i}"
        for i, c in enumerate(cols)
    )
    return wide.select(
        F.col("_n").alias("n_rows"),
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (column_name, n_null, n_distinct, min_value, max_value)"
        ),
    ).select(
        "column_name", "n_rows", "n_null", "n_distinct", "min_value",
        "max_value"
    )
