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


def profile_table(df: DataFrame, cols: list[str]) -> DataFrame:
    """One-pass column profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) per profiled column, min/max rendered as
    strings after native-type comparison.

    One aggregation pass for all columns (counts + min/max are map-side
    combinable; the exact distinct counts share a single Expand). At
    100 TB swap the exact distincts for ``approx_count_distinct`` — the
    call sites keep the same output schema.
    """
    if not cols:
        raise ValueError("no columns given")
    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(cols):
        aggs += [
            F.sum(F.col(c).isNull().cast("long")).alias(f"_null{i}"),
            F.countDistinct(F.col(c)).alias(f"_dist{i}"),
            F.min(F.col(c)).cast("string").alias(f"_min{i}"),
            F.max(F.col(c)).cast("string").alias(f"_max{i}"),
        ]
    wide = df.agg(*aggs)
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
