"""Data-layout operators: Z-order (Morton) clustering for multi-dimensional
scan pruning.

At 100 TB the cheapest query is the one that never reads the file: parquet
keeps per-row-group min/max statistics, and sorting the data so that BOTH
filter dimensions are locally clustered lets those statistics prune row
groups for box predicates on either (or both) columns. A single-column
sort clusters one dimension perfectly and the other not at all; the
Morton code interleaves the two key's bits so range-partitioning by it
clusters both (the Z-order curve — what Delta/Iceberg OPTIMIZE ZORDER
does).

The code is a pure bit-twiddling Column expression (codegen, no UDF), and
the layout write is ``repartitionByRange(morton) + sortWithinPartitions``
— one range exchange, the terasort shape again.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F


def morton_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative integer
    columns into a single Z-order key (x in even positions, y in odd).

    Unrolled to ``2*bits`` constant shift/mask terms — whole-stage
    codegen, portable to any engine with integer bit ops (the DuckDB
    oracle builds the same expression textually).
    """
    xl, yl = x.cast("long"), y.cast("long")
    out = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(xl, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(yl, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        term = xb.bitwiseOR(yb)
        out = term if out is None else out.bitwiseOR(term)
    return out


def morton_code_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical Z-order expression as engine-neutral SQL text (for
    the DuckDB oracle)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x_expr} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y_expr} >> {i}) & 1) << {2 * i + 1})")
    return " | ".join(terms)


def zorder_write(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """Write ``df`` as parquet laid out along the Z-order curve of
    (x_col, y_col): range-partition on the Morton code (one exchange,
    sampled range bounds — no single-partition stage), sort within each
    partition, drop the helper column.

    After this layout, a box predicate on x AND/OR y prunes row groups
    via parquet min/max stats in BOTH dimensions — the test asserts the
    per-file stat ranges actually narrow vs an unsorted write.
    """
    keyed = df.withColumn("_z", morton_code(F.col(x_col), F.col(y_col), bits))
    (
        keyed.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
