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


def zonemap_skipping_eval(
    df: DataFrame,
    x_col: str,
    y_col: str,
    probe_values: list[int],
    probe_col: str | None = None,
    natural_col: str | None = None,
    bits: int = 16,
    tile_shift: int = 24,
    natural_rows_per_file: int = 256,
) -> DataFrame:
    """Quantified data-skipping win of the Z-order layout: for each probe
    value ``x = v``, how many files' zone maps (per-file min/max of
    ``x_col``) overlap the probe under (a) Z-order tiling vs (b) natural
    insertion order — the number a query engine would actually scan.

    File models are both SCAN-LOCAL expressions (no global row_number):
    Z-order file = high bits of the Morton code (a spatial tile — the
    same prefix ranges ``zorder_write``'s range partitioner converges
    to); natural file = ``natural_col`` (default: the x column's table
    key) divided into fixed row-id blocks. Zone maps are a tiny
    (layout, file) aggregate; the probe evaluation is |files| x |probes|
    conditional sums over that tiny frame — nothing data-sized moves.

    Returns (layout, probe_value, files_scanned, files_total,
    skip_ratio): Z-order clusters ``x_col`` so point probes touch a few
    tiles; insertion order scatters it so nearly every file overlaps.
    """
    natural_col = natural_col or y_col
    z = morton_code(F.col(x_col), F.col(y_col), bits)
    keyed = df.select(
        F.col(x_col).alias("_x"),
        F.shiftright(z, tile_shift).alias("_zfile"),
        (F.col(natural_col).cast("long") / natural_rows_per_file)
        .cast("long")
        .alias("_nfile"),
    )
    zones = (
        keyed.select(F.lit("zorder").alias("layout"), F.col("_zfile").alias("file"), "_x")
        .unionByName(
            keyed.select(F.lit("natural").alias("layout"), F.col("_nfile").alias("file"), "_x")
        )
        .groupBy("layout", "file")
        .agg(F.min("_x").alias("lo"), F.max("_x").alias("hi"))
    )
    probes = F.explode(
        F.array(*[F.lit(int(v)) for v in probe_values])
    ).alias("probe_value")
    return (
        zones.select("layout", "lo", "hi", probes)
        .groupBy("layout", "probe_value")
        .agg(
            F.sum(
                ((F.col("lo") <= F.col("probe_value"))
                 & (F.col("probe_value") <= F.col("hi"))).cast("long")
            ).alias("files_scanned"),
            F.count(F.lit(1)).alias("files_total"),
        )
        .select(
            "layout",
            "probe_value",
            "files_scanned",
            "files_total",
            F.round(
                1.0 - F.col("files_scanned") / F.col("files_total"), 4
            ).alias("skip_ratio"),
        )
    )


# ---------------------------------------------------------------------------
# Hilbert curve: the locality-optimal space-filling alternative to the
# Morton/Z-order code above. Consecutive Hilbert positions are always
# spatially adjacent (Morton jumps across the square at power-of-two
# boundaries), so range-partitioning by Hilbert code yields tiles with
# strictly tighter per-file bounding boxes — what Iceberg's hilbert
# clustering and scientific array stores use for the same reason.
#
# The rotation state of the classic recursive construction would unroll
# exponentially as a Column expression; instead the code runs the
# standard 4-state FSM over the Morton quads MSB->LSB (digit/transition
# tables derived from the recursive definition and verified against it
# in tests/test_layout.py), folded linearly with F.aggregate — codegen,
# no UDF, O(bits) expression size.
# ---------------------------------------------------------------------------

HILBERT_DIG = (0, 1, 3, 2, 0, 3, 1, 2, 2, 1, 3, 0, 2, 3, 1, 0)
HILBERT_NXT = (1, 0, 2, 0, 0, 3, 1, 1, 2, 2, 0, 3, 3, 1, 3, 2)


def hilbert_code(x: Column, y: Column, bits: int = 16) -> Column:
    """Hilbert-curve position of (x, y) on a 2^bits x 2^bits grid.

    ``bits == 16`` takes the vectorized branchless path
    (``hilbert_code16``): Spark evaluates higher-order-function lambdas
    interpreted (never codegen), so the 16-step fold below costs ~13 µs
    per row; the Arrow-batched numpy version runs the O(log bits)
    parallel-prefix construction as ~40 whole-column int64 ops per
    batch. (A pure-Column port of the prefix construction is a trap:
    each round re-references the previous round's a/b/c/d trees ~8x, so
    the expression grows 8^rounds and ANALYSIS hangs — there is no
    let-binding outside lambdas.) Other widths use the FSM fold: quads
    (2 bits per level, MSB first) materialized as a bound array and
    folded through the (state, digit) FSM — d = 4*d + DIG[state*4+quad];
    state = NXT[state*4+quad] — with table lookups via element_at on
    16-element literal arrays. Both paths are tested equal to the
    recursive reference.
    """
    if bits == 16:
        return hilbert_code16(x, y)
    xl, yl = x.cast("long"), y.cast("long")
    quads = F.array(
        *[
            F.shiftright(xl, lev).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(yl, lev).bitwiseAND(F.lit(1))
            for lev in range(bits - 1, -1, -1)
        ]
    )
    dig = F.array(*[F.lit(v) for v in HILBERT_DIG])
    nxt = F.array(*[F.lit(v) for v in HILBERT_NXT])
    acc0 = F.struct(
        F.lit(0).alias("st"), F.lit(0).cast("long").alias("d")
    )
    folded = F.aggregate(
        quads,
        acc0,
        lambda acc, q: F.struct(
            F.element_at(
                nxt, (acc["st"] * 4 + q + 1).cast("int")
            ).alias("st"),
            (
                acc["d"] * 4
                + F.element_at(
                    dig, (acc["st"] * 4 + q + 1).cast("int")
                ).cast("long")
            ).alias("d"),
        ),
    )
    return folded.getField("d")


def hilbert_code_sql(x_expr: str, y_expr: str, bits: int = 16) -> str:
    """The identical Hilbert FSM as engine-neutral chained-CTE SQL text
    (for the DuckDB oracle): one CTE per level carrying (st_k, d_k).
    Returns the CTE chain body; the caller supplies the base CTE named
    ``h0`` with columns (..., hx, hy) and selects ``d{bits}`` from
    ``h{bits}``."""
    dig = "[" + ", ".join(str(v) for v in HILBERT_DIG) + "]"
    nxt = "[" + ", ".join(str(v) for v in HILBERT_NXT) + "]"
    parts = []
    for k in range(bits):
        lev = bits - 1 - k
        q = f"((({x_expr} >> {lev}) & 1) * 2 + (({y_expr} >> {lev}) & 1))"
        prev_st = "0" if k == 0 else f"st{k - 1}"
        prev_d = "CAST(0 AS BIGINT)" if k == 0 else f"d{k - 1}"
        parts.append(
            f"h{k + 1} AS (SELECT *, "
            f"({nxt})[{prev_st} * 4 + {q} + 1] AS st{k}, "
            f"{prev_d} * 4 + ({dig})[{prev_st} * 4 + {q} + 1] AS d{k} "
            f"FROM h{k})"
        )
    return ", ".join(parts)


def _hilbert16_np(x, y):
    """Branchless 16-bit Hilbert index over int64 numpy arrays — the
    public-domain O(log n) parallel-prefix construction: the per-level
    curve orientation propagates through logarithmic prefix rounds of
    AND/XOR/shift instead of a sequential fold. Verified bit-equal to
    the FSM fold and the recursive reference in tests/test_layout.py."""
    import numpy as np

    M = np.int64(0xFFFF)
    x = x.astype(np.int64) & M
    y = y.astype(np.int64) & M
    a = x ^ y
    b = M ^ a
    c = M ^ (x | y)
    d = x & (y ^ M)
    A = a | (b >> 1)
    B = (a >> 1) ^ a
    C = ((c >> 1) ^ (b & (d >> 1))) ^ c
    D = ((a & (c >> 1)) ^ (d >> 1)) ^ d
    for s in (2, 4, 8):
        a, b, c, d = A, B, C, D
        A = ((a & (a >> s)) ^ (b & (b >> s))) & M
        B = ((a & (b >> s)) ^ (b & ((a ^ b) >> s))) & M
        C = C ^ (((a & (c >> s)) ^ (b & (d >> s))) & M)
        D = D ^ (((b & (c >> s)) ^ ((a ^ b) & (d >> s))) & M)
    a, b, c, d = A, B, C, D
    C = C ^ ((a & (c >> 16)) ^ (b & (d >> 16)))
    D = D ^ ((b & (c >> 16)) ^ ((a ^ b) & (d >> 16)))
    a = C ^ (C >> 1)
    b = D ^ (D >> 1)
    i0 = x ^ y
    i1 = b | (M ^ (i0 | a))

    def interleave(v):
        v = (v | (v << 8)) & np.int64(0x00FF00FF)
        v = (v | (v << 4)) & np.int64(0x0F0F0F0F)
        v = (v | (v << 2)) & np.int64(0x33333333)
        v = (v | (v << 1)) & np.int64(0x55555555)
        return v

    return ((interleave(i1) << 1) | interleave(i0 & M)) & np.int64(
        0xFFFFFFFF
    )


def hilbert_code16(x: Column, y: Column) -> Column:
    """Vectorized 16-bit Hilbert index: an Arrow-batched pandas_udf
    running ``_hilbert16_np`` — ~40 whole-column int64 ops per batch,
    the same "numpy where Columns can't express it efficiently" budget
    as the ANN GEMM kernels (similarity.py). Deterministic integer
    arithmetic, so the DuckDB FSM oracle still matches bit-for-bit."""
    import warnings

    import pandas as pd
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # hint-free SCALAR form: `from __future__ import annotations` turns
    # hints into strings, which pandas_udf's type-hint inference rejects
    with warnings.catch_warnings():
        warnings.simplefilter("ignore", UserWarning)

        @pandas_udf("long", PandasUDFType.SCALAR)
        def _h16(xs, ys):
            return pd.Series(_hilbert16_np(xs.to_numpy(), ys.to_numpy()))

    return _h16(x.cast("long"), y.cast("long"))


def morton_code3(
    x: Column, y: Column, z: Column, bits: int = 16
) -> Column:
    """Three-way Morton interleave (x stride-3 at offset 0, y at 1, z at
    2) — the 3-column clustering key for tables filtered on three
    dimensions at once. 3*bits shift/mask terms, codegen like the 2-D
    form; 16 bits per key stays within the 63-bit long budget (48 bits
    used)."""
    xl, yl, zl = x.cast("long"), y.cast("long"), z.cast("long")
    out = None
    for i in range(bits):
        for off, col in ((0, xl), (1, yl), (2, zl)):
            term = F.shiftleft(
                F.shiftright(col, i).bitwiseAND(F.lit(1)), 3 * i + off
            )
            out = term if out is None else out.bitwiseOR(term)
    return out


def morton_code3_sql(
    x_expr: str, y_expr: str, z_expr: str, bits: int = 16
) -> str:
    """The identical 3-way interleave as engine-neutral SQL text."""
    terms = []
    for i in range(bits):
        for off, e in ((0, x_expr), (1, y_expr), (2, z_expr)):
            terms.append(f"((({e} >> {i}) & 1) << {3 * i + off})")
    return " | ".join(terms)
