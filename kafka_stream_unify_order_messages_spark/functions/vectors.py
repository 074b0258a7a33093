"""Vector Column expressions over ``array<float>`` embedding columns.

All arithmetic is done in double precision with a strict left-to-right fold
(`F.aggregate` / `F.zip_with`) so results are bit-identical to DuckDB's
``list_dot_product`` on ``DOUBLE[]`` — which makes cosine scores
oracle-checkable after a fixed rounding.

No Python UDFs: these compile to Catalyst higher-order functions and stay
JVM-side in a full-table scan. For very hot paths a Pandas-UDF matmul
variant lives in operators/similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column
import pyspark.sql.functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def as_double(vec: Column | str) -> Column:
    return F.transform(_c(vec), lambda x: x.cast("double"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Left-to-right double-precision dot product."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(vec: Column | str) -> Column:
    return F.sqrt(dot(vec, vec))


def cosine(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; null when either norm is zero."""
    d = dot(a, b)
    denom = norm(a) * norm(b)
    return F.when(denom > 0, d / denom)


def quantize_int8(vec: Column | str) -> Column:
    """Symmetric int8 quantization: scale = max|x| / 127, q_i =
    floor(x_i/scale + 0.5) (explicit half-up — engines disagree on
    round()'s x.5 behavior for doubles, floor(+0.5) is deterministic
    everywhere). Returns struct(scale, q array<int>); zero vectors get
    scale 0 and all-zero codes.

    Scan-local expression work — the standard storage/bandwidth reduction
    step before shipping embeddings to trainers, at 1/4 the bytes.
    """
    v = as_double(vec)
    amax = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x))
    )

    # let-bind the scale through a lambda variable: as a free expression
    # inside the per-element transform it would re-run the O(d) max fold
    # per element (no CSE in interpreted HOFs) — O(d^2) per row
    def build(s: Column) -> Column:
        q = F.when(
            s > 0,
            F.transform(
                v, lambda x: F.floor(x / s + F.lit(0.5)).cast("int")
            ),
        ).otherwise(F.transform(v, lambda x: F.lit(0)))
        return F.struct(F.round(s, 9).alias("scale"), q.alias("q"))

    return F.element_at(
        F.transform(F.array(amax / F.lit(127.0)), build), 1
    )


def dequantize(scale: Column | str, q: Column | str) -> Column:
    """Inverse of ``quantize_int8``: x̂_i = q_i * scale (array<double>)."""
    s = _c(scale)
    return F.transform(_c(q), lambda x: x.cast("double") * s)
