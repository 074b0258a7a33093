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
