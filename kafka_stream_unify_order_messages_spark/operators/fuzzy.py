"""Entity-resolution fuzzy join: blocked string-similarity matching.

The record-linkage shape (Fellegi-Sunter blocking): an equi-join on cheap
blocking keys bounds the candidate space, then an edit-distance filter
keeps true near-matches. The quadratic step is per-block by construction —
the operator never compares across blocks, so cost is
sum(block_size²) rather than n², and the block definition is the explicit
scale knob (add columns to tighten).

Everything stays JVM-side: the blocking join is a plain equi-join
(shuffle- or broadcast-hash, AQE's choice), and ``levenshtein`` with a
threshold argument early-abandons the DP once the budget is exceeded —
no Python, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F


def blocked_fuzzy_pairs(
    df: DataFrame,
    id_col: str,
    str_col: str,
    block_cols: list[str],
    max_dist: int = 2,
) -> DataFrame:
    """Distinct candidate pairs (id_a < id_b, dist) whose strings are
    within ``max_dist`` edits, compared only inside equal blocking keys.

    The length-difference lower bound (||a|-|b|| <= dist) is applied
    before the DP as a codegen-cheap prefilter, and the thresholded
    ``levenshtein(a, b, max_dist)`` abandons rows that exceed the budget
    in O(max_dist·min(len)) instead of O(len²).
    """
    a = df.select(
        *block_cols,
        F.col(id_col).alias("id_a"),
        F.col(str_col).alias("_sa"),
    )
    b = df.select(
        *block_cols,
        F.col(id_col).alias("id_b"),
        F.col(str_col).alias("_sb"),
    )
    cand = (
        a.join(b, block_cols)
        .filter(F.col("id_a") < F.col("id_b"))
        .filter(
            F.abs(F.length("_sa") - F.length("_sb")) <= max_dist
        )
    )
    dist = F.levenshtein("_sa", "_sb", max_dist)
    return (
        cand.withColumn("dist", dist)
        .filter(F.col("dist") >= 0)  # -1 == threshold exceeded
        .select("id_a", "id_b", F.col("dist").cast("long").alias("dist"))
    )
