"""Iterative graph algorithms over edge DataFrames.

operators/dedup.py already walks connected components by min-label
propagation; this module adds PageRank — the canonical "importance on a
similarity graph" measure a curation pipeline uses to pick cluster
representatives or weight crawl sources.

Scale shape: the classic Pregel-on-DataFrames loop. Edges (joined once
with out-degrees) persist across iterations; each iteration is one
shuffle join (ranks onto edge sources) plus one shuffle aggregation
(summing contributions by destination). Ranks are localCheckpoint()ed
every iteration so the plan stays O(1) deep instead of O(iterations) —
the same lineage-truncation discipline as dedup_clusters.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark import StorageLevel
from pyspark.sql import DataFrame


def symmetrize(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Undirected pair list -> directed edge list with both orientations."""
    return pairs.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).unionByName(
        pairs.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    )


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
) -> DataFrame:
    """(node, pagerank) after a fixed number of power iterations.

    ``edges`` is a directed (src, dst) frame. Every node is assumed to
    have out-degree >= 1 (true for symmetrized similarity graphs, where
    membership implies at least one pair), so no dangling-mass term is
    needed. Initial rank is uniform 1/N; each step is

        r'(v) = (1 - d)/N + d * sum_{u -> v} r(u) / outdeg(u)

    The only driver-side scalar is N (one count, same license as the
    convergence counters in dedup_clusters); everything else stays in
    the plan. Rank values are rounded to 6 decimals at the END only, so
    the iteration itself runs at full double precision.
    """
    ed = edges.persist(StorageLevel.MEMORY_AND_DISK)
    deg = ed.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    # pre-divide: each edge carries its source's 1/outdeg share so the
    # per-iteration join multiplies instead of re-joining degrees
    ed_share = ed.join(deg, "src").persist(StorageLevel.MEMORY_AND_DISK)

    nodes = ed.select(F.col("src").alias("node")).distinct()
    n = nodes.count()
    jump = (1.0 - damping) / n

    ranks = nodes.withColumn("r", F.lit(1.0 / n)).localCheckpoint()
    for _ in range(iterations):
        contribs = ed_share.join(
            ranks.withColumnRenamed("node", "src"), "src"
        ).select(
            F.col("dst").alias("node"),
            (F.col("r") / F.col("outdeg")).alias("share"),
        )
        ranks = (
            contribs.groupBy("node")
            .agg(
                (F.lit(jump) + F.lit(damping) * F.sum("share")).alias("r")
            )
            .localCheckpoint()
        )
    out = ranks.select("node", F.round("r", 6).alias("pagerank"))
    ed_share.unpersist()
    ed.unpersist()
    return out
