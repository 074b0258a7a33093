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

    # LAZY checkpoints: each one still truncates the plan to an O(1)-deep
    # LogicalRDD barrier, but materialization is deferred to the first
    # action that reads it — the next iteration's (or the caller's) job —
    # instead of paying one eager driver-blocking job PER iteration. Same
    # data, same lineage discipline, `iterations` fewer scheduler
    # round-trips per call (measured r14: pagerank_dup_graph 30 -> ~21
    # jobs per run).
    ranks = nodes.withColumn("r", F.lit(1.0 / n)).localCheckpoint(
        eager=False
    )
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
            .localCheckpoint(eager=False)
        )
    # ONE materializing action runs the whole deferred chain (each lazy
    # checkpoint caches as it is first computed) while the edge caches
    # are still alive; only then is it safe to drop them — the returned
    # frame reads the final checkpoint, never the edge lineage again
    ranks.count()
    out = ranks.select("node", F.round("r", 6).alias("pagerank"))
    ed_share.unpersist()
    ed.unpersist()
    return out


def triangle_count(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Per-node triangle counts over an undirected pair list (one row
    per edge, ``src < dst``), plus the count makes the global total a
    trivial sum/3 downstream.

    Implemented with the degree-ordered orientation trick: orient every
    edge from its lower-degree endpoint to its higher-degree endpoint
    (ties by id), then join wedges (a->b, a->c with b < c by the same
    order) against oriented edges (b->c). Each triangle is found exactly
    once, and — the scale property — wedge count is bounded by the sum
    of squared ORIENTED out-degrees, which the orientation caps at
    O(m^1.5) total even on power-law graphs where a raw neighbor
    self-join on a celebrity node is quadratic.

    Returns (node, n_triangles) for every node in the edge list
    (0-triangle nodes included).
    """
    edges = pairs.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    nodes = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = nodes.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = nodes.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    with_deg = edges.join(da, "a").join(db, "b")
    # orient lower (deg, id) -> higher (deg, id): a total order
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = with_deg.select(
        F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("lo"),
        F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("hi"),
        F.when(lower_first, F.col("deg_a")).otherwise(F.col("deg_b")).alias("deg_lo"),
        F.when(lower_first, F.col("deg_b")).otherwise(F.col("deg_a")).alias("deg_hi"),
    )
    # wedges at the low-degree apex: two oriented edges lo->x, lo->y with
    # x before y in the SAME (deg, id) order the orientation used
    e1 = oriented.select(
        F.col("lo"), F.col("hi").alias("x"),
        F.col("deg_hi").alias("deg_x"),
    )
    e2 = oriented.select(
        F.col("lo"), F.col("hi").alias("y"),
        F.col("deg_hi").alias("deg_y"),
    )
    wedges = e1.join(e2, "lo").filter(
        (F.col("deg_x") < F.col("deg_y"))
        | ((F.col("deg_x") == F.col("deg_y")) & (F.col("x") < F.col("y")))
    )
    closing = oriented.select(
        F.col("lo").alias("x"), F.col("hi").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).select("lo", "x", "y")
    per_node = (
        tri.select(F.explode(F.array("lo", "x", "y")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return (
        nodes.select("node")
        .join(per_node, "node", "left")
        .select(
            "node",
            F.coalesce("n_triangles", F.lit(0)).cast("long").alias("n_triangles"),
        )
    )


def clustering_coefficient(
    pairs: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    triangles: DataFrame | None = None,
) -> DataFrame:
    """Local clustering coefficient per node over an undirected pair
    list: ``2 * triangles(v) / (deg(v) * (deg(v) - 1))`` (0 for degree
    < 2). On a near-dup candidate graph this separates clique-like
    duplicate clusters (coefficient ~1) from chain-like LSH false-
    positive paths (coefficient ~0) — the graph-level confirmation
    signal triangle_count exists to feed.

    Scale shape: triangle_count's oriented wedge join (O(m^1.5) bound)
    plus one degree aggregation, joined on node — both frames are
    node-sized, never edge-squared. Pass a precomputed ``triangles``
    frame (node, n_triangles) to reuse a shared/persisted wedge join
    instead of re-running it.
    """
    edges = pairs.select(
        F.col(src).cast("long").alias("a"), F.col(dst).cast("long").alias("b")
    ).filter(F.col("a") != F.col("b")).distinct()
    degrees = (
        edges.select(F.col("a").alias("node"))
        .unionByName(edges.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tri = triangles if triangles is not None else triangle_count(pairs, src, dst)
    coeff = F.when(
        F.col("degree") >= 2,
        F.round(
            2.0
            * F.col("n_triangles")
            / (F.col("degree") * (F.col("degree") - 1)),
            6,
        ),
    ).otherwise(F.lit(0.0))
    return degrees.join(tri, "node").select(
        "node", "degree", "n_triangles", coeff.alias("clustering")
    )


def bfs_hops(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 6,
) -> DataFrame:
    """(node, hop): shortest hop distance from a seed set, capped at
    ``max_hops`` — frontier-expansion BFS as the iterative DataFrame
    loop Spark uses where a warehouse would write WITH RECURSIVE (the
    oracle does exactly that). Reachability-with-distance is the
    "blast radius" question on a dup/similarity graph: how far does a
    contamination seed spread through near-dup links.

    ``edges`` is directed (src, dst) — symmetrize() first for
    undirected graphs; ``seeds``' first column is the node id. Per
    iteration: one equi-join of the frontier onto edges, a distinct,
    and an anti-join against the visited set; the frontier is
    localCheckpoint()ed each hop (lineage stays O(1) deep, and the
    emptiness probe that stops early reuses the checkpointed frame
    rather than recomputing the join chain). Frontier size is bounded
    by the reachable set, never the edge count; at 100 TB both joins
    are hash shuffles on the node key, and the early exit caps the
    number of rounds at the graph's (small-world) effective diameter.
    """
    ed = edges.persist(StorageLevel.MEMORY_AND_DISK)
    visited = (
        seeds.select(F.col(seeds.columns[0]).alias("node"))
        .distinct()
        .withColumn("hop", F.lit(0).cast("long"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    frontier = visited
    for h in range(1, max_hops + 1):
        # LAZY checkpoint + count in ONE job: the eager form ran a
        # checkpoint job and then a separate emptiness-probe job per hop
        # (2 driver round-trips + 2 AQE cycles); count() on the lazily
        # checkpointed frame materializes the checkpoint AND answers the
        # probe in a single job, and a count is the one action that is
        # guaranteed to compute EVERY partition (a take(1) could leave
        # the local checkpoint partially materialized, which
        # LocalCheckpointRDD punishes with "checkpoint block not found")
        nxt = (
            frontier.join(ed, frontier["node"] == ed["src"], "inner")
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("long"))
            .localCheckpoint(eager=False)
        )
        if nxt.count() == 0:
            break
        # plain union of already-materialized frames (seeds cache + hop
        # checkpoints): re-persisting the growing union copied the whole
        # visited set into a fresh cache every hop — O(hops * nodes)
        # pure caching work for data that is already block-resident
        visited = visited.unionByName(nxt)
        frontier = nxt
    ed.unpersist()
    return visited
