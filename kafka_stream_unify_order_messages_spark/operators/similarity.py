"""Similarity search over embedding columns (``array<float>``).

Two paths:

- brute-force top-k — exact cosine between a (small) query set and the full
  corpus. The query side is broadcast; the corpus is scanned once, scores
  computed JVM-side (functions.vectors), top-k selected per query with a
  window over the rounded score (float-drift-proof ordering). Exact and
  oracle-checkable; cost O(|Q|·|corpus|) — the baseline.

- random-hyperplane LSH buckets — the scale path: each vector maps to a
  ``n_planes``-bit signature (sign of dot with deterministic pseudo-random
  hyperplanes derived from md5, so DuckDB can replicate). Same-bucket
  vectors are ANN candidates; search cost drops to O(|Q|·bucket) with the
  usual recall trade-off. A multi-probe variant simply unions signatures
  with one bit flipped.

There is also a Pandas-UDF matmul variant of brute force (numpy dot over
Arrow batches) for when the corpus fits per-executor memory as a broadcast;
at 64 dims the JVM expression path is fast enough that the default stays
UDF-free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.functions.vectors import cosine, dot


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "cosine",
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, score, rnk).

    Scores are rounded to 6 decimals *before* ranking so the k-th boundary
    cannot flip on float summation differences across engines/partitions.
    """
    from pyspark.sql import Window

    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    fn = cosine if metric == "cosine" else dot
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(fn(F.col("q_vec"), F.col("c_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def hyperplane(seed: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane component values in [-1, 1),
    derived from md5 so any engine reproduces them. Used as literals, so
    the Spark plan embeds the plane; nothing random at runtime.
    """
    import hashlib

    comps = []
    for d in range(dim):
        h = hashlib.md5(f"plane:{seed}:{d}".encode()).hexdigest()[:8]
        comps.append((int(h, 16) % 20001 - 10000) / 10000.0)
    return comps


def lsh_signature(
    vec: Column | str, n_planes: int = 8, dim: int = 64
) -> Column:
    """Random-hyperplane signature: bit i = 1 iff dot(vec, plane_i) > 0."""
    v = F.col(vec) if isinstance(vec, str) else vec
    sig = None
    for i in range(n_planes):
        plane = F.array(*[F.lit(x) for x in hyperplane(i, dim)])
        bit = F.when(dot(v, plane) > 0, F.lit(2 ** i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = bit if sig is None else sig + bit
    return sig


def lsh_buckets(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """(id, bucket) — hyperplane-LSH bucket assignment for ANN search."""
    return df.select(
        F.col(id_col),
        lsh_signature(vec_col, n_planes, dim).alias("bucket"),
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking *within* shared LSH buckets.

    At scale the bucket join replaces the cross join: cost goes from
    |Q|·|corpus| to sum over buckets of |Q_b|·|C_b|.
    """
    from pyspark.sql import Window

    q = lsh_buckets(queries, id_col, vec_col, n_planes, dim).join(
        queries.select(F.col(id_col), F.col(vec_col).alias("q_vec")), id_col
    ).select(F.col(id_col).alias("query_id"), "bucket", "q_vec")
    c = lsh_buckets(corpus, id_col, vec_col, n_planes, dim).join(
        corpus.select(F.col(id_col), F.col(vec_col).alias("c_vec")), id_col
    ).select(F.col(id_col).alias("neighbor_id"), "bucket", "c_vec")

    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )
