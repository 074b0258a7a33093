"""Similarity search over embedding columns (``array<float>``).

Three paths:

- brute-force top-k — exact cosine between a (small) query set and the full
  corpus. The query matrix is broadcast as numpy; each corpus partition is
  scored with one Arrow-batched matmul inside ``mapInPandas`` and pruned to
  its batch-local top-k (with a rounding-quantum safety margin) before the
  single global shuffle ranks the survivors. Cost per partition is one
  (|Q| x dim) @ (dim x |batch|) GEMM; shuffled rows are O(|Q| * k) per
  partition, never O(|Q| * |corpus|). This is the 100 TB shape: corpus
  stays partitioned, queries ride along like a broadcast hash join's build
  side.

- random-hyperplane LSH buckets — each vector maps to an ``n_planes``-bit
  signature (sign of dot with deterministic md5-derived hyperplanes, so
  DuckDB can replicate). Same-bucket vectors are ANN candidates; search
  cost drops to O(|Q|·bucket) with the usual recall trade-off.

- LSH / IVF top-k — exact cosine ranking restricted to probed groups:
  each Arrow batch is grouped by bucket (LSH) or cell (IVF) and only
  (query-group x corpus-group) blocks that share a probed key are
  GEMMed, so per-batch compute AND shuffled candidates are both
  sum over groups of |Q_g|·|C_g| — never |Q|·|batch|.

- random projection — JL-style dim reduction onto deterministic
  md5-derived directions; scan-local GEMM per batch.

Scoring fidelity: scores are rounded to 6 decimals before any ranking or
thresholding so the k-th boundary cannot flip on float summation order
(numpy pairwise sums vs DuckDB's fold). Ranking ties break on neighbor id.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import StructType

from kafka_stream_unify_order_messages_spark.functions.vectors import cosine, dot

# one rounding quantum: batch-local pruning keeps anything within this of
# the k-th best raw score, so no row that could round-tie into the global
# top-k is ever dropped before the final exact ranking
_ROUND_MARGIN = 1.5e-6


def _normalized_matrix(vecs: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    norms[norms == 0] = np.inf  # zero vectors score 0 against everything
    return vecs / norms


_GUARD_DEFAULT_REASON = (
    "the query side is collected driver-side and every query scores "
    "against the corpus, so cost goes quadratic when |Q| grows with "
    "the corpus (measured in SCALING.md). Use knn_join "
    "(corpus-vs-corpus, neither side collected)"
)


def _collect_query_batch(
    queries: DataFrame,
    cols: list[str],
    max_query_batch: int | None,
    op_name: str,
    reason: str = _GUARD_DEFAULT_REASON,
) -> list:
    """Guarded collect of the serving-batch query side, shared by every
    ANN operator that collects queries like a broadcast join's build
    side. The exhaustive-scan guard is FOLDED into the collect itself
    (one Spark action per call, not probe + collect — serving batches
    are the hot path): at most ``max_query_batch + 1`` rows ever reach
    the driver (the ``limit`` bounds the job), and crossing the cap
    raises with the scale-safe alternative named in the message. These
    serving-batch primitives all go quadratic when |Q| grows with the
    corpus (measured for the ADC form in SCALING.md); the corpus-scale
    path is ``knn_join`` (corpus-vs-corpus, NEITHER side collected).
    Pass ``max_query_batch=None`` only for a deliberate exhaustive
    baseline."""
    if max_query_batch is None:
        return queries.select(*cols).collect()
    rows = queries.select(*cols).limit(max_query_batch + 1).collect()
    if len(rows) > max_query_batch:
        raise ValueError(
            f"{op_name} got a >{max_query_batch}-query batch: {reason}, "
            f"or pass max_query_batch=None for a deliberate exhaustive "
            f"baseline."
        )
    return rows


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    metric: str = "cosine",
    exclude_same_col: str | None = None,
    max_query_batch: int | None = 10_000,
) -> DataFrame:
    """Exact top-k neighbors per query: (query_id, neighbor_id, score, rnk).

    ``queries`` must be broadcast-sized (it is collected into a numpy
    matrix, like the build side of a broadcast join); ``corpus`` can be
    arbitrarily large and is never shuffled at full width.
    ``max_query_batch`` enforces the broadcast-sized contract instead of
    trusting the docstring (see _collect_query_batch; knn_join is the
    corpus-vs-corpus path).

    ``exclude_same_col`` names a column present on BOTH sides whose
    equal values disqualify a (query, candidate) pair — the hard-
    negative-mining form (label-matched pairs masked the same way
    self-pairs are), in ONE corpus pass instead of one pass per label
    stratum.
    """
    from pyspark.sql import Window

    q_cols = [id_col, vec_col] + (
        [exclude_same_col] if exclude_same_col else []
    )
    q_rows = _collect_query_batch(
        queries, q_cols, max_query_batch, "brute_force_topk"
    )
    q_ids = [r[0] for r in q_rows]
    q_excl = (
        np.asarray([r[2] for r in q_rows]) if exclude_same_col else None
    )
    q_mat = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    if metric == "cosine":
        q_mat = _normalized_matrix(q_mat)

    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double")

    use_cosine = metric == "cosine"

    def score_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_id_arr = np.asarray(q_ids)
        for pdf in pdfs:
            if pdf.empty:
                continue
            c_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            if use_cosine:
                c_mat = _normalized_matrix(c_mat)
            scores = q_mat @ c_mat.T  # (n_queries, n_batch)
            n_ids = pdf[id_col].to_numpy()
            # mask self-pairs before pruning
            self_mask = q_id_arr[:, None] == n_ids[None, :]
            scores = np.where(self_mask, -np.inf, scores)
            if q_excl is not None:
                c_excl = pdf[exclude_same_col].to_numpy()
                scores = np.where(
                    q_excl[:, None] == c_excl[None, :], -np.inf, scores
                )
            keep = min(k, scores.shape[1])
            kth = np.partition(scores, -keep, axis=1)[:, -keep] if keep else None
            out_q, out_n, out_s = [], [], []
            for qi in range(scores.shape[0]):
                row = scores[qi]
                sel = (row >= (kth[qi] - _ROUND_MARGIN)) & np.isfinite(row)
                out_q.append(np.full(sel.sum(), q_id_arr[qi]))
                out_n.append(n_ids[sel])
                out_s.append(row[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "score": np.concatenate(out_s),
                }
            )

    c_cols = [id_col, vec_col] + (
        [exclude_same_col] if exclude_same_col else []
    )
    pruned = corpus.select(*c_cols).mapInPandas(
        score_partition, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.row_number().over(w))
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


def _hyperplane_matrix(n_planes: int, dim: int) -> np.ndarray:
    return np.asarray(
        [hyperplane(i, dim) for i in range(n_planes)], dtype=np.float64
    )


def _lsh_bits_np(mat: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Bucket ids for a (n, dim) matrix — numpy GEMM with an exact-fold
    guard: any |dot| small enough that numpy's pairwise summation could
    disagree with a strict left-to-right fold (the JVM/DuckDB order) is
    recomputed exactly, so bucket bits are bit-identical to the Column-
    expression path regardless of BLAS summation order.
    """
    import math

    dots = mat @ planes.T  # (n, n_planes)
    near = np.argwhere(np.abs(dots) < 1e-9)
    for r, p in near:
        dots[r, p] = math.fsum(mat[r] * planes[p])
    bits = (dots > 0).astype(np.int64)
    return (bits << np.arange(planes.shape[0], dtype=np.int64)[None, :]).sum(
        axis=1
    )


def _probe_map(probes: np.ndarray) -> dict[int, np.ndarray]:
    """Invert a (n_queries, n_probes) probe table into
    ``{group key -> array of query indices probing it}``."""
    out: dict[int, list[int]] = {}
    for qi in range(probes.shape[0]):
        for key in probes[qi]:
            out.setdefault(int(key), []).append(qi)
    return {key: np.asarray(v, dtype=np.int64) for key, v in out.items()}


def _grouped_probe_scores(
    q_mat: np.ndarray,
    q_id_arr: np.ndarray,
    probe_map: dict[int, np.ndarray],
    c_mat: np.ndarray,
    c_keys: np.ndarray,
    n_ids: np.ndarray,
    k: int,
) -> pd.DataFrame | None:
    """Score one Arrow batch against the broadcast query set, touching only
    (query, corpus-row) pairs that share a probed group key.

    Corpus rows are grouped by key; each probed group pays one
    (|Q_g| x dim) @ (dim x |C_g|) GEMM — total compute is
    sum over groups of |Q_g|·|C_g|, NOT |Q|·|batch| (no full-matrix
    score-then-mask). Survivors are pruned to each query's batch-local
    top-k (with the rounding-quantum margin) before the ranking shuffle.
    """
    order = np.argsort(c_keys, kind="stable")
    sorted_keys = c_keys[order]
    uniq, starts = np.unique(sorted_keys, return_index=True)
    bounds = np.append(starts, len(sorted_keys))
    q_parts: list[np.ndarray] = []
    n_parts: list[np.ndarray] = []
    s_parts: list[np.ndarray] = []
    for gi in range(len(uniq)):
        q_sel = probe_map.get(int(uniq[gi]))
        if q_sel is None:
            continue
        c_idx = order[starts[gi] : bounds[gi + 1]]
        sub = q_mat[q_sel] @ c_mat[c_idx].T  # (|Q_g|, |C_g|)
        ids_g = n_ids[c_idx]
        sub = np.where(
            q_id_arr[q_sel][:, None] == ids_g[None, :], -np.inf, sub
        )
        # prune to per-query top-k IMMEDIATELY, inside the group loop:
        # accumulating raw |Q_g|·|C_g| pair arrays across groups held
        # O(batch-pairs) memory per worker (observed ~3.5 GB/worker ->
        # fleet OOM at the 200k-vector ramp tier). Safe: a group's k-th
        # best is <= the batch's k-th best, so nothing within the margin
        # of the batch top-k is dropped — the group sub-matrix itself
        # stays transient.
        keep_n = min(k, sub.shape[1])
        kth = np.partition(sub, -keep_n, axis=1)[:, -keep_n]
        mask = (sub >= (kth[:, None] - _ROUND_MARGIN)) & np.isfinite(sub)
        qi_idx, ci_idx = np.nonzero(mask)
        q_parts.append(q_sel[qi_idx])
        n_parts.append(c_idx[ci_idx])
        s_parts.append(sub[qi_idx, ci_idx])
    if not q_parts:
        return None
    qi_all = np.concatenate(q_parts)
    ci_all = np.concatenate(n_parts)
    sc_all = np.concatenate(s_parts)
    finite = np.isfinite(sc_all)
    qi_all, ci_all, sc_all = qi_all[finite], ci_all[finite], sc_all[finite]
    if not len(sc_all):
        return None
    # batch-local top-k per query (margin keeps round-ties alive)
    srt = np.lexsort((-sc_all, qi_all))
    qs, ss = qi_all[srt], sc_all[srt]
    grp_starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    grp_ends = np.r_[grp_starts[1:], len(qs)]
    keep = np.zeros(len(qs), dtype=bool)
    for s0, s1 in zip(grp_starts, grp_ends):
        kk = min(k, s1 - s0)
        keep[s0:s1] = ss[s0:s1] >= ss[s0 + kk - 1] - _ROUND_MARGIN
    sel = srt[keep]
    return pd.DataFrame(
        {
            "query_id": q_id_arr[qi_all[sel]],
            "neighbor_id": n_ids[ci_all[sel]],
            "score": sc_all[sel],
        }
    )


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    multi_probe: bool = False,
    max_query_batch: int | None = 10_000,
) -> DataFrame:
    """Approximate top-k: exact cosine ranking restricted to shared LSH
    buckets. Queries ride broadcast with their bucket ids; each corpus
    partition computes its own buckets, groups the Arrow batch by bucket,
    and GEMMs only bucket-matching (query-group x corpus-group) blocks —
    compute AND shuffle are both sum over buckets of |Q_b|·|C_b|, never
    |Q|·|corpus|. Survivors are pruned to batch-local top-k before the
    single ranking shuffle. ``max_query_batch`` enforces the
    broadcast-sized query contract (see _collect_query_batch; knn_join is
    the corpus-vs-corpus path).

    ``multi_probe=True`` additionally probes every bucket at Hamming
    distance 1 from the query's (one hyperplane sign flipped) — the
    standard recall lever: ~(1 + n_planes)x the candidates without
    touching the index.
    """
    from pyspark.sql import Window

    q_rows = _collect_query_batch(
        queries, [id_col, vec_col], max_query_batch, "lsh_topk"
    )
    planes = _hyperplane_matrix(n_planes, dim)
    q_ids = [r[0] for r in q_rows]
    q_raw = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    q_mat = _normalized_matrix(q_raw)
    q_buckets = _lsh_bits_np(q_raw, planes)
    if multi_probe:
        flips = 1 << np.arange(n_planes, dtype=np.int64)
        q_probes = np.concatenate(
            [q_buckets[:, None], q_buckets[:, None] ^ flips[None, :]], axis=1
        )  # (n_queries, 1 + n_planes)
    else:
        q_probes = q_buckets[:, None]
    probe_map = _probe_map(q_probes)

    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double")

    def score_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_id_arr = np.asarray(q_ids)
        for pdf in pdfs:
            if pdf.empty:
                continue
            c_raw = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            c_buckets = _lsh_bits_np(c_raw, planes)
            c_mat = _normalized_matrix(c_raw)
            n_ids = pdf[id_col].to_numpy()
            out = _grouped_probe_scores(
                q_mat, q_id_arr, probe_map, c_mat, c_buckets, n_ids, k
            )
            if out is not None:
                yield out

    pruned = corpus.select(id_col, vec_col).mapInPandas(
        score_partition, out_schema
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def knn_join(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    dim: int = 64,
    multi_probe: bool = False,
    max_block: int = 4096,
) -> DataFrame:
    """Fully-DISTRIBUTED approximate kNN join: top-k cosine neighbors per
    query restricted to shared LSH buckets, with NEITHER side collected
    to the driver. This is the corpus-vs-corpus form (`lsh_topk` /
    `brute_force_topk` broadcast the query matrix, which is right for
    serving batches and wrong when the "queries" are themselves a
    data-sized table — linking one crawl snapshot against another, or
    self-joining a corpus for retrieval-augmented labeling).

    Same candidate semantics as ``lsh_topk`` (identical hyperplanes,
    buckets, probes), so the two operators are interchangeable and share
    one oracle; only the physical plan differs.

    Plan shape (100 TB discipline):
    - both sides compute their bucket scan-locally via the deterministic
      ``lsh_signature`` Column expression (whole-stage codegen, no UDF);
      with ``multi_probe`` the QUERY side explodes to the 1 + n_planes
      Hamming-1 probe buckets.
    - per-bucket row counts (<= 2^n_planes rows) broadcast back; hot
      buckets chunk-decompose on BOTH sides so each task's GEMM is
      bounded by ~``max_block``² regardless of bucket skew — the same
      guard as ``semantic_dedup_pairs``. Replication is the block
      nested-loop minimum: each row duplicates once per opposite-side
      chunk of its bucket (1 in the unskewed common case).
    - ONE shuffle co-groups (bucket, qchunk, cchunk) blocks; each block
      GEMMs and emits block-local top-k (with the rounding-quantum
      margin), so the final global ranking window sees O(|Q|·k·chunks)
      rows, never candidate sets.

    CONTRACT: both inputs must be DETERMINISTIC frames — the bucket
    census is collected eagerly (two Spark jobs run when this function
    is CALLED, before any action on the result) and the block frames
    re-evaluate the inputs at execution time, so a ``sample()`` /
    ``rand()``-derived input would census one evaluation and score
    another, silently dropping buckets. Materialize nondeterministic
    inputs (write or localCheckpoint) before calling.
    """
    from pyspark.sql import Window

    qb = queries.select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qvec"),
        lsh_signature(vec_col, n_planes, dim).alias("_b"),
    )
    if multi_probe:
        probes = F.array(
            F.col("_b"),
            *[
                F.col("_b").bitwiseXOR(F.lit(1 << j).cast("long"))
                for j in range(n_planes)
            ],
        )
        qb = qb.withColumn("bucket", F.explode(probes)).drop("_b")
    else:
        qb = qb.withColumnRenamed("_b", "bucket")
    cb = corpus.select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("cvec"),
        lsh_signature(vec_col, n_planes, dim).alias("bucket"),
    )

    # bucket population census: tiny (<= 2^n_planes rows), materialized
    # EAGERLY to a local relation. Each side therefore scans twice (the
    # census agg is map-side-combined and returns a handful of rows, the
    # block frame is the real pass) — deliberately NOT persist(): caching
    # a 100 TB corpus MEMORY_AND_DISK to save one columnar re-scan is a
    # bad trade, and a lazily-shared persist would leak cached blocks
    # past this call in long-lived sessions. Buckets present on only one
    # side drop out of the inner join — a query probing an empty bucket
    # has no candidates there, a corpus row no query probes is never
    # scored.
    sizes_plan = (
        qb.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_qn"))
        .join(
            cb.groupBy("bucket").agg(F.count(F.lit(1)).alias("_cn")),
            "bucket",
        )
        .select(
            "bucket",
            F.greatest(
                F.lit(1), F.ceil(F.col("_qn") / max_block)
            ).cast("int").alias("_nq"),
            F.greatest(
                F.lit(1), F.ceil(F.col("_cn") / max_block)
            ).cast("int").alias("_nc"),
        )
    )
    sizes = queries.sparkSession.createDataFrame(
        sizes_plan.collect(), schema=sizes_plan.schema
    )
    q_blocks = (
        qb.join(F.broadcast(sizes), "bucket")
        .withColumn(
            "qchunk", F.pmod(F.xxhash64("qid"), F.col("_nq")).cast("int")
        )
        .withColumn(
            "cchunk", F.explode(F.sequence(F.lit(0), F.col("_nc") - 1))
        )
        .select("bucket", "qchunk", "cchunk", "qid", "qvec")
    )
    c_blocks = (
        cb.join(F.broadcast(sizes), "bucket")
        .withColumn(
            "cchunk", F.pmod(F.xxhash64("cid"), F.col("_nc")).cast("int")
        )
        .withColumn(
            "qchunk", F.explode(F.sequence(F.lit(0), F.col("_nq") - 1))
        )
        .select("bucket", "qchunk", "cchunk", "cid", "cvec")
    )

    id_field = queries.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double")

    def score_block(qpdf: pd.DataFrame, cpdf: pd.DataFrame) -> pd.DataFrame:
        if qpdf.empty or cpdf.empty:
            return pd.DataFrame(
                {
                    "query_id": np.array([], dtype=object),
                    "neighbor_id": np.array([], dtype=object),
                    "score": np.array([], dtype=np.float64),
                }
            )
        q_ids = qpdf["qid"].to_numpy()
        c_ids = cpdf["cid"].to_numpy()
        qm = _normalized_matrix(
            np.stack(qpdf["qvec"].to_numpy()).astype(np.float64)
        )
        cm = _normalized_matrix(
            np.stack(cpdf["cvec"].to_numpy()).astype(np.float64)
        )
        sc = qm @ cm.T
        sc = np.where(q_ids[:, None] == c_ids[None, :], -np.inf, sc)
        out_q, out_n, out_s = [], [], []
        keep_n = min(k, sc.shape[1])
        for qi in range(sc.shape[0]):
            row = sc[qi]
            kth = np.partition(row, -keep_n)[-keep_n]
            sel = (row >= kth - _ROUND_MARGIN) & np.isfinite(row)
            out_q.append(np.full(int(sel.sum()), q_ids[qi]))
            out_n.append(c_ids[sel])
            out_s.append(row[sel])
        return pd.DataFrame(
            {
                "query_id": np.concatenate(out_q),
                "neighbor_id": np.concatenate(out_n),
                "score": np.concatenate(out_s),
            }
        )

    keys = ["bucket", "qchunk", "cchunk"]
    pruned = (
        q_blocks.groupBy(*keys)
        .cogroup(c_blocks.groupBy(*keys))
        .applyInPandas(score_block, out_schema)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def train_ivf_centroids(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    sample_size: int = 4096,
    n_iters: int = 8,
) -> np.ndarray:
    """Coarse quantizer for IVF: deterministic Lloyd k-means on a bounded,
    deterministically-chosen sample (lowest ids). Driver-side numpy on
    <= sample_size rows — the standard IVF recipe; the full corpus never
    leaves the executors. Returns (n_centroids, dim) float64.
    """
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(sample_size)
        .collect()
    )
    x = np.asarray([r[1] for r in rows], dtype=np.float64)
    n = x.shape[0]
    # deterministic spread init: evenly spaced rows of the sorted sample
    cents = x[np.linspace(0, n - 1, n_centroids).astype(int)].copy()
    for _ in range(n_iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(n_centroids):
            members = x[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, centroid_id, vec) — nearest-centroid assignment, one numpy
    distance computation per Arrow batch.

    Distances use the rank-equivalent ``-2·v·c + |c|²`` form (the
    row-constant |v|² term cannot change the argmin), with centroid
    norms exact-folded and an argmin-boundary guard: rows whose two
    nearest cells are within 1e-9 get their distances recomputed with
    an exact fold, so the cell choice is summation-order-independent —
    a SQL oracle evaluating the same formula picks the same cell.
    """
    import math

    from pyspark.sql.types import IntegerType, StructField, StructType

    id_field = corpus.schema[id_col]
    vec_field = corpus.schema[vec_col]
    schema = StructType(
        [
            StructField(id_col, id_field.dataType, True),
            StructField("centroid_id", IntegerType(), True),
            StructField(vec_col, vec_field.dataType, True),
        ]
    )
    cents = centroids
    cent_norm2 = np.asarray(
        [math.fsum(x * x for x in c) for c in cents]
    )

    def assign(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            c_mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            d = -2.0 * (c_mat @ cents.T) + cent_norm2[None, :]
            if d.shape[1] >= 2:
                near2 = np.partition(d, 1, axis=1)
                for r in np.flatnonzero(near2[:, 1] - near2[:, 0] < 1e-9):
                    d[r] = [
                        -2.0 * math.fsum(c_mat[r] * cents[c])
                        + cent_norm2[c]
                        for c in range(len(cents))
                    ]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "centroid_id": d.argmin(axis=1).astype("int32"),
                    vec_col: pdf[vec_col],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(assign, schema)


def _query_probes(
    q_raw: np.ndarray, centroids: np.ndarray, nprobe: int
) -> np.ndarray:
    """(n_queries, nprobe) probed cell ids: nprobe nearest centroids per
    query, using the same rank-equivalent ``-2·q·c + |c|²`` distances as
    ``ivf_assign``, with a probe-boundary guard — when the nprobe-th and
    (nprobe+1)-th nearest cells are within 1e-9, that query's distances
    are recomputed with an exact fold so the probe cut is summation-
    order-independent. Stable argsort ties break on the lower cell id,
    matching SQL ORDER BY (d, cell)."""
    import math

    cent_norm2 = np.asarray(
        [math.fsum(x * x for x in c) for c in centroids]
    )
    dq = -2.0 * (q_raw @ centroids.T) + cent_norm2[None, :]
    if centroids.shape[0] > nprobe:
        ranked = np.sort(dq, axis=1)
        for qi in np.flatnonzero(
            ranked[:, nprobe] - ranked[:, nprobe - 1] < 1e-9
        ):
            dq[qi] = [
                -2.0 * math.fsum(q_raw[qi] * centroids[c]) + cent_norm2[c]
                for c in range(centroids.shape[0])
            ]
    return np.argsort(dq, axis=1, kind="stable")[:, :nprobe]


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    max_query_batch: int | None = 10_000,
) -> DataFrame:
    """IVF approximate top-k: each query scores only corpus vectors whose
    cell is among its ``nprobe`` nearest centroids. With nprobe ==
    n_centroids this is EXACTLY brute force (tested); with nprobe << it
    scans ~nprobe/n_centroids of the corpus — the data-adapted scale path
    (vs data-oblivious hyperplane LSH). Each Arrow batch is grouped by
    cell and only probed cells are GEMMed, so per-batch compute tracks
    the nprobe/n_centroids fraction rather than the full batch.
    ``max_query_batch`` enforces the broadcast-sized query contract
    (see _collect_query_batch; knn_join is the corpus-vs-corpus path).
    """
    from pyspark.sql import Window

    # guarded collect FIRST so an oversized batch fails before paying
    # centroid training
    q_rows = _collect_query_batch(
        queries, [id_col, vec_col], max_query_batch, "ivf_topk"
    )
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, id_col, vec_col, n_centroids=n_centroids
        )
    import math

    q_ids = [r[0] for r in q_rows]
    q_raw = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    q_mat = _normalized_matrix(q_raw)
    probes = _query_probes(q_raw, centroids, nprobe)
    probe_map = _probe_map(probes)

    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double")

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    def score_partition(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_id_arr = np.asarray(q_ids)
        for pdf in pdfs:
            if pdf.empty:
                continue
            c_mat = _normalized_matrix(
                np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            )
            cells = pdf["centroid_id"].to_numpy().astype(np.int64)
            n_ids = pdf[id_col].to_numpy()
            out = _grouped_probe_scores(
                q_mat, q_id_arr, probe_map, c_mat, cells, n_ids, k
            )
            if out is not None:
                yield out

    pruned = assigned.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


PQ_SEED_BASE = 300


def pq_codebook(
    n_sub: int = 8, n_codes: int = 16, sub_dim: int = 8
) -> np.ndarray:
    """Fixed (n_sub, n_codes, sub_dim) product-quantization codebook from
    the md5-derived ``hyperplane`` generator — deterministic, engine-
    independent, embeddable as SQL literals for oracle checking (the same
    trick as ``ann_ivf_fixed``'s centroids). A production deployment
    would train the codebook with k-means per subspace; the mechanism
    (encode, LUT build, ADC scan) is identical either way.
    """
    return np.asarray(
        [
            [
                hyperplane(PQ_SEED_BASE + s * n_codes + c, sub_dim)
                for c in range(n_codes)
            ]
            for s in range(n_sub)
        ],
        dtype=np.float64,
    )


def _codebook_norm2(codebook: np.ndarray) -> np.ndarray:
    """(n_sub, n_codes) exact-folded codeword norms for the
    rank-equivalent ``-2·v·c + |c|²`` assignment distances."""
    import math

    n_sub, n_codes, _ = codebook.shape
    return np.asarray(
        [
            [math.fsum(x * x for x in codebook[s, c]) for c in range(n_codes)]
            for s in range(n_sub)
        ]
    )


def _pq_codes(
    mat: np.ndarray, codebook: np.ndarray, cb_norm2: np.ndarray
) -> np.ndarray:
    """(n, n_sub) per-subspace nearest-codeword ids with the shared
    argmin-boundary guard: rows whose two nearest codewords sit within
    1e-9 are recomputed with an exact fold, so code choice is
    summation-order-independent (a SQL oracle evaluating the same
    formula picks the same codeword); ties break on the lower codeword
    id (stable argmin, matching ORDER BY (d, code))."""
    import math

    n_sub, n_codes, sub_dim = codebook.shape
    codes = np.empty((len(mat), n_sub), dtype=np.int64)
    for s in range(n_sub):
        sub = mat[:, s * sub_dim : (s + 1) * sub_dim]
        d = -2.0 * (sub @ codebook[s].T) + cb_norm2[s][None, :]
        if n_codes >= 2:
            near2 = np.partition(d, 1, axis=1)
            for r in np.flatnonzero(near2[:, 1] - near2[:, 0] < 1e-9):
                d[r] = [
                    -2.0 * math.fsum(sub[r] * codebook[s, c])
                    + cb_norm2[s, c]
                    for c in range(n_codes)
                ]
        codes[:, s] = d.argmin(axis=1)
    return codes


def pq_encode(
    corpus: DataFrame,
    codebook: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes) — per-subspace nearest-codeword assignment (the PQ
    compressed representation: ``n_sub`` small ints instead of ``dim``
    floats — 8 bytes replacing 512 at the default geometry, the memory
    win that lets a 100 TB embedding corpus fit a cluster's RAM).

    Scan-local: one numpy distance computation per (Arrow batch,
    subspace); no shuffle. Assignment uses the rank-equivalent
    ``-2·v·c + |c|²`` distances with exact-folded codeword norms and the
    same argmin-boundary guard as ``ivf_assign``, so a SQL oracle
    evaluating the same formula picks the same codeword; ties break on
    the lower codeword id (stable argmin, matching ORDER BY (d, code)).
    """
    from pyspark.sql.types import ArrayType, IntegerType

    cb_norm2 = _codebook_norm2(codebook)
    id_field = corpus.schema[id_col]
    schema = StructType(
        [id_field.__class__(id_col, id_field.dataType, True)]
    ).add("codes", ArrayType(IntegerType()))

    def encode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = _pq_codes(mat, codebook, cb_norm2).astype(np.int32)
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes)}
            )

    return corpus.select(id_col, vec_col).mapInPandas(encode, schema)


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_sub: int = 8,
    n_codes: int = 16,
    codebook: np.ndarray | None = None,
    max_query_batch: int | None = 10_000,
) -> DataFrame:
    """Product-quantization approximate top-k by inner product (ADC —
    asymmetric distance computation, Jégou et al., TPAMI 2011):
    (query_id, neighbor_id, score, rnk).

    EXHAUSTIVE-SCAN GUARD: ADC scores every (query, code) pair, so
    this operator is a serving-batch primitive — quadratic when the
    query batch grows with the corpus (measured: 86.8 s at the x100
    ramp tier with |Q| = n/20, SCALING.md). ``max_query_batch``
    (default 10k) raises past that point instead of trusting the
    docstring; the scale paths are ``ivfpq_topk`` (probed cells only)
    and ``knn_join`` (corpus-vs-corpus, neither side collected). Pass
    ``max_query_batch=None`` only for a deliberate exhaustive baseline
    (the SCALING.md negative-result row does).

    The corpus is PQ-encoded (scan-local, ``n_sub`` bytes per vector);
    each query precomputes a (n_sub × n_codes) lookup table of partial
    dot products against the codebook, and every candidate scores as
    ``n_sub`` LUT gathers instead of a ``dim``-wide dot — 8× less
    compute and 64× less memory traffic than the brute-force scan at
    the default geometry. This is the memory-compression axis of the
    ANN family (vs hyperplane LSH's bucketing and IVF's cell pruning);
    compose with IVF for compute pruning on top.

    ``queries`` must be broadcast-sized (collected like a broadcast
    join's build side); the corpus is never shuffled at full width —
    only (query_id, neighbor_id, score) survivors of the batch-local
    top-k prune reach the ranking shuffle.
    """
    from pyspark.sql import Window

    if codebook is None:
        codebook = pq_codebook(n_sub=n_sub, n_codes=n_codes)
    n_sub, n_codes, sub_dim = codebook.shape

    q_rows = _collect_query_batch(
        queries,
        [id_col, vec_col],
        max_query_batch,
        "pq_topk",
        reason=(
            "exhaustive ADC scores every (query, code) pair and goes "
            "quadratic when |Q| grows with the corpus (measured in "
            "SCALING.md). Use ivfpq_topk (probed cells only) or "
            "knn_join (corpus-vs-corpus)"
        ),
    )
    q_ids = np.asarray([r[0] for r in q_rows])
    q_raw = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    # LUT[qi, s, c] = dot(q_sub, codeword) — the per-query ADC table
    lut = np.einsum(
        "qsd,scd->qsc",
        q_raw.reshape(len(q_raw), n_sub, sub_dim),
        codebook,
    )

    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double")

    encoded = pq_encode(corpus, codebook, id_col, vec_col)

    def score_partition(
        pdfs: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            codes = np.stack(pdf["codes"].to_numpy())  # (n, n_sub)
            n_ids = pdf[id_col].to_numpy()
            # gather: scores[qi, n] = sum_s LUT[qi, s, codes[n, s]]
            scores = np.zeros((len(q_ids), len(n_ids)))
            for s in range(n_sub):
                scores += lut[:, s, codes[:, s]]
            scores = np.where(
                q_ids[:, None] == n_ids[None, :], -np.inf, scores
            )
            keep = min(k, scores.shape[1])
            kth = np.partition(scores, -keep, axis=1)[:, -keep]
            out_q, out_n, out_s = [], [], []
            for qi in range(scores.shape[0]):
                row = scores[qi]
                sel = (row >= (kth[qi] - _ROUND_MARGIN)) & np.isfinite(row)
                out_q.append(np.full(sel.sum(), q_ids[qi]))
                out_n.append(n_ids[sel])
                out_s.append(row[sel])
            yield pd.DataFrame(
                {
                    "query_id": np.concatenate(out_q),
                    "neighbor_id": np.concatenate(out_n),
                    "score": np.concatenate(out_s),
                }
            )

    pruned = encoded.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def _adc_block_scores(
    codes: np.ndarray,
    cells: np.ndarray,
    n_ids: np.ndarray,
    lut: np.ndarray,
    probe_map: dict[int, np.ndarray],
    q_ids: np.ndarray,
    k: int,
) -> pd.DataFrame | None:
    """ADC scoring of one Arrow batch of PQ codes against the per-query
    LUTs, restricted to probed (query-group, cell-group) blocks, with
    the batch-local top-k prune. Shared by ``ivfpq_topk`` (codes built
    in-batch) and ``search_ivfpq_index`` (codes read from the persisted
    index). Returns the pruned (query_id, neighbor_id, score) frame, or
    None when the batch contributes nothing."""
    n_sub = codes.shape[1]
    order = np.argsort(cells, kind="stable")
    sorted_cells = cells[order]
    uniq, starts = np.unique(sorted_cells, return_index=True)
    bounds = np.append(starts, len(sorted_cells))
    q_parts, n_parts, s_parts = [], [], []
    for gi in range(len(uniq)):
        q_sel = probe_map.get(int(uniq[gi]))
        if q_sel is None:
            continue
        c_idx = order[starts[gi] : bounds[gi + 1]]
        g_codes = codes[c_idx]  # (|C_g|, n_sub)
        lut_g = lut[q_sel]  # (|Q_g|, n_sub, n_codes)
        sub_scores = np.zeros((len(q_sel), len(c_idx)))
        for s in range(n_sub):
            sub_scores += lut_g[:, s, :][:, g_codes[:, s]]
        ids_g = n_ids[c_idx]
        sub_scores = np.where(
            q_ids[q_sel][:, None] == ids_g[None, :],
            -np.inf,
            sub_scores,
        )
        q_parts.append(np.repeat(q_sel, len(c_idx)))
        n_parts.append(np.tile(c_idx, len(q_sel)))
        s_parts.append(sub_scores.ravel())
    if not q_parts:
        return None
    qi_all = np.concatenate(q_parts)
    ci_all = np.concatenate(n_parts)
    sc_all = np.concatenate(s_parts)
    finite = np.isfinite(sc_all)
    qi_all, ci_all, sc_all = (
        qi_all[finite],
        ci_all[finite],
        sc_all[finite],
    )
    if not len(sc_all):
        return None
    srt = np.lexsort((-sc_all, qi_all))
    qs, ss = qi_all[srt], sc_all[srt]
    grp_starts = np.flatnonzero(np.r_[True, qs[1:] != qs[:-1]])
    grp_ends = np.r_[grp_starts[1:], len(qs)]
    keep = np.zeros(len(qs), dtype=bool)
    for s0, s1 in zip(grp_starts, grp_ends):
        kk = min(k, s1 - s0)
        keep[s0:s1] = ss[s0:s1] >= ss[s0 + kk - 1] - _ROUND_MARGIN
    sel = srt[keep]
    return pd.DataFrame(
        {
            "query_id": q_ids[qi_all[sel]],
            "neighbor_id": n_ids[ci_all[sel]],
            "score": sc_all[sel],
        }
    )


def ivfpq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    centroids: np.ndarray | None = None,
    codebook: np.ndarray | None = None,
    n_sub: int = 8,
    n_codes: int = 16,
    max_query_batch: int | None = 10_000,
) -> DataFrame:
    """IVF × PQ composition — the standard billion-scale ANN index shape
    (FAISS ``IVFx,PQy``): IVF prunes COMPUTE (each query touches only its
    ``nprobe`` nearest cells), PQ prunes MEMORY (candidates score via
    ``n_sub`` LUT gathers on 8-byte codes instead of 512-byte vectors).
    Inner-product ADC, no residual encoding — cells and codes both come
    from the raw vectors, which keeps every stage value-checkable in SQL
    when centroids/codebook are fixed.

    One fused mapInPandas pass per batch: assign -> encode -> score only
    probed (query-group, cell-group) blocks -> batch-local top-k prune.
    Per-batch compute tracks nprobe/n_centroids like ``ivf_topk``; the
    ranking shuffle sees only pruned (query, neighbor, score) longs.
    """
    from pyspark.sql import Window

    if centroids is None:
        raise ValueError("ivfpq_topk requires fixed centroids")
    if codebook is None:
        codebook = pq_codebook(n_sub=n_sub, n_codes=n_codes)
    n_sub, n_codes, sub_dim = codebook.shape

    q_rows = _collect_query_batch(
        queries, [id_col, vec_col], max_query_batch, "ivfpq_topk"
    )
    q_ids = np.asarray([r[0] for r in q_rows])
    q_raw = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    lut = np.einsum(
        "qsd,scd->qsc",
        q_raw.reshape(len(q_raw), n_sub, sub_dim),
        codebook,
    )
    # probe selection: identical boundary-guarded form as ivf_topk
    probes = _query_probes(q_raw, centroids, nprobe)
    probe_map = _probe_map(probes)
    cb_norm2 = _codebook_norm2(codebook)

    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double")

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    def score_partition(
        pdfs: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            cells = pdf["centroid_id"].to_numpy().astype(np.int64)
            n_ids = pdf[id_col].to_numpy()
            # PQ-encode the batch (same guarded argmin as pq_encode)
            codes = _pq_codes(mat, codebook, cb_norm2)
            out = _adc_block_scores(
                codes, cells, n_ids, lut, probe_map, q_ids, k
            )
            if out is not None:
                yield out

    pruned = assigned.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        pruned.withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    n_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: same-LSH-bucket candidates
    with cosine >= threshold. Returns (id_a, id_b, score), id_a < id_b.

    The bucket key blocks the self-join (equi-join, AQE-skew-safe); only
    candidate pairs pay the exact cosine. With n_planes=8 a corpus of N
    vectors in ~2^8 buckets costs ~N^2/256 comparisons instead of N^2.
    Bucket assignment runs as a numpy GEMM per Arrow batch (bit-exact
    with the Column-expression path via the exact-fold guard).
    """
    planes = _hyperplane_matrix(n_planes, dim)
    id_field = df.schema[id_col]
    vec_field = df.schema[vec_col]
    tag_schema = StructType(
        [
            id_field.__class__(id_col, id_field.dataType, True),
            vec_field.__class__(vec_col, vec_field.dataType, True),
        ]
    ).add("bucket", "long")

    def tag(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    vec_col: pdf[vec_col],
                    "bucket": _lsh_bits_np(mat, planes),
                }
            )

    tagged = df.select(id_col, vec_col).mapInPandas(tag, tag_schema)
    a = tagged.select(
        F.col(id_col).alias("id_a"),
        F.col(vec_col).alias("vec_a"),
        "bucket",
    )
    b = tagged.select(
        F.col(id_col).alias("id_b"),
        F.col(vec_col).alias("vec_b"),
        "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int | None = 16,
    threshold: float = 0.9,
    centroids: np.ndarray | None = None,
    max_cluster_size: int = 4096,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    partition the corpus by nearest k-means centroid, then compare pairs
    EXACTLY — full pairwise cosine — but only within a cluster. The
    data-adapted complement to hyperplane LSH: recall follows cluster
    structure instead of random projections.

    Returns (id_a, id_b, score) with id_a < id_b and rounded score >=
    ``threshold``.

    Scale shape: one shuffle on centroid_id; each cluster is scored by
    numpy GEMMs inside ``applyInPandas``. Skewed clusters are the known
    SemDeDup failure mode — AQE cannot split a single group — so clusters
    larger than ``max_cluster_size`` are block-decomposed: members hash
    into ``ceil(n / max_cluster_size)`` chunks and every chunk pair
    (ca <= cb) becomes its own task key. Each pair of members is scored
    in exactly one block, so the result is identical to the unsplit
    computation while per-task compute and memory are bounded by
    ~``max_cluster_size``^2 regardless of skew. Rows replicate by their
    cluster's chunk count (1 for non-skewed clusters, so the common case
    pays nothing).

    FIXED-k IS A SCALE CLIFF: with k held constant, per-cluster size
    grows as n/k, so total pair work grows ~n²/k (measured: the k=16
    registry query's x100→x300 exponent is 1.08, SCALING.md). Pass
    ``n_centroids=None`` for the production AUTO mode — k =
    max(16, ceil(sqrt(n))) — which holds expected per-cluster size to
    ~sqrt(n) and total pair work to ~n·sqrt(n)/1 growth (the standard
    SemDeDup deployment rule). The registry query keeps k=16 so its
    oracle can re-train the same model in SQL.
    """
    import math

    from pyspark.sql.types import DoubleType, StructField

    if centroids is None:
        if n_centroids is None:
            # auto-k: one count() action, paid only in auto mode
            n_centroids = max(16, math.ceil(math.sqrt(corpus.count())))
        centroids = train_ivf_centroids(
            corpus,
            id_col,
            vec_col,
            n_centroids=n_centroids,
            # the trainer samples the lowest ids; keep the sample a few
            # times larger than k so auto-k on a huge corpus never
            # degenerates into duplicate seed centroids
            sample_size=max(4096, 4 * n_centroids),
        )
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)

    # `assigned` feeds two DAG branches: the tiny cluster-size aggregate
    # and the pair scoring. The aggregate re-runs the (cheap, scan-local)
    # assignment rather than persisting the full vector width — measured
    # faster at bench scale; a production pipeline that materializes the
    # cluster assignment to storage (as SemDeDup runs do) drops the
    # second pass for free.
    counts = assigned.groupBy("centroid_id").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    chunked = (
        assigned.join(F.broadcast(counts), "centroid_id")
        .withColumn(
            "_nchunks",
            F.greatest(
                F.lit(1),
                F.ceil(F.col("_cnt") / F.lit(max_cluster_size)),
            ).cast("int"),
        )
        .withColumn(
            "chunk",
            F.pmod(F.xxhash64(F.col(id_col)), F.col("_nchunks")).cast("int"),
        )
        # replicate each row into every block (ca, cb) that contains its
        # chunk: ca = min(chunk, j), cb = max(chunk, j) for j in 0..n-1
        .withColumn(
            "_block",
            F.explode(
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(0), F.col("_nchunks") - 1),
                        lambda j: F.struct(
                            F.least(F.col("chunk"), j).alias("ca"),
                            F.greatest(F.col("chunk"), j).alias("cb"),
                        ),
                    )
                )
            ),
        )
        .select(
            "centroid_id",
            F.col("_block.ca").alias("ca"),
            F.col("_block.cb").alias("cb"),
            "chunk",
            id_col,
            vec_col,
        )
    )

    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            StructField("id_a", id_field.dataType, True),
            StructField("id_b", id_field.dataType, True),
            StructField("score", DoubleType(), True),
        ]
    )
    thr = threshold
    _EMPTY_PAIRS = pd.DataFrame(
        {
            "id_a": np.array([], dtype=np.int64),
            "id_b": np.array([], dtype=np.int64),
            "score": np.array([], dtype=np.float64),
        }
    )

    def block_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        _, ca, cb = key
        a = pdf[pdf["chunk"] == ca].sort_values(id_col)
        ids_a = a[id_col].to_numpy()
        if not len(a):
            return _EMPTY_PAIRS.copy()
        ma = _normalized_matrix(
            np.stack(a[vec_col].to_numpy()).astype(np.float64)
        )
        if ca == cb:
            ia, ib = np.triu_indices(len(a), 1)
            sc = np.round((ma @ ma.T)[ia, ib], 6)
            keep = sc >= thr
            id_lo, id_hi = ids_a[ia[keep]], ids_a[ib[keep]]
        else:
            b = pdf[pdf["chunk"] == cb].sort_values(id_col)
            if not len(b):
                return _EMPTY_PAIRS.copy()
            ids_b = b[id_col].to_numpy()
            mb = _normalized_matrix(
                np.stack(b[vec_col].to_numpy()).astype(np.float64)
            )
            sc = np.round(ma @ mb.T, 6)
            ia, ib = np.nonzero(sc >= thr)
            sc = sc[ia, ib]
            keep = slice(None)
            left, right = ids_a[ia], ids_b[ib]
            id_lo = np.minimum(left, right)
            id_hi = np.maximum(left, right)
        return pd.DataFrame(
            {"id_a": id_lo, "id_b": id_hi, "score": sc[keep]}
        )

    return chunked.groupBy("centroid_id", "ca", "cb").applyInPandas(
        block_pairs, out_schema
    )


def random_projection(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out_dim: int = 8,
    dim: int = 64,
    seed_base: int = 100,
) -> DataFrame:
    """Johnson-Lindenstrauss-style dimensionality reduction: project each
    embedding onto ``out_dim`` deterministic md5-derived directions (the
    same portable-plane convention as LSH, offset by ``seed_base`` so the
    two families never share planes). The standard cheap pre-step before
    clustering / coarse ANN when the native dimension is large.

    Output: (id, p0..p{out_dim-1}) with components rounded to 6dp.

    Scale: one numpy GEMM per Arrow batch inside ``mapInPandas`` —
    scan-local, zero shuffles, projection matrix embedded in the closure
    (out_dim x dim doubles, broadcast-sized by construction). Components
    within 1e-9 of a 6dp rounding boundary are recomputed with an exact
    fold so the rounded value is summation-order-independent (same guard
    as ``_lsh_bits_np``).
    """
    import math

    planes = np.asarray(
        [hyperplane(seed_base + j, dim) for j in range(out_dim)],
        dtype=np.float64,
    )
    id_field = df.schema[id_col]
    out_schema = StructType(
        [id_field.__class__(id_col, id_field.dataType, True)]
    )
    for j in range(out_dim):
        out_schema = out_schema.add(f"p{j}", "double")

    def project(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            proj = mat @ planes.T  # (n, out_dim)
            # exact-fold guard at the rounding boundary
            scaled = proj * 1e6
            near = np.argwhere(
                np.abs(scaled - np.floor(scaled) - 0.5) < 1e-3
            )
            for r, j in near:
                proj[r, j] = math.fsum(mat[r] * planes[j])
            proj = np.round(proj, 6)
            out = {id_col: pdf[id_col]}
            for j in range(out_dim):
                out[f"p{j}"] = proj[:, j]
            yield pd.DataFrame(out)

    return df.select(id_col, vec_col).mapInPandas(project, out_schema)


# ---------------------------------------------------------------------------
# IVF index persistence: build once, search many. The inverted lists are
# written PARTITIONED BY centroid_id, so a search's cell filter becomes
# directory-level partition pruning — the probe reads ~nprobe/n_centroids
# of the index from disk, the storage-side analogue of the grouped-GEMM
# compute pruning above. Centroids ride along as a tiny parquet so the
# index is self-contained (no retraining, no driver memo needed across
# processes).
# ---------------------------------------------------------------------------


def save_ivf_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Train (or take) centroids, assign every corpus vector to its
    cell, and persist both halves: ``<path>/cells`` (inverted lists,
    partitioned by centroid_id) and ``<path>/centroids``. Returns the
    centroid matrix. Build cost = one assignment pass over the corpus +
    one shuffle-free partitioned write."""
    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, id_col, vec_col, n_centroids=n_centroids
        )
    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    (
        assigned.write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path + "/cells")
    )
    cent_rows = [
        (int(i), [float(v) for v in c]) for i, c in enumerate(centroids)
    ]
    (
        spark.createDataFrame(
            cent_rows, "centroid_id int, centroid array<double>"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "/centroids")
    )
    return centroids


def load_ivf_index(spark, path: str) -> tuple[np.ndarray, DataFrame]:
    """(centroids, cells): the persisted index halves. The cells frame
    keeps its centroid_id partition column for pruned probes."""
    cent_rows = (
        spark.read.parquet(path + "/centroids")
        .orderBy("centroid_id")
        .collect()
    )
    centroids = np.asarray([r.centroid for r in cent_rows], dtype=np.float64)
    cells = spark.read.parquet(path + "/cells")
    return centroids, cells


def search_ivf_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    max_query_batch: int | None = 10_000,
) -> DataFrame:
    """IVF top-k against a PERSISTED index: the union of all queries'
    probed cells becomes an ``isin`` filter on the partition column, so
    the scan touches only those directories (partition pruning — no
    other file of the index is opened), then the standard grouped-probe
    scoring runs on the survivors. Identical results to ``ivf_topk``
    over the full corpus with the same centroids, because rows outside
    probed cells can never be scored. ``max_query_batch`` enforces the
    broadcast-sized serving-batch contract (see _collect_query_batch)."""
    centroids, cells = load_ivf_index(spark, path)
    q_rows = _collect_query_batch(
        queries, [id_col, vec_col], max_query_batch, "search_ivf_index"
    )
    q_raw = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    probes = _query_probes(q_raw, centroids, nprobe)
    probed = sorted({int(c) for row in probes for c in row})
    pruned = cells.filter(
        F.col("centroid_id").isin(probed)
    ).select(id_col, vec_col)
    return ivf_topk(
        queries,
        pruned,
        id_col,
        vec_col,
        k=k,
        n_centroids=centroids.shape[0],
        nprobe=nprobe,
        centroids=centroids,
        max_query_batch=None,  # already guarded above — skip the re-probe
    )


def save_ivfpq_index(
    corpus: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    centroids: np.ndarray | None = None,
    codebook: np.ndarray | None = None,
    n_sub: int = 8,
    n_codes: int = 16,
) -> tuple[np.ndarray, np.ndarray]:
    """Build-once half of the compressed-index serving pair (the IVFPQ
    sibling of ``save_ivf_index``): train (or take) coarse centroids and
    a PQ codebook, assign + PQ-encode every corpus vector in ONE
    pipelined scan (two chained mapInPandas stages, no shuffle), and
    persist three parts: ``<path>/codes`` — (id, codes) inverted lists
    partitioned by centroid_id, where the ``n_sub`` uint8-sized codes
    REPLACE the raw vectors (the PQ memory win: the on-disk index is
    ~64x smaller than the embedding column at the default geometry, the
    difference between a 100 TB corpus's index fitting a cluster's RAM
    or not) — plus ``<path>/centroids`` and ``<path>/codebook``.
    Returns (centroids, codebook)."""
    from pyspark.sql.types import ArrayType, IntegerType

    spark = corpus.sparkSession
    if centroids is None:
        centroids = train_ivf_centroids(
            corpus, id_col, vec_col, n_centroids=n_centroids
        )
    if codebook is None:
        codebook = pq_codebook(n_sub=n_sub, n_codes=n_codes)
    n_sub, n_codes, sub_dim = codebook.shape
    cb_norm2 = _codebook_norm2(codebook)

    assigned = ivf_assign(corpus, centroids, id_col, vec_col)
    id_field = corpus.schema[id_col]
    enc_schema = (
        StructType([id_field.__class__(id_col, id_field.dataType, True)])
        .add("codes", ArrayType(IntegerType()))
        .add("centroid_id", IntegerType())
    )

    def encode(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            codes = _pq_codes(mat, codebook, cb_norm2).astype(np.int32)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(codes),
                    "centroid_id": pdf["centroid_id"],
                }
            )

    (
        assigned.mapInPandas(encode, enc_schema)
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path + "/codes")
    )
    cent_rows = [
        (int(i), [float(v) for v in c]) for i, c in enumerate(centroids)
    ]
    (
        spark.createDataFrame(
            cent_rows, "centroid_id int, centroid array<double>"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "/centroids")
    )
    cb_rows = [
        (int(s), int(c), [float(x) for x in codebook[s, c]])
        for s in range(n_sub)
        for c in range(n_codes)
    ]
    (
        spark.createDataFrame(cb_rows, "s int, c int, w array<double>")
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(path + "/codebook")
    )
    return centroids, codebook


def load_ivfpq_index(
    spark, path: str
) -> tuple[np.ndarray, np.ndarray, DataFrame]:
    """(centroids, codebook, codes): the persisted IVFPQ index parts.
    The codes frame keeps its centroid_id partition column for pruned
    probes; raw vectors are not part of the index at all."""
    cent_rows = (
        spark.read.parquet(path + "/centroids")
        .orderBy("centroid_id")
        .collect()
    )
    centroids = np.asarray([r.centroid for r in cent_rows], dtype=np.float64)
    cb_rows = (
        spark.read.parquet(path + "/codebook").orderBy("s", "c").collect()
    )
    n_sub = 1 + max(r.s for r in cb_rows)
    n_codes = 1 + max(r.c for r in cb_rows)
    codebook = np.asarray(
        [r.w for r in cb_rows], dtype=np.float64
    ).reshape(n_sub, n_codes, -1)
    codes = spark.read.parquet(path + "/codes")
    return centroids, codebook, codes


def search_ivfpq_index(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    nprobe: int = 4,
    max_query_batch: int | None = 10_000,
) -> DataFrame:
    """Serve-many half: IVFPQ top-k against the PERSISTED index. The
    union of the queries' probed cells becomes an ``isin`` filter on the
    partition column (directory-level pruning — unprobed inverted lists
    are never opened), and the survivors score as pure ADC LUT gathers
    on the PRE-COMPUTED codes: serving never re-assigns or re-encodes
    the corpus, and never reads a raw vector. Identical results to
    ``ivfpq_topk`` with the same centroids/codebook, because assignment
    and encoding are deterministic (boundary-guarded argmins) and rows
    outside probed cells can never score."""
    from pyspark.sql import Window

    centroids, codebook, codes = load_ivfpq_index(spark, path)
    n_sub, n_codes, sub_dim = codebook.shape
    q_rows = _collect_query_batch(
        queries, [id_col, vec_col], max_query_batch, "search_ivfpq_index"
    )
    q_ids = np.asarray([r[0] for r in q_rows])
    q_raw = np.asarray([r[1] for r in q_rows], dtype=np.float64)
    lut = np.einsum(
        "qsd,scd->qsc",
        q_raw.reshape(len(q_raw), n_sub, sub_dim),
        codebook,
    )
    probes = _query_probes(q_raw, centroids, nprobe)
    probe_map = _probe_map(probes)
    probed = sorted({int(c) for row in probes for c in row})
    pruned = codes.filter(F.col("centroid_id").isin(probed))

    id_field = codes.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double")

    def score_partition(
        pdfs: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            if pdf.empty:
                continue
            code_mat = np.stack(pdf["codes"].to_numpy()).astype(np.int64)
            cells = pdf["centroid_id"].to_numpy().astype(np.int64)
            n_ids = pdf[id_col].to_numpy()
            out = _adc_block_scores(
                code_mat, cells, n_ids, lut, probe_map, q_ids, k
            )
            if out is not None:
                yield out

    scored = pruned.mapInPandas(score_partition, out_schema)
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("score", F.round("score", 6))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
    )


def mmr_topk(
    queries: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    fetch_k: int = 10,
    lam: float = 0.5,
) -> DataFrame:
    """Maximal-marginal-relevance diversified top-k (Carbonell &
    Goldstein, SIGIR'98): (query_id, neighbor_id, score, mmr_rank).
    Greedily selects ``k`` of the ``fetch_k`` most relevant candidates,
    each step taking the candidate maximizing
    ``score - lam * max(sim to already-selected)`` — the standard
    redundancy-suppressing re-rank for RAG context assembly and diverse
    few-shot mining (near-duplicate passages stop crowding out the
    second topic).

    Scale shape: stage 1 is the candidate-bounded ``brute_force_topk``
    (one corpus pass, queries broadcast-sized); stage 2 joins the
    |Q|*fetch_k candidate ids back to the corpus for their vectors with
    the CANDIDATE side broadcast (the corpus is never shuffled), then
    the greedy loop runs per query over fetch_k rows in one
    ``applyInPandas`` — per-group work is O(fetch_k^2 * k), independent
    of corpus size. Scores and pairwise sims round to 6 decimals before
    the objective on BOTH engines (oracle parity); ties break on the
    smaller neighbor id.
    """
    cand = brute_force_topk(
        queries, corpus, id_col, vec_col, k=fetch_k
    ).select("query_id", "neighbor_id", "score")
    return mmr_rerank(cand, corpus, id_col, vec_col, k=k, lam=lam)


def mmr_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    lam: float = 0.5,
    broadcast_candidates: bool = True,
) -> DataFrame:
    """The greedy MMR stage over an ALREADY-GENERATED candidate frame
    (query_id, neighbor_id, score) — compose with any candidate
    generator: ``brute_force_topk`` (serving batches — ``mmr_topk`` is
    that composition), ``knn_join`` (fully distributed: neither side
    collected, so MMR works when the "queries" are a data-sized table),
    or a hybrid retriever's fused list.

    ``broadcast_candidates`` pins the candidates-to-vectors join to a
    broadcast (right for |Q|*fetch_k in the thousands); pass False for
    data-sized candidate frames (knn_join output) — the join becomes a
    narrow shuffle join on the id and AQE still broadcasts when the
    candidate side turns out small.
    """
    cand = candidates.select("query_id", "neighbor_id", "score")
    if broadcast_candidates:
        cand = F.broadcast(cand)
    with_vec = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v")
    ).join(cand, "neighbor_id")

    id_field = corpus.schema[id_col]
    out_schema = StructType(
        [
            id_field.__class__("query_id", id_field.dataType, True),
            id_field.__class__("neighbor_id", id_field.dataType, True),
        ]
    ).add("score", "double").add("mmr_rank", "integer")

    def greedy(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf["neighbor_id"].to_numpy()
        scores = pdf["score"].to_numpy(dtype=np.float64)  # round6 already
        mat = _normalized_matrix(
            np.stack(pdf["_v"].to_numpy()).astype(np.float64)
        )
        sims = np.round(mat @ mat.T, 6)
        selected: list[int] = []
        remaining = set(range(len(ids)))
        for _ in range(min(k, len(ids))):
            if selected:
                maxsim = sims[:, selected].max(axis=1)
                obj = scores - lam * maxsim
            else:
                obj = scores
            best = min(remaining, key=lambda i: (-obj[i], ids[i]))
            selected.append(best)
            remaining.discard(best)
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].to_numpy()[selected],
                "neighbor_id": ids[selected],
                "score": scores[selected],
                "mmr_rank": np.arange(1, len(selected) + 1, dtype=np.int32),
            }
        )

    return with_vec.groupBy("query_id").applyInPandas(greedy, out_schema)


def standardize_embeddings(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Per-dimension z-scores: (id, dim, z) with z = (x - mean_d)/std_d
    over the whole corpus — the whitening-lite step that stops a few
    high-variance dimensions from dominating cosine/L2 before ANN.

    Scale shape: one posexplode feeding a per-dimension aggregate
    (map-side combinable — only |dims| rows per task cross the wire),
    then the |dims|-row stats frame broadcasts back onto the exploded
    scan. z rounds to 6 decimals so cross-engine summation-order drift
    in the means cannot flip the comparison.
    """
    ex = df.select(
        F.col(id_col),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        id_col,
        (F.col("pos") + 1).alias("dim"),
        F.col("x").cast("double").alias("x"),
    )
    stats = ex.groupBy("dim").agg(
        F.avg("x").alias("mu"),
        F.avg(F.col("x") * F.col("x")).alias("ex2"),
    ).select(
        "dim",
        "mu",
        F.sqrt(F.col("ex2") - F.col("mu") * F.col("mu")).alias("sd"),
    )
    return ex.join(F.broadcast(stats), "dim").select(
        id_col,
        F.col("dim").cast("long").alias("dim"),
        F.round((F.col("x") - F.col("mu")) / F.col("sd"), 6).alias("z"),
    )


def kmeans_train_exact(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 8,
    iters: int = 3,
) -> DataFrame:
    """Deterministic cross-engine Lloyd's k-means: (cid, dim, coord,
    n_assigned) after ``iters`` assign/update rounds.

    Every source of nondeterminism is pinned so a SQL engine can re-train
    the SAME model bit-for-bit: seeds are the k vectors with the smallest
    md5('kminit:'||id) (content-independent, order-independent);
    assignment breaks distance ties on the lowest centroid id; and the
    centroid means are ROUNDED TO 6 DECIMALS at every iteration boundary,
    so float summation-order drift (Spark's partial aggregation vs the
    oracle's group sum) is killed each round instead of compounding
    across rounds — the iteration-boundary extension of the
    standardize_embeddings rounding rule. Raw assignment distances stay
    unrounded: two centroids would need to sit within ~1e-12 of the same
    distance for engine drift to flip an argmin.

    This is the CORRECTNESS ANCHOR for trained clustering (the rows-only
    ann_ivf_topk trains the same Lloyd's via the numpy batch path);
    per-iteration cost is one exploded-dims shuffle for the means plus a
    broadcast of the (k x dim) centroid frame — linear in rows, fine for
    eval-sized corpora, while production training stays on the GEMM
    kernel in ivf_build.
    """
    from pyspark.sql import Window

    if iters < 1:
        # `assign` only materializes inside the loop; with zero rounds
        # there is no assignment to size clusters from (and "trained with
        # zero iterations" is a caller bug, not a degenerate model)
        raise ValueError(f"kmeans_train_exact needs iters >= 1, got {iters}")
    # localCheckpoint, not persist: the exploded frame is read ~2x per
    # iteration; an eager checkpoint materializes it once and its blocks
    # free with the DataFrame reference (no CacheManager entry leaking
    # past this call in long-lived sessions — the learn_unigram rule)
    ex = df.select(
        F.col(id_col).alias("vid"),
        F.posexplode(F.col(vec_col)).alias("pos", "x"),
    ).select(
        "vid", (F.col("pos") + 1).alias("dim"), F.col("x").cast("double").alias("x")
    ).localCheckpoint()

    seeds = (
        df.select(F.col(id_col).alias("vid"))
        .distinct()
        .withColumn(
            "rn",
            F.row_number().over(
                Window.orderBy(
                    F.md5(F.concat(F.lit("kminit:"), F.col("vid").cast("string"))),
                    "vid",
                )
            ),
        )
        .filter(F.col("rn") <= k)
        .select("vid", (F.col("rn") - 1).cast("long").alias("cid"))
    )
    cent = seeds.join(ex, "vid").select(
        "cid", "dim", F.round("x", 6).alias("c")
    )
    assign = None
    for _ in range(iters):
        dists = (
            ex.join(F.broadcast(cent), "dim")
            .groupBy("vid", "cid")
            .agg(
                F.sum(
                    # (x-c)*(x-c), not pow(x-c, 2): multiplication is the
                    # same IEEE op in every engine, pow need not be
                    (F.col("x") - F.col("c")) * (F.col("x") - F.col("c"))
                ).alias("dist")
            )
        )
        assign = (
            dists.groupBy("vid")
            .agg(F.min(F.struct("dist", "cid")).alias("best"))
            .select("vid", F.col("best.cid").alias("cid"))
        )
        cent = (
            assign.join(ex, "vid")
            .groupBy("cid", "dim")
            .agg(F.round(F.avg("x"), 6).alias("c"))
        )
    sizes = assign.groupBy("cid").agg(F.count(F.lit(1)).alias("n_assigned"))
    return cent.join(sizes, "cid").select(
        "cid", F.col("dim").cast("long").alias("dim"),
        F.col("c").alias("coord"), "n_assigned",
    )
