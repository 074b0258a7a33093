"""IVF ANN correctness: full probing == brute force exactly; partial
probing trades recall for scan fraction; assignment partitions the corpus."""

from __future__ import annotations

import pytest

from kafka_stream_unify_order_messages_spark.operators.similarity import (
    brute_force_topk,
    ivf_assign,
    ivf_topk,
    train_ivf_centroids,
)
from kafka_stream_unify_order_messages_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


@pytest.fixture(scope="module")
def queries(emb):
    return emb.filter("vec_id % 50 = 0")


def topk_map(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.neighbor_id)
    return out


def test_ivf_full_probe_equals_brute_force(spark, emb, queries):
    n_cent = 8
    exact = topk_map(brute_force_topk(queries, emb, k=5))
    full = topk_map(
        ivf_topk(queries, emb, k=5, n_centroids=n_cent, nprobe=n_cent)
    )
    assert full == exact


def test_ivf_partial_probe_recall(spark, emb, queries):
    exact = topk_map(brute_force_topk(queries, emb, k=5))
    approx = topk_map(ivf_topk(queries, emb, k=5, n_centroids=8, nprobe=3))
    hits = total = 0
    for q, nbrs in exact.items():
        got = approx.get(q, set())
        hits += len(nbrs & got)
        total += len(nbrs)
    recall = hits / total
    assert recall >= 0.5, f"recall@5 = {recall:.2f}"
    # and the approximate path returns at most k per query
    assert all(len(v) <= 5 for v in approx.values())


def test_ivf_assignment_covers_corpus(spark, emb):
    cents = train_ivf_centroids(emb, n_centroids=8)
    assigned = ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    cells = [r.centroid_id for r in assigned.select("centroid_id").distinct().collect()]
    assert len(cells) >= 2  # corpus actually spreads over cells
    assert all(0 <= c < 8 for c in cells)


def test_ivf_deterministic_centroids(spark, emb):
    a = train_ivf_centroids(emb, n_centroids=8)
    b = train_ivf_centroids(emb, n_centroids=8)
    assert (a == b).all()


def test_lsh_multi_probe_improves_recall(spark, emb, queries):
    from kafka_stream_unify_order_messages_spark.operators.similarity import (
        lsh_topk,
    )

    exact = topk_map(brute_force_topk(queries, emb, k=5))

    def recall(approx):
        hits = total = 0
        for q, nbrs in exact.items():
            hits += len(nbrs & approx.get(q, set()))
            total += len(nbrs)
        return hits / total

    # 4 planes -> 16 buckets: sized to this corpus (8 planes = 256
    # buckets fragments 400 vectors too finely for any recall)
    single = recall(topk_map(lsh_topk(queries, emb, k=5, n_planes=4)))
    multi = recall(
        topk_map(lsh_topk(queries, emb, k=5, n_planes=4, multi_probe=True))
    )
    assert multi >= single
    assert multi >= 0.3, f"multi-probe recall@5 = {multi:.2f} (single {single:.2f})"


def test_persisted_index_search_matches_live_ivf(spark, emb, queries, tmp_path):
    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    path = str(tmp_path / "ivf_index")
    cents = S.save_ivf_index(emb, path, n_centroids=8)

    # layout: inverted lists are directory-partitioned by cell
    from pathlib import Path

    cell_dirs = sorted(
        p.name for p in Path(path, "cells").iterdir() if p.is_dir()
    )
    assert all(d.startswith("centroid_id=") for d in cell_dirs)
    assert len(cell_dirs) == 8

    # identical results to live ivf_topk with the same centroids
    live = S.ivf_topk(
        queries, emb, k=5, n_centroids=8, nprobe=3, centroids=cents
    )
    persisted = S.search_ivf_index(spark, path, queries, k=5, nprobe=3)
    lv = sorted(map(tuple, live.collect()))
    pv = sorted(map(tuple, persisted.collect()))
    assert lv == pv

    # the probe scan is partition-pruned to the probed cells only
    loaded_cents, cells = S.load_ivf_index(spark, path)
    assert (loaded_cents == cents).all()
    import pyspark.sql.functions as F

    pruned = cells.filter(F.col("centroid_id").isin([0, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    sec = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "centroid_id" in sec


def test_persisted_ivfpq_search_matches_live_ivfpq(
    spark, emb, queries, tmp_path
):
    from pathlib import Path

    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    path = str(tmp_path / "ivfpq_index")
    cents = S.train_ivf_centroids(emb, n_centroids=8)
    saved_cents, codebook = S.save_ivfpq_index(
        emb, path, n_centroids=8, centroids=cents
    )
    assert (saved_cents == cents).all()

    # layout: codes-only inverted lists, directory-partitioned by cell —
    # no raw vector column is persisted (the compression contract)
    cell_dirs = sorted(
        p.name for p in Path(path, "codes").iterdir() if p.is_dir()
    )
    assert all(d.startswith("centroid_id=") for d in cell_dirs)
    loaded_cents, loaded_cb, codes = S.load_ivfpq_index(spark, path)
    assert (loaded_cents == cents).all()
    assert (loaded_cb == codebook).all()
    assert "embedding" not in codes.columns
    assert set(codes.columns) == {"vec_id", "codes", "centroid_id"}

    # identical results to live ivfpq_topk with the same model
    live = S.ivfpq_topk(
        queries, emb, k=5, n_centroids=8, nprobe=3,
        centroids=cents, codebook=codebook,
    )
    persisted = S.search_ivfpq_index(spark, path, queries, k=5, nprobe=3)
    assert sorted(map(tuple, live.collect())) == sorted(
        map(tuple, persisted.collect())
    )

    # the probe scan partition-prunes to the probed cells only
    pruned = codes.filter(F.col("centroid_id").isin([0, 3]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    sec = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "centroid_id" in sec

    # the serving guard routes oversized batches to knn_join
    import pytest as _pytest

    with _pytest.raises(ValueError, match="knn_join"):
        S.search_ivfpq_index(
            spark, path, emb.limit(30), k=3, nprobe=2, max_query_batch=20
        )


def test_query_collecting_ann_operators_guard_oversized_batches(spark):
    """Every ANN operator that collects its query side like a broadcast
    build side enforces the contract (the pq_topk guard, generalized):
    a batch past max_query_batch raises and routes to knn_join instead
    of silently going quadratic as |Q| grows with the corpus."""
    import numpy as np
    import pytest

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    big = emb.limit(30)
    cents = S.train_ivf_centroids(emb, n_centroids=4)
    calls = [
        lambda: S.brute_force_topk(big, emb, k=3, max_query_batch=20),
        lambda: S.lsh_topk(big, emb, k=3, max_query_batch=20),
        lambda: S.ivf_topk(
            big, emb, k=3, centroids=cents, nprobe=2, max_query_batch=20
        ),
        lambda: S.ivfpq_topk(
            big, emb, k=3, centroids=cents, nprobe=2, max_query_batch=20
        ),
    ]
    for call in calls:
        with pytest.raises(ValueError, match="knn_join"):
            call()
    # at/below the cap everything still runs
    out = S.brute_force_topk(big, emb, k=3, max_query_batch=30)
    assert out.columns == ["query_id", "neighbor_id", "score", "rnk"]


def test_search_ivf_index_guards_oversized_batches(spark, tmp_path):
    import pytest

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    path = str(tmp_path / "ivf_idx")
    S.save_ivf_index(emb, path, n_centroids=4)
    with pytest.raises(ValueError, match="knn_join"):
        S.search_ivf_index(
            spark, path, emb.limit(30), k=3, nprobe=2, max_query_batch=20
        )
