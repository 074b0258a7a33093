"""Product-quantization ANN correctness pins.

The exactness invariant: when every corpus vector's subvectors appear
verbatim in the codebook, encoding must select exactly those codewords
and the ADC score must equal the exact inner product — PQ with a
lossless codebook IS brute force (by inner product). Plus geometry and
determinism pins for the fixed-codebook path the oracle checks.
"""

from __future__ import annotations

import numpy as np
import pytest

from kafka_stream_unify_order_messages_spark.operators.similarity import (
    pq_codebook,
    pq_encode,
    pq_topk,
)
from kafka_stream_unify_order_messages_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF, "embeddings").cache()


def test_codebook_deterministic_shape():
    cb = pq_codebook(n_sub=8, n_codes=16, sub_dim=8)
    assert cb.shape == (8, 16, 8)
    assert np.array_equal(cb, pq_codebook(n_sub=8, n_codes=16, sub_dim=8))
    assert np.abs(cb).max() <= 1.0


def test_encode_codes_in_range(spark, emb):
    cb = pq_codebook()
    enc = pq_encode(emb.limit(50), cb).collect()
    assert len(enc) == 50
    for r in enc:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_lossless_codebook_is_exact_inner_product(spark):
    # corpus of 4 vectors, dim 8, 2 subspaces of 4; codebook = the exact
    # subvectors of every corpus vector -> encoding is lossless and ADC
    # equals the exact inner product.
    rng = [
        [0.5, -1.0, 2.0, 0.25, 1.5, -0.75, 0.0, 3.0],
        [1.0, 1.0, -2.0, 0.5, -0.5, 2.5, 1.25, -1.0],
        [-3.0, 0.75, 0.5, 2.0, 0.25, -1.5, 2.0, 0.5],
        [2.0, -0.25, 1.0, -1.0, 3.0, 0.5, -2.0, 1.5],
    ]
    vecs = np.asarray(rng)
    n_sub, sub_dim = 2, 4
    cb = np.stack(
        [vecs[:, :sub_dim], vecs[:, sub_dim:]]
    )  # (2, 4 codewords, 4)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(rng)],
        "vec_id long, embedding array<double>",
    )
    got = pq_topk(df, df, k=3, codebook=cb).collect()
    exact = vecs @ vecs.T
    for r in got:
        assert r.score == pytest.approx(
            exact[r.query_id, r.neighbor_id], abs=1e-6
        )
        assert r.query_id != r.neighbor_id
    # every query ranks all 3 non-self neighbors
    per_q = {}
    for r in got:
        per_q.setdefault(r.query_id, []).append(r.rnk)
    assert all(sorted(v) == [1, 2, 3] for v in per_q.values())


def test_pq_topk_shape_and_self_exclusion(spark, emb):
    queries = emb.filter("vec_id % 50 = 0")
    out = pq_topk(queries, emb, k=5).collect()
    n_queries = queries.count()
    assert len(out) == n_queries * 5
    assert all(r.query_id != r.neighbor_id for r in out)


def test_ivfpq_full_probe_equals_pq(spark, emb):
    from kafka_stream_unify_order_messages_spark.operators.similarity import (
        hyperplane,
        ivfpq_topk,
    )

    cents = np.asarray(
        [hyperplane(200 + c, 64) for c in range(8)], dtype=np.float64
    )
    queries = emb.filter("vec_id % 50 = 0")
    pq = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in pq_topk(queries, emb, k=5).collect()
    }
    full = {
        (r.query_id, r.rnk): r.neighbor_id
        for r in ivfpq_topk(
            queries, emb, k=5, n_centroids=8, nprobe=8, centroids=cents
        ).collect()
    }
    assert full == pq


def test_ivfpq_partial_probe_subset_recall(spark, emb):
    from kafka_stream_unify_order_messages_spark.operators.similarity import (
        hyperplane,
        ivfpq_topk,
    )

    cents = np.asarray(
        [hyperplane(200 + c, 64) for c in range(8)], dtype=np.float64
    )
    queries = emb.filter("vec_id % 50 = 0")
    out = ivfpq_topk(
        queries, emb, k=5, n_centroids=8, nprobe=2, centroids=cents
    ).collect()
    n_queries = queries.count()
    # partial probing returns at most k per query and excludes self
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.neighbor_id)
        assert r.query_id != r.neighbor_id
    assert len(per_q) == n_queries
    assert all(len(v) <= 5 for v in per_q.values())


def test_pq_topk_guards_exhaustive_query_batches(spark):
    # ADC is a serving-batch primitive: a query batch past the cap must
    # raise and route to ivfpq_topk/knn_join, not silently go quadratic
    import pytest

    from kafka_stream_unify_order_messages_spark.operators import similarity as S
    from kafka_stream_unify_order_messages_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    with pytest.raises(ValueError, match="exhaustive ADC"):
        S.pq_topk(emb.limit(30), emb, k=3, max_query_batch=20)
    out = S.pq_topk(emb.limit(30), emb, k=3, max_query_batch=None)
    assert out.columns == ["query_id", "neighbor_id", "score", "rnk"]
