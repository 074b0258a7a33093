"""BM25 retrieval, PageRank, quality classifier, and DSIR semantics,
each checked against an independent pure-Python reference."""

from __future__ import annotations

import math

import pytest
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.functions import text as T
from kafka_stream_unify_order_messages_spark.operators import graph as G
from kafka_stream_unify_order_messages_spark.operators import pipeline as P
from kafka_stream_unify_order_messages_spark.operators import retrieval as RT


@pytest.fixture()
def corpus(spark):
    rows = [
        (1, "spark stream join spark spark"),
        (2, "table scan filter table"),
        (3, "spark table join window stream"),
        (4, "noise words only here"),
        (5, "join join join"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def _ref_bm25(docs, query_terms, k1=1.2, b=0.75):
    """Independent BM25: dict-based tf/df/idf."""
    toks = {d: t.split() for d, t in docs}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    df = {}
    for t in toks.values():
        for term in set(t):
            df[term] = df.get(term, 0) + 1
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for term in set(query_terms):
            tf = t.count(term)
            if tf == 0 or term not in df:
                continue
            idf = math.log(1.0 + (n - df[term] + 0.5) / (df[term] + 0.5))
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(t) / avgdl)
            )
        if s > 0:
            scores[d] = round(s, 6)
    return scores


def test_bm25_matches_reference_scores(spark, corpus):
    queries = spark.createDataFrame(
        [("qa", "spark join"), ("qb", "table scan")], ["query_id", "query"]
    )
    out = RT.bm25_topk(corpus, queries, k=10).collect()
    docs = [(1, "spark stream join spark spark"),
            (2, "table scan filter table"),
            (3, "spark table join window stream"),
            (4, "noise words only here"),
            (5, "join join join")]
    for qid, qtext in [("qa", "spark join"), ("qb", "table scan")]:
        ref = _ref_bm25(docs, qtext.split())
        got = {r["doc_id"]: r["score"] for r in out if r["query_id"] == qid}
        assert got == pytest.approx(ref, abs=1e-6)
        # ranks follow (score desc, doc_id) over the rounded scores
        ranked = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))
        by_rank = sorted(
            (r["rank"], r["doc_id"]) for r in out if r["query_id"] == qid
        )
        assert [d for _, d in by_rank] == [d for d, _ in ranked]


def test_bm25_no_hit_docs_are_absent(spark, corpus):
    queries = spark.createDataFrame([("q", "zebra")], ["query_id", "query"])
    assert RT.bm25_topk(corpus, queries).count() == 0


def _ref_pagerank(edges, iters=5, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    out = {u: sum(1 for a, _ in edges if a == u) for u in nodes}
    n = len(nodes)
    r = {u: 1.0 / n for u in nodes}
    for _ in range(iters):
        nxt = {u: (1 - d) / n for u in nodes}
        for a, b in edges:
            nxt[b] += d * r[a] / out[a]
        r = nxt
    return {u: round(v, 6) for u, v in r.items()}


def test_pagerank_matches_reference_power_iteration(spark):
    # a star (1 is the hub) plus a tail — degrees vary, so ranks must too
    dir_edges = [(1, 2), (1, 3), (1, 4), (4, 5)]
    pairs = spark.createDataFrame(dir_edges, ["id_a", "id_b"])
    edges = G.symmetrize(pairs)
    got = {r["node"]: r["pagerank"] for r in G.pagerank(edges).collect()}
    ref = _ref_pagerank(dir_edges + [(b, a) for a, b in dir_edges])
    assert got == pytest.approx(ref, abs=2e-6)
    # total rank mass is conserved (no dangling nodes in a pair graph)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-4)
    # the hub outranks its leaves
    assert got[1] > got[2]


def test_quality_classifier_bounds_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, ""), (3, "alpha beta gamma")],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", T.quality_classifier_score("text").alias("s")
        ).collect()
    }
    assert 0.0 < out[1] < 1.0
    assert out[2] == pytest.approx(0.5)  # empty text -> zero logit
    assert out[1] == out[3]  # pure function of text


def test_dsir_weights_favor_target_distribution(spark):
    # target docs use one vocabulary, raw-only docs another; the LLR
    # must separate them with positive vs negative weights
    rows = [(i, "aa bb cc dd aa bb", "tgt") for i in range(10)] + [
        (i + 10, "xx yy zz ww xx yy", "raw") for i in range(10)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    out = P.dsir_log_weights(docs, is_target=F.col("source") == "tgt")
    got = {r["doc_id"]: r["log_weight"] for r in out.collect()}
    assert all(got[i] > 0 for i in range(10))
    assert all(got[i + 10] < 0 for i in range(10))
    assert all(
        r["n_tokens"] == 6 for r in out.collect()
    )


def test_mmr_topk_matches_python_oracle_and_diversifies(spark):
    import numpy as np

    from kafka_stream_unify_order_messages_spark.operators import similarity as S
    from kafka_stream_unify_order_messages_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    k, fetch_k, lam = 4, 8, 0.5
    got = {}
    for r in S.mmr_topk(queries, emb, k=k, fetch_k=fetch_k, lam=lam).collect():
        got.setdefault(r["query_id"], []).append(
            (r["mmr_rank"], r["neighbor_id"], r["score"])
        )

    # independent python oracle over the same data
    rows = emb.collect()
    ids = np.array([r["vec_id"] for r in rows])
    mat = np.stack([np.array(r["embedding"], dtype=np.float64) for r in rows])
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims_all = mat @ mat.T
    for qi, qid in enumerate(ids):
        if qid % 50 != 0:
            continue
        scores = np.round(sims_all[qi], 6)
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != qid),
            key=lambda i: (-scores[i], ids[i]),
        )[:fetch_k]
        cand_sims = np.round(mat[order] @ mat[order].T, 6)
        sel: list = []
        rem = list(range(len(order)))
        for _ in range(k):
            if sel:
                obj = [
                    scores[order[i]] - lam * max(cand_sims[i][j] for j in sel)
                    for i in range(len(order))
                ]
            else:
                obj = [scores[order[i]] for i in range(len(order))]
            best = min(rem, key=lambda i: (-obj[i], ids[order[i]]))
            sel.append(best)
            rem.remove(best)
        expect = [
            (r + 1, int(ids[order[i]]), float(scores[order[i]]))
            for r, i in enumerate(sel)
        ]
        assert sorted(got[qid]) == sorted(expect), qid

    # sound MMR invariants (a mean-pairwise-sim "improvement" is NOT a
    # theorem — greedy max-sim penalties admit counterexamples, observed
    # on this data): (1) rank-1 is the pure-relevance top-1 for every
    # query; (2) with lam > 0 the selection deviates from plain top-k
    # for at least one query (the re-rank is not a no-op)
    plain = {}
    for r in S.brute_force_topk(queries, emb, k=k).collect():
        plain.setdefault(r["query_id"], []).append(
            (r["rnk"], r["neighbor_id"])
        )
    deviations = 0
    for qid, sel_rows in got.items():
        top1 = min(sel_rows)[1]
        assert top1 == min(plain[qid])[1], qid
        if {n for _, n, _ in sel_rows} != {n for _, n in plain[qid]}:
            deviations += 1
    assert deviations > 0


def test_mmr_rerank_composes_with_knn_join(spark):
    # the fully-distributed form: knn_join candidates (neither side
    # collected) re-ranked by the same greedy stage without a forced
    # candidate broadcast; per-query output is a prefix-consistent
    # diversified selection drawn from the candidate set
    from kafka_stream_unify_order_messages_spark.operators import similarity as S
    from kafka_stream_unify_order_messages_spark.sources.files import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    cand = S.knn_join(queries, emb, k=8, n_planes=4, dim=64)
    cand_sets = {}
    for r in cand.collect():
        cand_sets.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    out = S.mmr_rerank(
        cand, emb, k=3, lam=0.5, broadcast_candidates=False
    ).collect()
    assert out
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append((r["mmr_rank"], r["neighbor_id"]))
    for qid, rows in by_q.items():
        ranks = sorted(rk for rk, _ in rows)
        assert ranks == list(range(1, len(rows) + 1))  # contiguous ranks
        assert {n for _, n in rows} <= cand_sets[qid]  # drawn from candidates
