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
