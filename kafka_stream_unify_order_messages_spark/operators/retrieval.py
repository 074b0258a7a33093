"""Sparse lexical retrieval: BM25 scoring and top-k search.

The dense-ANN family (operators/similarity.py) covers embedding-space
retrieval; this module is its lexical sibling — the Okapi BM25 ranking
function over an inverted-index shape, built entirely from DataFrame
aggregations so Catalyst keeps every stage in whole-stage codegen.

Scale shape (the 100 TB story):
- the query-token semi-join is pushed BELOW the tf shuffle: the
  exploded token stream joins the (tiny, broadcast) distinct query
  token set BEFORE the (doc, token) aggregation, so the tf exchange
  carries only rows whose token some query mentions — the corpus-wide
  posting lists for ~10 terms, not the full corpus token stream. (The
  round-10 workup of bm25_topk's climbing ramp exponent measured the
  unfiltered plan hash-aggregating 44.5M (doc, token) groups at the
  x300 tier when only the matching slice was ever consumed.)
- document frequencies aggregate the FILTERED tf frame by token —
  output is bounded by the query vocabulary (a handful of rows), never
  the corpus vocabulary. The previous plan aggregated and BROADCAST the
  full corpus vocabulary, a frame that grows with the data — at 100 TB
  that broadcast is a scale killer; the query-bounded one is free.
- the query side is tiny by construction (a handful of query strings)
  and is broadcast, so scoring never shuffles the corpus again; the
  only post-tf exchange is the (query, doc) score aggregation.
- top-k per query runs the two-phase prune: a per-partition row_number
  keeps k rows per (query, partition) before the final per-query rank,
  so no single task ever sorts the whole candidate set (same pattern as
  operators/similarity.py:brute_force_topk).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

from kafka_stream_unify_order_messages_spark.functions import text as T


def term_frequencies(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_filter: DataFrame | None = None,
) -> DataFrame:
    """(id, token, tf, dl): per-document term counts with document length.

    dl rides through the groupBy as first() (constant per document), so
    the whole frame costs exactly one exchange on (id, token).

    ``token_filter`` (a 1-column ``token`` frame, assumed small) is
    semi-joined BELOW that exchange: when only a known term subset is
    ever consumed (BM25 with a fixed query set), the shuffle and the
    aggregation hash table carry the matching posting rows only. dl is
    computed from the FULL token stream before the filter, so document
    lengths are unaffected.
    """
    toks = docs.select(
        F.col(id_col),
        T.token_count(text_col).alias("dl"),
        F.explode(T.tokens(text_col)).alias("token"),
    )
    if token_filter is not None:
        toks = toks.join(
            F.broadcast(token_filter.select("token").distinct()), "token"
        )
    return toks.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.first("dl").alias("dl"),
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-k documents per query under Okapi BM25.

    ``queries`` is a small (query_id, query) frame — it is broadcast, as
    are the query-vocabulary-sized document frequencies and the 1-row
    corpus stats, so the corpus-sized side moves through exactly two
    exchanges (the query-token-filtered tf build, score aggregation)
    regardless of query count. The query-token semi-join runs BELOW the
    tf exchange and df aggregates the filtered frame (see the module
    docstring's scale shape — df values for query tokens are identical
    to the full-vocabulary aggregation's).

    idf uses the non-negative variant ln(1 + (N - df + 0.5)/(df + 0.5)).
    Scores are rounded to 6 decimals BEFORE ranking (ties then break on
    doc id), so rankings are reproducible across engines.
    """
    qterms = queries.select(
        "query_id",
        F.explode(F.array_distinct(T.tokens("query"))).alias("token"),
    )
    tf = term_frequencies(docs, id_col, text_col, token_filter=qterms)

    stats = docs.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(T.token_count(text_col)).alias("avgdl"),
    )
    # df over the FILTERED tf: one row per (doc, token-in-some-query),
    # so per-token counts equal the full aggregation's for every token
    # the scorer can reference — and the broadcast is query-sized
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).cast("double").alias("df"))

    scored = (
        tf.join(F.broadcast(qterms), "token")
        .join(F.broadcast(df_), "token")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .withColumn(
            "term_score",
            F.col("idf")
            * (F.col("tf") * F.lit(k1 + 1.0))
            / (
                F.col("tf")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b) * F.col("dl") / F.col("avgdl")
                )
            ),
        )
        .groupBy("query_id", id_col)
        .agg(F.round(F.sum("term_score"), 6).alias("score"))
    )

    # two-phase top-k: partition-local prune, then the per-query rank
    # only ever sees (#partitions * k) rows per query
    local = Window.partitionBy("query_id", "_pid").orderBy(
        F.desc("score"), F.col(id_col)
    )
    final = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.col(id_col)
    )
    return (
        scored.withColumn("_pid", F.spark_partition_id())
        .withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= k)
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .select("query_id", id_col, "rank", "score")
    )


def rrf_fuse(
    rankings: list[tuple[str, DataFrame]],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 20,
    c: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion of named ranked lists (hybrid retrieval:
    BM25 ⊕ dense ANN): ``score(d) = Σ_lists 1 / (c + rank_list(d))``,
    top-``k`` by fused score. The standard zero-tuning way to combine
    incomparable score scales — only ranks cross the fusion boundary.

    Scale shape: inputs are already top-N lists (bounded by their own
    retrieval k), so the union/agg/final-ranking all run on frames of
    |lists| * N rows — fusion cost is independent of corpus size. The
    single-partition ranking window is over that bounded frame only.
    """
    from pyspark.sql import Window

    tagged = None
    for name, df in rankings:
        part = df.select(
            F.col(id_col),
            (1.0 / (F.lit(c) + F.col(rank_col))).alias("_contrib"),
            F.lit(name).alias("_list"),
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    fused = tagged.groupBy(id_col).agg(
        F.round(F.sum("_contrib"), 6).alias("rrf_score"),
        F.count(F.lit(1)).alias("n_lists"),
    )
    w = Window.orderBy(F.desc("rrf_score"), F.col(id_col))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
    )
