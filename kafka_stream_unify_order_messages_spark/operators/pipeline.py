"""End-to-end training-data corpus cleaning: the composition a real LLM
data pipeline runs, as one declarative DataFrame graph —

    quality filter -> exact dedup (keep min id) -> minhash-LSH near-dup
    removal (keep the smaller id of each candidate pair) -> per-doc stats

Shuffle budget at 100 TB: quality scoring is scan-local; exact dedup is
one shuffle on a 32-byte digest; near-dup is the minhash path (one shuffle
to signatures + the band equi-join); the final anti-join shuffles only
(id) pairs. Nothing quadratic, nothing driver-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.functions import text as T
from kafka_stream_unify_order_messages_spark.operators import dedup as D


def clean_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    quality_threshold: float = 0.4,
    num_hashes: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Returns the cleaned corpus: (id, n_tokens, quality) for documents
    that pass the quality gate, are the canonical copy of their exact-
    duplicate group, and are not the larger id of any near-dup pair.
    """
    scored = docs.select(
        F.col(id_col),
        F.col(text_col),
        T.quality_score(text_col).alias("quality"),
    ).filter(F.col("quality") >= quality_threshold)

    # exact dedup: one shuffle on the digest, min id is canonical
    exact = (
        scored.groupBy(F.md5(D.normalized_text(text_col)).alias("_ch"))
        .agg(
            F.min_by(
                F.struct(id_col, text_col, "quality"), F.col(id_col)
            ).alias("_e")
        )
        .select(
            F.col(f"_e.{id_col}").alias(id_col),
            F.col(f"_e.{text_col}").alias(text_col),
            F.col("_e.quality").alias("quality"),
        )
    )

    # `exact` feeds two DAG branches (candidate generation + the anti-join
    # probe); persist it so quality scoring + dedup run once, not twice —
    # the same materialization point a production pipeline would keep
    from pyspark import StorageLevel

    exact = exact.persist(StorageLevel.MEMORY_AND_DISK)

    pairs = D.minhash_candidate_pairs(
        exact, id_col, text_col, num_hashes, bands, shingle_n
    )
    # cluster-based removal: keep exactly ONE doc per connected component
    # of the candidate graph — per-pair removal (drop every id_b) under-
    # removes on transitive chains, e.g. pairs (2,3),(1,3) would keep
    # both 1 and 2 though they share a component through 3
    clusters = D.dedup_clusters(pairs)
    # near-dup losers are a tiny fraction of the corpus: broadcast the
    # anti-join instead of sort-merging the full corpus against them
    losers = F.broadcast(
        clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
            F.col("doc_id").alias(id_col)
        )
    )

    return (
        exact.join(losers, id_col, "left_anti")
        .select(
            F.col(id_col),
            T.token_count(text_col).alias("n_tokens"),
            "quality",
        )
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any word
    n-gram with a benchmark/eval set (the standard pretraining hygiene
    step; n=8..13 in practice).

    Returns (id, n_hits) for contaminated docs, n_hits = number of
    distinct overlapping n-grams.

    Scale shape: the benchmark gram set is the SMALL side — distinct'd
    and broadcast, so the 100 TB corpus side is one scan + one explode
    with no shuffle until the per-doc count (grouped on id). The corpus
    is never self-joined.
    """
    from kafka_stream_unify_order_messages_spark.operators.dedup import (
        _exploded_shingles,
    )

    corpus_grams = _exploded_shingles(docs, id_col, text_col, ngram_n)
    bench_grams = F.broadcast(
        _exploded_shingles(benchmark, id_col, text_col, ngram_n)
        .select("shingle")
        .distinct()
    )
    # shingles are distinct per doc by construction (array_distinct in
    # shingles_from_tokens), so a plain count is the distinct-gram count —
    # count_distinct would add a second corpus-side exchange for nothing
    return (
        corpus_grams.join(bench_grams, "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )


def dedup_lines(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 12,
) -> DataFrame:
    """Corpus-global line-level exact dedup (the C4/RefinedWeb "remove
    repeated lines across documents" step). Documents are split into
    deterministic ``chunk_words``-word windows (the corpus has no
    newlines, so fixed word windows play the role of lines); each chunk
    survives only at its globally-first occurrence — ordered by
    (doc id, position) — and every document is reassembled from its
    surviving chunks in original order.

    Returns (id, clean_text, n_kept, n_dropped).

    Scale: the first-occurrence choice partitions by a 128-bit digest of
    the chunk (never the chunk text, which would skew on hot lines and
    ship full strings through the exchange); reassembly shuffles (id,
    position, chunk) — both shuffles are O(corpus tokens), nothing is
    quadratic and no state lives on the driver.
    """
    w = F.split(F.col(text_col), " ")
    n_chunks = F.ceil(F.size(w) / F.lit(chunk_words)).cast("int")
    # posexplode(transform(...)) evaluates the split once per row; slice
    # inside the lambda copies O(chunk_words) per chunk, which is the
    # output size anyway — no quadratic blowup (cf. verify recipe note)
    chunks = docs.select(
        F.col(id_col),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.array_join(
                    F.slice(w, i * chunk_words + 1, chunk_words), " "
                ),
            )
        ).alias("chunk_idx", "chunk"),
    )
    first = Window.partitionBy(F.md5("chunk")).orderBy(id_col, "chunk_idx")
    ranked = chunks.withColumn("rn", F.row_number().over(first))
    return (
        ranked.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("rn") == 1,
                                F.struct("chunk_idx", "chunk"),
                            )
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.sum(F.when(F.col("rn") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_kept"),
            F.sum(F.when(F.col("rn") > 1, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
    )
