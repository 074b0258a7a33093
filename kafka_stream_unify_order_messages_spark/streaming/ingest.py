"""Streaming training-data ingest: the streaming counterpart of
``operators/pipeline.py:clean_corpus`` — documents arrive continuously,
and each must pass the quality gate and content-hash dedup before landing
in the training corpus sink.

Pipeline: quality score (scan-local expressions) -> threshold filter ->
exact dedup on the normalized-content md5 within a watermark window ->
per-doc stats projection. All state is bounded: dedup state for a hash is
freed once the watermark passes (dropDuplicatesWithinWatermark), which is
the property that keeps a 100 TB/day ingest from accumulating unbounded
state. Near-dup (minhash-LSH) removal deliberately stays a *batch
compaction* step over the landed corpus (operators/pipeline.clean_corpus):
band joins need corpus-wide visibility a stream cannot give without
unbounded state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.functions import text as T
from kafka_stream_unify_order_messages_spark.operators.dedup import (
    normalized_text,
)
from kafka_stream_unify_order_messages_spark.streaming.joins import (
    dedup_within_watermark,
)


def clean_corpus_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ts_col: str = "ingest_ts",
    quality_threshold: float = 0.4,
    watermark_delay: str = "10 seconds",
) -> DataFrame:
    """Streaming corpus cleaning over a streaming DataFrame with columns
    (id, text, ingest timestamp). Returns the cleaned append-mode stream
    (id, text, content_hash, n_tokens, quality) — duplicates of a content
    hash arriving within ``watermark_delay`` are dropped, first-wins,
    matching batch ``clean_corpus``'s min-id canonical-copy rule under
    arrival order.
    """
    scored = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.col(ts_col),
        F.md5(normalized_text(text_col)).alias("content_hash"),
        T.quality_score(text_col).alias("quality"),
    ).filter(F.col("quality") >= quality_threshold)

    deduped = dedup_within_watermark(
        scored, ["content_hash"], ts_col=ts_col,
        watermark_delay=watermark_delay,
    )
    return deduped.select(
        id_col,
        text_col,
        "content_hash",
        T.token_count(text_col).alias("n_tokens"),
        "quality",
    )
