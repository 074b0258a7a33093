from kafka_stream_unify_order_messages_spark.streaming.unify_stream import (
    UNIFY_OUTPUT_SCHEMA,
    make_unify_fn,
    make_unify_fn_event_time,
    unify_stream,
    unify_stream_event_time,
)
from kafka_stream_unify_order_messages_spark.streaming.unify_tws import (
    OrderUnifyProcessor,
    unify_stream_tws,
)
from kafka_stream_unify_order_messages_spark.streaming.joins import (
    dedup_within_watermark,
    stream_stream_join,
)
from kafka_stream_unify_order_messages_spark.streaming.ingest import (
    cell_assign_expr,
    clean_corpus_stream,
    screen_stream_near_dups,
    screen_stream_semantic,
)
from kafka_stream_unify_order_messages_spark.streaming.dedup_stream import (
    band_decisions_stream,
    near_dup_verdicts,
)
from kafka_stream_unify_order_messages_spark.streaming.heavy_hitters_stream import (
    heavy_hitter_candidates_stream,
    heavy_hitters_from_candidates,
    latest_candidate_snapshot,
)
from kafka_stream_unify_order_messages_spark.streaming.windowed import (
    session_windows,
    tumbling_counts,
    windowed_value_histogram,
)

__all__ = [
    "unify_stream",
    "unify_stream_event_time",
    "unify_stream_tws",
    "OrderUnifyProcessor",
    "make_unify_fn",
    "make_unify_fn_event_time",
    "UNIFY_OUTPUT_SCHEMA",
    "tumbling_counts",
    "session_windows",
    "stream_stream_join",
    "dedup_within_watermark",
    "clean_corpus_stream",
    "screen_stream_near_dups",
    "screen_stream_semantic",
    "cell_assign_expr",
    "band_decisions_stream",
    "near_dup_verdicts",
    "heavy_hitter_candidates_stream",
    "heavy_hitters_from_candidates",
    "latest_candidate_snapshot",
    "windowed_value_histogram",
]
