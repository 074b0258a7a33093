"""Token-budget shard packing for training-data assembly.

Assigning documents to fixed-token shards needs a GLOBAL running sum in a
deterministic document order — naively a ``Window.orderBy(id)`` over the
whole table, which Spark executes as a single-partition sort: the one
shape guaranteed to die at 100 TB.

Scalable form (identical output): bucket ids by a monotone function of
the order key, cumsum WITHIN buckets with a partitioned window (parallel),
compute per-bucket totals (one tiny aggregate: #buckets rows, not #docs),
prefix-sum the totals with a window over that tiny frame, and broadcast-
join the bucket offsets back. Global position = bucket offset +
within-bucket running sum. Nothing is collected to the driver and the
plan size is independent of #buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
import pyspark.sql.functions as F


def _running_starts(
    df: DataFrame,
    id_col: str,
    size_col: str,
    bucket_width: int,
) -> DataFrame:
    """(id, size, _start): exclusive running sum of ``size_col`` in
    ``id_col`` order, computed without a global single-partition window.

    ``id_col`` must be numeric and ordering-dense-ish; bucket_width
    controls parallelism (ids per window partition).
    """
    bucket = (F.col(id_col) / bucket_width).cast("long")
    sized = df.select(
        F.col(id_col), F.col(size_col), bucket.alias("_bucket")
    )

    # parallel within-bucket running sums
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    with_local = sized.withColumn("_local_end", F.sum(size_col).over(w))

    # tiny per-bucket frame: exclusive prefix-sum of totals in bucket
    # order. The single-partition orderBy window is fine HERE — it sorts
    # #buckets rows (data-size / bucket_width), never #docs. Totals are
    # derived from the windowed frame (bucket total = running sum at the
    # bucket's last row) rather than re-aggregating the input: both
    # consumers then sit on the SAME child exchange, which Spark's
    # ReuseExchange collapses to one corpus scan + tokenize instead of two.
    w_off = (
        Window.orderBy("_bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        with_local.groupBy("_bucket")
        .agg(F.max("_local_end").alias("_total"))
        .withColumn(
            "_offset", F.coalesce(F.sum("_total").over(w_off), F.lit(0))
        )
        .select("_bucket", "_offset")
    )

    start = F.col("_offset") + F.col("_local_end") - F.col(size_col)
    return with_local.join(F.broadcast(offsets), "_bucket").select(
        id_col, size_col, start.cast("long").alias("_start")
    )


def pack_shards(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    shard_budget: int = 5000,
    bucket_width: int = 1000,
) -> DataFrame:
    """(id, size, shard): shard = floor(running-start / budget) in id
    order.
    """
    started = _running_starts(df, id_col, size_col, bucket_width)
    return started.select(
        id_col,
        size_col,
        F.floor(F.col("_start") / shard_budget).cast("long").alias("shard"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    size_col: str = "n_tokens",
    seq_len: int = 64,
    bucket_width: int = 1000,
) -> DataFrame:
    """Concat-and-split sequence packing (GPT-style pretraining batches).

    Documents are laid out back-to-back in ``id_col`` order into one
    global token stream (``size_col`` should already include any EOS/
    separator tokens the trainer appends per document), and the stream is
    cut into fixed-length training sequences of ``seq_len`` tokens. A
    document whose span crosses a cut contributes one row per sequence it
    touches — the standard "documents may be split across context
    windows" packing used for causal-LM training, with zero padding waste.

    Emits (doc_id, seq_id, seq_offset, doc_offset, span_len):
      - ``seq_id``      — which training sequence the span lands in,
      - ``seq_offset``  — position of the span inside that sequence,
      - ``doc_offset``  — position of the span inside the document,
      - ``span_len``    — number of tokens in the span.

    Scale shape: the only wide operations are the bucketed parallel
    prefix-sum of ``_running_starts`` (one hash exchange + a #buckets-row
    offsets frame broadcast back); the sequence-range explode is
    scan-local and emits ceil(size/seq_len)+1 ≈ 1-2 rows per document.
    No global sort, no driver-side state.
    """
    started = _running_starts(df, id_col, size_col, bucket_width).filter(
        F.col(size_col) > 0
    )
    end = F.col("_start") + F.col(size_col)
    first_seq = F.floor(F.col("_start") / seq_len).cast("long")
    last_seq = F.floor((end - 1) / seq_len).cast("long")
    spans = started.select(
        id_col,
        F.col("_start"),
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
        end.alias("_end"),
    )
    span_start = F.greatest(F.col("_start"), F.col("seq_id") * seq_len)
    span_end = F.least(F.col("_end"), (F.col("seq_id") + 1) * seq_len)
    return spans.select(
        id_col,
        F.col("seq_id"),
        (span_start - F.col("seq_id") * seq_len).cast("long").alias(
            "seq_offset"
        ),
        (span_start - F.col("_start")).cast("long").alias("doc_offset"),
        (span_end - span_start).cast("long").alias("span_len"),
    )
