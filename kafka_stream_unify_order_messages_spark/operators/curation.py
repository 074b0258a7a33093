"""Corpus-curation operators for training-data preparation: deterministic
global shuffle + shard assignment, reproducible hash sampling, and
fixed-token-window document chunking.

These extend the engine beyond the reference's unification pipeline (the
reference has no batch/corpus surface at all — SURVEY.md §2.6); they are the
"make a training set out of a corpus" counterparts to the dedup/similarity
operators. All hashing uses the portable md5 convention from
``functions.text`` so every operator is value-checkable against DuckDB.

Scale notes (100 TB):
- ``training_shuffle`` is shuffle-by-shard + sort-within-shard — the
  terasort shape. No global window, no single-partition stage: shard
  assignment is a pure hash expression, the per-shard ordering is a local
  sort after one hash exchange (w/ AQE handling shard-size variance).
- ``hash_sample`` is a scan-local filter (0 shuffles) — reproducible
  Bernoulli sampling by content-independent key hash, so re-runs and
  incremental ingests sample consistently.
- ``chunk_documents`` is scan-local (0 shuffles): tokens are materialized
  once per row, chunk windows are array slices, and the output explodes
  rows without any wide operation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.functions.text import tokens


def _shuffle_key(id_col: Column, seed: str) -> Column:
    """md5 over seed:id — a uniform, deterministic, engine-portable rank."""
    return F.md5(F.concat_ws(":", F.lit(seed), id_col.cast("string")))


def training_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    n_shards: int = 32,
    seed: str = "seed42",
) -> DataFrame:
    """Deterministic global shuffle of a corpus into ``n_shards`` shards.

    Every row gets a pseudorandom-but-reproducible rank ``md5(seed:id)``;
    its shard is a hash bucket of that rank and its position is the rank
    order *within* the shard. Changing ``seed`` yields an independent
    permutation — epochs reshuffle without rewriting data.

    Returns (id, shard, pos) — the (shard, pos) pairs enumerate the corpus
    in a uniformly shuffled order that any worker can reproduce.
    """
    rk = _shuffle_key(F.col(id_col), seed)
    shard = (F.conv(F.substring(rk, 1, 7), 16, 10).cast("long") % n_shards).alias(
        "shard"
    )
    w = Window.partitionBy("shard").orderBy("rk")
    return (
        df.select(F.col(id_col), rk.alias("rk"), shard)
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard", "pos")
    )


def hash_sample(
    df: DataFrame,
    id_col: str = "doc_id",
    rate_bp: int = 1500,
    seed: str = "sample42",
) -> DataFrame:
    """Reproducible Bernoulli sample: keep rows whose hashed id falls in
    the first ``rate_bp``/10000 of the hash space.

    Unlike ``df.sample()`` the decision is a pure function of (seed, id):
    stable across retries, partitionings, and incremental batches — the
    property a 100 TB pipeline needs so re-processing a partition never
    changes which rows were sampled.
    """
    rk = _shuffle_key(F.col(id_col), seed)
    bucket = F.conv(F.substring(rk, 1, 7), 16, 10).cast("long") % 10000
    return df.filter(bucket < rate_bp)


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_size: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Split documents into fixed-token-budget overlapping chunks.

    Standard context-window preparation for embedding / pretraining
    pipelines: chunk ``i`` covers tokens ``[1 + i*stride, 1 + i*stride +
    chunk_size)`` (1-based), so consecutive chunks overlap by
    ``chunk_size - stride`` tokens and every token is covered. The final
    chunk may be short.

    Scan-local: tokens are bound once (no re-tokenization per chunk — see
    dedup.shingles_from_tokens for why binding matters), chunk windows are
    ``slice`` calls on the bound array, and rows explode without a
    shuffle. Emits the chunk's md5 rather than re-materializing text for
    downstream ops that only need identity (dedup, routing).
    """
    if stride <= 0 or chunk_size <= 0:
        raise ValueError("chunk_size and stride must be positive")
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))
    starts = F.sequence(F.lit(1), F.size("_toks"), F.lit(stride))
    chunked = toked.select(
        id_col,
        F.explode(starts).alias("start_pos"),
        F.col("_toks"),
    )
    piece = F.slice(F.col("_toks"), F.col("start_pos"), chunk_size)
    return chunked.select(
        id_col,
        ((F.col("start_pos") - 1) / stride).cast("long").alias("chunk_idx"),
        F.col("start_pos").cast("long"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_hash"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Crawl-to-crawl change detection: (id, status) for every document
    that differs between two corpus snapshots — ``added`` (only in new),
    ``removed`` (only in old), ``changed`` (same id, different content
    digest). Unchanged documents are dropped from the output, which is
    what keeps the result proportional to the CHANGE volume, not the
    corpus: at 100 TB the diff of two crawls is the deliverable, and it
    is small.

    Scale shape: each side reduces to (id, 32-byte digest) before the
    full-outer equi-join on id — document text never crosses the wire;
    one shuffle per side.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_h_old")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_h_new")
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.withColumn("status", status)
        .filter(F.col("status") != "unchanged")
        .select(id_col, "status")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    stratum_col: str | None = "source",
    seed: str = "wsample42",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES):
    keep the ``k`` rows per stratum with the largest key ``u^(1/w)``,
    where ``u`` is a deterministic md5-uniform draw in (0, 1] and ``w``
    the row's weight. Inclusion probability is proportional to weight,
    and — unlike weighted Bernoulli — the sample size is exactly ``k``.

    The decision is a pure function of (seed, id): stable across
    retries, partitionings, and incremental batches, like
    ``hash_sample``. We rank by ``ln(u)/w`` (monotone in ``u^(1/w)``
    since ln(u) <= 0), rounded to 9 decimals with the id as tie-break so
    the ordering is reproducible bit-for-bit across engines — the raw
    libm ``ln`` may differ in the last ulp between runtimes, and a
    sampling frontier must not depend on that. (Sibling:
    ``operators/pipeline.py:priority_sample`` implements the
    Duffield-Lund-Thorup u/w scheme, whose priorities are exact IEEE
    divisions of integers — no transcendental, no rounding guard —
    and resolves a GLOBAL top-k via TakeOrderedAndProject; prefer it
    when stratification isn't required.)

    Scale shape: the key is scan-local; per-stratum top-k is one
    shuffle + row_number window. For an unstratified global top-k over
    billions of rows, pre-prune per partition (sort within partitions,
    keep k) before the single-partition window — the same two-phase
    trick brute_force_topk uses.
    """
    if k <= 0:
        raise ValueError("k must be positive")
    u = (
        F.conv(
            F.substring(_shuffle_key(F.col(id_col), seed), 1, 15), 16, 10
        ).cast("double")
        + 1.0
    ) / float(1 << 60)
    key = F.round(F.log(u) / F.col(weight_col).cast("double"), 9)
    strata = [stratum_col] if stratum_col else []
    w = Window.partitionBy(*strata).orderBy(
        F.desc("es_key"), F.col(id_col)
    )
    return (
        df.select(*strata, id_col, F.col(weight_col).alias("weight"),
                  key.alias("es_key"))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(*strata, id_col, "weight", "es_key")
    )


def cap_per_group(
    df: DataFrame,
    group_cols: list[str],
    id_col: str = "doc_id",
    cap: int = 100,
    seed: str = "cap42",
) -> DataFrame:
    """Per-group document cap (the Common-Crawl "at most K pages per
    domain" rule): keep a deterministic pseudorandom ``cap``-subset of
    each group, dropping the rest. Without it one hot domain (a link
    farm, a mirror) can dominate a source's token budget; with it the
    per-group contribution is bounded by construction.

    The kept subset is ordered by ``md5(seed:id)`` — content-independent
    and reproducible, so incremental re-runs keep the same winners and
    changing ``seed`` draws an independent subset (same contract as
    ``hash_sample``).

    Returns the input columns plus ``grp_rank`` (1-based position of the
    row inside its group's kept subset).

    Scale: ONE hash exchange on the group key. The literal
    ``rn <= cap`` filter directly over ``row_number`` becomes a
    WindowGroupLimit — each map task prunes every group it holds to its
    local top-``cap`` BEFORE the shuffle, so a million-page domain sends
    ``cap`` rows per input partition, not a million, and the post-shuffle
    sort is cap-bounded per group. No skew cliff: the hot group never
    materializes on one reducer.
    """
    rk = _shuffle_key(F.col(id_col), seed)
    w = Window.partitionBy(*group_cols).orderBy("_capk")
    return (
        df.withColumn("_capk", rk)
        .withColumn("grp_rank", F.row_number().over(w))
        .filter(F.col("grp_rank") <= cap)
        .drop("_capk")
    )


def global_rank(
    df: DataFrame,
    order_cols: list[str],
    rank_col: str = "rank",
    n_partitions: int = 32,
) -> DataFrame:
    """Exact 1-based global rank of every row under ``order_cols`` —
    computed WITHOUT a single-partition global window.

    The scalable total-order recipe (terasort shape) for arbitrary sort
    keys: range-repartition on the key (sampled boundaries keep the
    partitions balanced), sort + row_number WITHIN each range partition,
    then add per-partition row-count offsets — a #partitions-row frame
    prefix-summed with a tiny window and joined back by partition id.
    Complements ``packing._running_starts``, which needs a dense numeric
    id to bucket on; range partitioning ranks by any (possibly
    composite, non-numeric) key.

    ``order_cols`` must be a total order (include a unique id as the
    last column) — ties that straddle a range boundary would otherwise
    make the rank partition-dependent.
    """
    parts = df.repartitionByRange(n_partitions, *order_cols)
    pid = parts.withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy(*order_cols)
    local = pid.withColumn("_local_rank", F.row_number().over(w_local))

    # tiny frame: one row per range partition; the single-partition
    # window sorts #partitions rows, never the data
    w_off = Window.orderBy("_pid").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = (
        local.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn(
            "_offset", F.coalesce(F.sum("_n").over(w_off), F.lit(0))
        )
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(
            rank_col, (F.col("_offset") + F.col("_local_rank")).cast("long")
        )
        .drop("_pid", "_local_rank", "_offset")
    )


def deterministic_token_mask(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_bp: int = 1500,
    seed: str = "mask42",
    mask_token: str = "[MASK]",
) -> DataFrame:
    """BERT-style masked-LM corruption, fully deterministic: token i of
    document d is masked iff md5('<seed>:<d>:<i>') mod 10000 < rate_bp
    — the md5-draw convention of hash_sample, per position. Returns
    (id, n_tokens, n_masked, masked_text, targets) where targets is
    '<pos>:<token>' pairs space-joined in position order (the labels a
    masked-LM trains against).

    Scan-local: tokens materialize once per row (bound array — the HOF
    binding rule in dedup.shingles_from_tokens), positions come from one
    ``transform`` over sequence(1, n), and both outputs are filters/
    joins over that bound pair array. Zero shuffles, zero Python; the
    same augmentation runs identically on any engine with md5 — which
    is what makes seeded corpus corruption reproducible across reruns
    and backfills at 100 TB.
    """
    toked = df.select(
        F.col(id_col), tokens(text_col).alias("_toks")
    )
    draw = lambda i: (  # noqa: E731 — bound per position below
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(seed + ":"),
                        F.col(id_col).cast("string"),
                        F.lit(":"),
                        i.cast("string"),
                    )
                ),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        % 10000
    )
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("_toks")),
        lambda i: F.struct(
            i.alias("pos"),
            F.element_at("_toks", i).alias("tok"),
            (draw(i) < rate_bp).alias("masked"),
        ),
    )
    bound = toked.select(id_col, F.size("_toks").alias("n_tokens"), pairs.alias("_p"))
    masked_text = F.array_join(
        F.transform(
            "_p",
            lambda s: F.when(s["masked"], F.lit(mask_token)).otherwise(
                s["tok"]
            ),
        ),
        " ",
    )
    hits = F.filter("_p", lambda s: s["masked"])
    targets = F.array_join(
        F.transform(
            hits,
            lambda s: F.concat(
                s["pos"].cast("string"), F.lit(":"), s["tok"]
            ),
        ),
        " ",
    )
    return bound.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.size(hits).cast("long").alias("n_masked"),
        masked_text.alias("masked_text"),
        targets.alias("targets"),
    )


def span_corruption(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    rate_bp: int = 500,
    span_len: int = 3,
    seed: str = "t5span",
) -> DataFrame:
    """T5-style span corruption, fully deterministic: a seeded md5 draw
    per (doc, position) marks SPAN STARTS (rate_bp basis points); each
    start masks ``span_len`` consecutive tokens; runs of masked tokens
    (overlapping spans merge) collapse to ONE sentinel ``<extra_id_k>``
    in the input, and the target spells each sentinel followed by the
    tokens it hides — the denoising objective's (input, target) pair.

    Returns (id, n_tokens, n_spans, corrupted_text, target_text).

    Scan-local: one ``F.aggregate`` fold over the bound token array
    carries (sentinel counter, prev-masked flag, both output strings);
    the masked flag for position i re-derives the <= span_len seed
    draws behind it directly (constant md5s per position — sharing a
    draws array across lambda accesses would re-evaluate the whole
    array per element_at, the no-CSE HOF rule). Zero shuffles; the
    DuckDB oracle states the same semantics relationally
    (explode -> gaps-and-islands -> string_agg).
    """
    toked = df.select(F.col(id_col), tokens(text_col).alias("_toks"))

    def draw_lt(i) -> Column:
        return (
            F.conv(
                F.substring(
                    F.md5(
                        F.concat(
                            F.lit(seed + ":"),
                            F.col(id_col).cast("string"),
                            F.lit(":"),
                            i.cast("string"),
                        )
                    ),
                    1,
                    7,
                ),
                16,
                10,
            ).cast("long")
            % 10000
            < rate_bp
        )

    def masked(i) -> Column:
        conds = [draw_lt(i)]
        for back in range(1, span_len):
            conds.append((i > back) & draw_lt(i - back))
        out = conds[0]
        for c in conds[1:]:
            out = out | c
        return out

    sentinel = lambda k: F.concat(  # noqa: E731
        F.lit("<extra_id_"), k.cast("string"), F.lit(">")
    )
    acc0 = F.struct(
        F.lit(-1).alias("k"),
        F.lit(False).alias("pm"),
        F.lit("").alias("src"),
        F.lit("").alias("tgt"),
    )

    def step(acc, i):
        tok = F.element_at("_toks", i)
        m = masked(i)
        start = m & ~acc["pm"]
        k2 = F.when(start, acc["k"] + 1).otherwise(acc["k"])
        src2 = F.when(
            m & start, F.concat(acc["src"], F.lit(" "), sentinel(k2))
        ).when(m, acc["src"]).otherwise(
            F.concat(acc["src"], F.lit(" "), tok)
        )
        tgt2 = F.when(
            start,
            F.concat(acc["tgt"], F.lit(" "), sentinel(k2), F.lit(" "), tok),
        ).when(m, F.concat(acc["tgt"], F.lit(" "), tok)).otherwise(
            acc["tgt"]
        )
        return F.struct(
            k2.alias("k"), m.alias("pm"), src2.alias("src"), tgt2.alias("tgt")
        )

    folded = F.aggregate(
        F.sequence(F.lit(1), F.size("_toks")), acc0, step
    )
    return toked.select(
        id_col,
        F.size("_toks").cast("long").alias("n_tokens"),
        (folded.getField("k") + 1).cast("long").alias("n_spans"),
        F.ltrim(folded.getField("src")).alias("corrupted_text"),
        F.ltrim(folded.getField("tgt")).alias("target_text"),
    )
