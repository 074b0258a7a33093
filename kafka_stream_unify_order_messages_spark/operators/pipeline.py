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

from pyspark.sql import DataFrame
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

    # exact dedup WITHOUT shuffling document bodies: only (digest, id)
    # pairs go through the exchange — at the 100 TB design point a
    # min_by(struct(id, text, ...)) groupBy would ship the entire corpus
    # through one shuffle. Winners reuse the same hash partitioning
    # (exchange reuse), losers are the duplicate ids only — a small
    # fraction of the corpus — so the anti-join broadcasts and the
    # corpus side never shuffles at all.
    hashed = scored.select(
        F.col(id_col), F.md5(D.normalized_text(text_col)).alias("_ch")
    )
    winners = hashed.groupBy("_ch").agg(F.min(id_col).alias("_keep"))
    exact_losers = (
        hashed.join(winners, "_ch")
        .filter(F.col(id_col) != F.col("_keep"))
        .select(id_col)
    )
    exact = scored.join(F.broadcast(exact_losers), id_col, "left_anti")

    # `exact` feeds two DAG branches (candidate generation + the anti-join
    # probe); persist it so quality scoring + dedup run once, not twice —
    # the same materialization point a production pipeline would keep
    from pyspark import StorageLevel

    exact = exact.persist(StorageLevel.MEMORY_AND_DISK)

    # star edges, not pairs: connectivity is all clustering needs, and
    # the edge form stays linear in bucket size where the pair form is
    # quadratic on heavily-duplicated buckets
    pairs = D.minhash_candidate_edges(
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


def bigram_lm_scores(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
) -> DataFrame:
    """Statistical LM quality scoring (the KenLM-style pretraining filter):
    train an add-``alpha`` smoothed bigram model on the corpus itself,
    then score every document by its average per-bigram negative log
    likelihood — high ``avg_nll`` flags incoherent / boilerplate text.

        p(w2 | w1) = (C(w1,w2) + alpha) / (C(w1,·) + alpha · V)

    Returns (id, n_bigrams, avg_nll, ppl) for documents with at least one
    bigram; ``ppl = exp(avg_nll)``. Scores are rounded to 6dp (ppl 4dp)
    so cross-engine summation-order drift cannot flip a comparison.

    Scale shape: the count tables are vocabulary-sized — O(distinct
    bigrams), orders of magnitude below corpus size — so AQE turns both
    scoring joins into broadcasts when they fit; V is a one-row cross
    join. The corpus is scanned once for counts and once for scoring;
    nothing is collected to the driver. To train on a sample but score
    the full corpus, pass the sample through a separate counts build —
    the joins are the same.
    """
    # let-bind tokens as a lambda variable (free tokens(text) inside the
    # bigram lambda would re-run the regexp split per element — no CSE in
    # interpreted HOFs; cf. shingles_from_tokens)
    bigram_array = F.element_at(
        F.transform(
            F.array(T.tokens(text_col)),
            lambda w: F.transform(
                F.sequence(F.lit(1), F.size(w) - 1),
                lambda i: F.struct(
                    F.element_at(w, i).alias("w1"),
                    F.element_at(w, i + 1).alias("w2"),
                ),
            ),
        ),
        1,
    )
    # `big` feeds both the count build and the scoring join; it is
    # deliberately NOT persisted — the explode stays inside whole-stage
    # codegen and re-running it per consumer measured faster (1.24s vs
    # 1.7s at sf0.1) than materializing a corpus-sized bigram stream,
    # and at scale a second scan beats spilling O(tokens) rows to disk
    big = (
        docs.filter(F.size(T.tokens(text_col)) >= 2)
        .select(F.col(id_col), F.explode(bigram_array).alias("bg"))
        .select(id_col, "bg.w1", "bg.w2")
    )

    bigram_counts = big.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bg")
    )
    context_counts = big.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    # every corpus token appears as w1 or w2 of some bigram, so the
    # vocabulary is recoverable from the two (small, distinct-keyed)
    # count tables — no third pass over the corpus-sized bigram stream
    vocab = (
        context_counts.select(F.col("w1").alias("w"))
        .unionAll(bigram_counts.select(F.col("w2").alias("w")))
        .agg(F.count_distinct("w").alias("v"))
    )

    nll = -F.log(
        (F.col("c_bg") + F.lit(alpha))
        / (F.col("c_w1") + F.lit(alpha) * F.col("v"))
    )
    return (
        big.join(bigram_counts, ["w1", "w2"])
        .join(context_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(nll), 6).alias("avg_nll"),
            F.round(F.exp(F.avg(nll)), 4).alias("ppl"),
        )
    )


def temperature_sample(
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    alpha: float = 0.7,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Temperature-based source re-balancing (the training-mix step):
    sample group ``s`` with weight proportional to ``n_s ** alpha`` —
    ``alpha < 1`` up-samples small sources relative to their natural
    share — scaled so the expected kept total is ``budget_frac`` of the
    corpus, capped at keeping a group entirely.

        p_keep(s) = min(1, n_s^alpha / Z * budget_frac * N / n_s)

    The per-document draw is a deterministic 28-bit md5 hash compared
    against an integer threshold ``floor(p_keep * 2^28)`` — comparing
    integers, not floats, so a last-ulp ``pow`` difference between
    engines cannot flip a row across the boundary.

    Scale shape: group counts are one map-side-combined aggregate; the
    probability table is O(groups) rows and broadcasts; the corpus side
    is a scan + broadcast-hash-join + filter — no corpus shuffle.
    """
    counts = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_s"))
    tot = counts.agg(
        F.sum("n_s").cast("double").alias("n_total"),
        F.sum(F.pow(F.col("n_s").cast("double"), F.lit(alpha))).alias("z"),
    )
    probs = counts.crossJoin(tot).select(
        group_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.pow(F.col("n_s").cast("double"), F.lit(alpha))
                / F.col("z")
                * F.lit(budget_frac)
                * F.col("n_total")
                / F.col("n_s").cast("double"),
            )
            * F.lit(float(1 << 28))
        )
        .cast("long")
        .alias("thr"),
    )
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("temp:"), F.col(id_col).cast("string"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.join(F.broadcast(probs), group_col)
        .filter(draw < F.col("thr"))
        .select(id_col, group_col)
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

    Scale: the first-occurrence choice is a map-side-combinable
    ``groupBy(digest).agg(min(struct(id, pos)))`` — a hot boilerplate
    chunk repeated millions of times collapses to one row per input
    partition BEFORE its exchange, and the verdict join on the digest is
    AQE-skew-splittable (a row_number window over the digest would
    instead sort one unsplittable partition per hot chunk). Reassembly
    shuffles (id, position, chunk); everything is O(corpus tokens), no
    state on the driver.
    """
    hashed = _chunked(docs, id_col, text_col, chunk_words)
    first_owner = hashed.groupBy("_ch").agg(
        F.min(F.struct(F.col(id_col), F.col("chunk_idx"))).alias("_f")
    )
    flagged = hashed.join(first_owner, "_ch").withColumn(
        "is_first",
        (F.col(f"_f.{id_col}") == F.col(id_col))
        & (F.col("_f.chunk_idx") == F.col("chunk_idx")),
    )
    return _reassemble(flagged, id_col, keep=F.col("is_first"))


def _chunked(
    docs: DataFrame, id_col: str, text_col: str, chunk_words: int
) -> DataFrame:
    """(id, chunk_idx, chunk, _ch digest) rows: fixed ``chunk_words``-word
    windows over the whitespace token array, digested with the portable
    md5 convention. Scan-local — shared by dedup_lines (first-occurrence
    keep) and remove_boilerplate (doc-frequency drop)."""
    # let-bind the token array as a lambda variable: a free `split(text)`
    # inside the chunk lambda would be re-evaluated per chunk (no CSE in
    # interpreted HOFs), turning chunking O(len^2 / chunk_words) per doc;
    # slice itself copies only its chunk_words-element output, so total
    # work per doc stays O(len)
    chunk_array = F.element_at(
        F.transform(
            F.array(F.split(F.col(text_col), " ")),
            lambda w: F.transform(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size(w) / F.lit(chunk_words)).cast("int") - 1,
                ),
                lambda i: F.array_join(
                    F.slice(w, i * chunk_words + 1, chunk_words), " "
                ),
            ),
        ),
        1,
    )
    return docs.select(
        F.col(id_col),
        F.posexplode(chunk_array).alias("chunk_idx", "chunk"),
    ).withColumn("_ch", F.md5("chunk"))


def _reassemble(flagged: DataFrame, id_col: str, keep) -> DataFrame:
    """Rebuild (id, clean_text, n_kept, n_dropped) from per-chunk keep
    verdicts, preserving original chunk order."""
    return (
        flagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(keep, F.struct("chunk_idx", "chunk"))
                        )
                    ),
                    lambda s: s["chunk"],
                ),
                " ",
            ).alias("clean_text"),
            F.sum(F.when(keep, 1).otherwise(0)).cast("long").alias("n_kept"),
            F.sum(F.when(~keep, 1).otherwise(0))
            .cast("long")
            .alias("n_dropped"),
        )
    )


def remove_boilerplate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 12,
    max_doc_freq: int = 3,
) -> DataFrame:
    """Corpus-frequency boilerplate removal (the CCNet / RefinedWeb
    "drop lines that repeat across many pages" step): a chunk is
    boilerplate when it occurs in MORE THAN ``max_doc_freq`` distinct
    documents, and is then dropped from EVERY document — unlike
    :func:`dedup_lines`, which keeps the first occurrence. Headers,
    nav bars, and cookie banners repeat across a whole domain; keeping
    one copy per digest (line dedup) still leaves one junk copy, so the
    two steps are complementary and real pipelines run both.

    Returns (id, clean_text, n_kept, n_dropped).

    Scale: doc-frequency is two map-side-combinable aggregations —
    (digest, id) collapse (a chunk repeated within one doc counts once)
    then a digest count. No countDistinct Expand, no window. The verdict
    join keys on the digest; the boilerplate side is the FILTERED
    digest set (only digests with df > max_doc_freq — a tiny fraction of
    the corpus), so AQE broadcasts it and the chunk stream never
    re-shuffles. At 100 TB nothing driver-sized exists anywhere:
    digests, counts, and verdicts all stay distributed.
    """
    hashed = _chunked(docs, id_col, text_col, chunk_words)
    boiler = (
        hashed.select("_ch", id_col)
        .groupBy("_ch", id_col)
        .agg(F.lit(1).alias("_one"))
        .groupBy("_ch")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") > max_doc_freq)
        .select("_ch", F.lit(True).alias("_bp"))
    )
    flagged = hashed.join(boiler, "_ch", "left")
    return _reassemble(flagged, id_col, keep=F.col("_bp").isNull())


def gopher_quality(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 10.0,
    min_alpha_frac: float = 0.8,
    min_stop_hits: int = 2,
    stopwords: tuple[str, ...] = ("the", "a", "of", "and", "to", "in"),
) -> DataFrame:
    """Gopher-style rule-cascade quality filter (Rae et al. 2021 §A1.1 /
    Dolma): per-document structural heuristics, each surfaced as its own
    flag so a pipeline can audit WHICH rule rejected a document.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_word_len, max_mean_word_len]; fraction of words containing
    an alphabetic character >= min_alpha_frac; at least min_stop_hits
    stopword occurrences (the classic "ratio of closed-class words"
    boilerplate detector). Ratios are rounded to 4dp BEFORE thresholding
    so the keep boundary is engine-stable.

    Scale: pure scan-local column expressions (one whitespace split +
    two lambda filters over the bound token array) — zero shuffles, zero
    Python; composes with clean_corpus as a pre-filter.
    """
    toks = T.tokens(text_col)
    n_words = F.size(toks)
    nonspace = F.length(
        F.regexp_replace(F.trim(F.col(text_col)), r"\s+", "")
    )
    # integer ratios round THROUGH decimal(38,10): small-denominator
    # ratios land exactly on x.xxxx5, where rounding the raw double is
    # engine-dependent (see queries_relational min_cost_supplier)
    mean_word_len = (
        F.round((nonspace / n_words).cast("decimal(38,10)"), 4)
        .cast("double")
    )
    alpha_frac = (
        F.round(
            (
                F.size(F.filter(toks, lambda w: w.rlike("[a-z]")))
                / n_words
            ).cast("decimal(38,10)"),
            4,
        )
        .cast("double")
    )
    stop_hits = F.size(F.filter(toks, lambda w: w.isin(*stopwords)))
    r_words = (n_words >= min_words) & (n_words <= max_words)
    r_mean = (mean_word_len >= min_mean_word_len) & (
        mean_word_len <= max_mean_word_len
    )
    r_alpha = alpha_frac >= min_alpha_frac
    r_stop = stop_hits >= min_stop_hits
    return docs.select(
        F.col(id_col),
        n_words.alias("n_words"),
        mean_word_len.alias("mean_word_len"),
        alpha_frac.alias("alpha_frac"),
        stop_hits.alias("stop_hits"),
        r_words.alias("r_words"),
        r_mean.alias("r_mean_len"),
        r_alpha.alias("r_alpha"),
        r_stop.alias("r_stopwords"),
        (r_words & r_mean & r_alpha & r_stop).alias("keep"),
    )


def token_budget_mixture(
    docs: DataFrame,
    id_col: str = "doc_id",
    group_col: str = "source",
    size_col: str = "n_tokens",
    alpha: float = 0.7,
    budget_frac: float = 0.5,
) -> DataFrame:
    """Token-budget training mixture: the token-weighted sibling of
    ``temperature_sample``. Sources draw with weight ``T_s ** alpha``
    (T_s = total TOKENS in source, not document count — what production
    mixes actually budget), scaled so expected kept tokens ≈
    ``budget_frac`` of the corpus total, capped at keeping a source
    entirely:

        p_keep(s) = min(1, T_s^alpha / Z * budget_frac * T_total / T_s)

    Per-document keep decisions use the deterministic integer-threshold
    md5 draw (see temperature_sample) so the boundary is engine-stable.

    Scale shape: one map-side-combined token-sum aggregate; O(groups)
    probability table broadcasts; corpus side is scan + broadcast join +
    filter — no corpus shuffle. Returns (id, group, size).
    """
    sums = docs.groupBy(group_col).agg(
        F.sum(size_col).alias("t_s")
    )
    tot = sums.agg(
        F.sum("t_s").cast("double").alias("t_total"),
        F.sum(F.pow(F.col("t_s").cast("double"), F.lit(alpha))).alias("z"),
    )
    probs = sums.crossJoin(tot).select(
        group_col,
        F.floor(
            F.least(
                F.lit(1.0),
                F.pow(F.col("t_s").cast("double"), F.lit(alpha))
                / F.col("z")
                * F.lit(budget_frac)
                * F.col("t_total")
                / F.col("t_s").cast("double"),
            )
            * F.lit(float(1 << 28))
        )
        .cast("long")
        .alias("thr"),
    )
    draw = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("tokmix:"), F.col(id_col).cast("string"))),
            1,
            7,
        ),
        16,
        10,
    ).cast("long")
    return (
        docs.join(F.broadcast(probs), group_col)
        .filter(draw < F.col("thr"))
        .select(id_col, group_col, size_col)
    )


def ngram_novelty(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    shingles whose globally-first occurrence (lowest id) is this document
    — the "how much NEW content does this doc add" contribution signal
    data-selection pipelines rank on (the streaming analogue: dedup in
    arrival order and measure what survives).
    Returns (doc_id, n_shingles, n_novel, novelty).

    Scale shape: one shuffle on the shingle hash for the global
    first-occurrence aggregation (map-side-combinable min), one shuffle
    on id for the per-doc rollup; both move (id, shingle-hash) longs,
    never text. No quadratic step — novelty is a postings aggregation,
    not a pairwise comparison.
    """
    sh = D._exploded_shingles(df, id_col, text_col, shingle_n).select(
        id_col,
        # 60-bit md5-prefix hash: the wide stages move (id, long) pairs,
        # not shingle strings; both engines hash identically so the
        # (negligible) collision set merges the same shingles on each side
        F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
        .cast("long")
        .alias("gh"),
    )
    firsts = sh.groupBy("gh").agg(F.min(id_col).alias("_first"))
    joined = sh.join(firsts, "gh")
    per_doc = joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum(
            (F.col(id_col) == F.col("_first")).cast("long")
        ).alias("n_novel"),
    )
    novelty = (
        F.round(
            (F.col("n_novel") / F.col("n_shingles")).cast(
                "decimal(38,10)"
            ),
            6,
        )
        .cast("double")
        .alias("novelty")
    )
    return per_doc.select(id_col, "n_shingles", "n_novel", novelty)


def bloom_decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    ngram_n: int = 4,
    m: int = 1 << 18,
    k: int = 3,
) -> DataFrame:
    """Bloom-filter benchmark decontamination — the SKETCH path for when
    the exact bench-gram set outgrows a broadcast (billions of grams at
    100 TB): each gram maps to ``k`` md5-derived positions in an
    ``m``-slot space; a corpus gram is flagged when ALL ``k`` of its
    positions are occupied by some bench gram. One-sided error by
    construction: no false negatives, false positives at the classic
    (1 - e^(-kn/m))^k rate. The position set is ``k * |bench|`` longs at
    most — a fraction of the gram strings' size — and broadcasts where
    the strings could not.

    Returns (id, n_bloom_hits, n_exact_hits) per flagged doc; the exact
    column is the audit measurement (bloom >= exact always; the gap IS
    the observed false-positive count). Deterministic md5 hashing keeps
    every position — and therefore the exact false-positive set —
    engine-portable for oracle checking.
    """
    from kafka_stream_unify_order_messages_spark.operators.dedup import (
        _exploded_shingles,
    )

    def pos_expr(i: int) -> Column:
        h = F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle"))), 1, 7
            ),
            16,
            10,
        ).cast("long")
        return (h % m).alias("pos")

    corpus_grams = _exploded_shingles(docs, id_col, text_col, ngram_n)
    bench_grams = (
        _exploded_shingles(benchmark, id_col, text_col, ngram_n)
        .select("shingle")
        .distinct()
    )
    bpos = F.broadcast(
        bench_grams.select(
            F.explode(F.array(*[pos_expr(i) for i in range(k)])).alias(
                "pos"
            )
        ).distinct()
    )
    probe = F.array(
        *[
            F.struct(F.lit(i).alias("i"), pos_expr(i))
            for i in range(k)
        ]
    )
    cpos = corpus_grams.select(
        F.col(id_col), F.col("shingle"), F.explode(probe).alias("p")
    ).select(id_col, "shingle", F.col("p.i").alias("i"), F.col("p.pos").alias("pos"))
    flagged = (
        cpos.join(bpos, "pos")
        .groupBy(id_col, "shingle")
        .agg(F.count_distinct("i").alias("_ki"))
        .filter(F.col("_ki") == k)
        .select(id_col, "shingle")
    )
    exact = (
        corpus_grams.join(F.broadcast(bench_grams), "shingle")
        .select(F.col(id_col), F.col("shingle"), F.lit(1).alias("_ex"))
    )
    return (
        flagged.join(exact, [id_col, "shingle"], "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bloom_hits"),
            F.sum(F.coalesce(F.col("_ex"), F.lit(0)))
            .cast("long")
            .alias("n_exact_hits"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-style importance resampling weights (Xie et al., "Data Selection
# for Language Models via Importance Resampling", 2023): score every raw
# document by how target-like its hashed n-gram distribution is. The
# weight is the log-likelihood ratio sum_t ln(p_target(b(t)) / p_raw(b(t)))
# over the document's tokens, with both distributions estimated on hashed
# feature buckets under add-alpha smoothing.
#
# Shuffle budget: one explode+agg to the BUCKET-sized count table (fixed
# m rows — broadcast back), then one (doc) aggregation for the per-doc
# sum. The corpus never self-joins and the model state is O(m), so the
# operator scales linearly in corpus size regardless of vocabulary.
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 512
DSIR_ALPHA = 0.5


def dsir_log_weights(
    docs: DataFrame,
    is_target: F.Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = DSIR_BUCKETS,
    alpha: float = DSIR_ALPHA,
) -> DataFrame:
    """(id, n_tokens, log_weight): add-alpha smoothed hashed-unigram
    log-likelihood ratio of target vs raw (full corpus) distributions.

    ``is_target`` is a boolean Column over ``docs`` selecting the target
    domain. Buckets use the shared md5 convention ('dsir|' || token), so
    DuckDB reproduces the exact feature mapping. log_weight is rounded
    to 6 decimals after the final sum only.
    """
    toks = docs.select(
        F.col(id_col),
        is_target.alias("_tgt"),
        F.explode(T.tokens(text_col)).alias("token"),
    ).withColumn(
        "bucket",
        F.conv(
            F.substring(F.md5(F.concat(F.lit("dsir|"), F.col("token"))), 1, 15),
            16,
            10,
        ).cast("long")
        % buckets,
    )

    counts = toks.groupBy("bucket").agg(
        F.sum(F.when(F.col("_tgt"), 1).otherwise(0)).alias("ct"),
        F.count(F.lit(1)).alias("cr"),
    )
    totals = counts.agg(
        F.sum("ct").cast("double").alias("tt"),
        F.sum("cr").cast("double").alias("tr"),
    )
    probs = counts.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            F.log((F.col("ct") + F.lit(alpha)) / (F.col("tt") + F.lit(alpha * buckets)))
            - F.log((F.col("cr") + F.lit(alpha)) / (F.col("tr") + F.lit(alpha * buckets)))
        ).alias("llr"),
    )

    return (
        toks.join(F.broadcast(probs), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.sum("llr"), 6).alias("log_weight"),
        )
    )


def source_token_divergence(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group token-distribution drift vs the whole corpus:
    ``KL(p_g || q)`` where ``p_g`` is group ``g``'s unigram
    distribution and ``q`` the corpus-wide one, plus the group's token
    volume and vocabulary size.

    This is the standard corpus-composition diagnostic (which sources
    are unigram-atypical — boilerplate, spam, code mixed into prose)
    and the selection signal DSIR generalizes; ``dsir_log_weights``
    scores DOCUMENTS against a target, this scores SOURCES against the
    corpus. KL is finite by construction: every group token appears in
    the corpus distribution (q > 0 wherever p > 0).

    Scale shape: one shuffle to (group, token) counts (map-side
    combinable); corpus totals derive from THAT compact frame, not a
    second scan (one more shuffle on token); the final join is
    token-keyed between two count frames bounded by |vocab|, never by
    corpus size. The KL sum is rounded to 6 decimals to absorb
    summation-order float drift across engines.
    """
    tok = df.select(
        F.col(group_col).alias("grp"),
        F.explode(T.tokens(text_col)).alias("token"),
    )
    gt = tok.groupBy("grp", "token").agg(F.count(F.lit(1)).alias("n_gt"))
    gt = gt.persist()
    g_tot = gt.groupBy("grp").agg(
        F.sum("n_gt").alias("n_g"),
        F.count(F.lit(1)).alias("vocab_g"),
    )
    corpus = gt.groupBy("token").agg(F.sum("n_gt").alias("n_t"))
    n_total = corpus.agg(F.sum("n_t").alias("n_total"))
    contrib = (
        gt.join(corpus, "token")
        .join(F.broadcast(g_tot), "grp")
        .crossJoin(F.broadcast(n_total))
        .select(
            "grp",
            (
                (F.col("n_gt") / F.col("n_g"))
                * F.log(
                    (F.col("n_gt") / F.col("n_g"))
                    / (F.col("n_t") / F.col("n_total"))
                )
            ).alias("term"),
        )
    )
    return (
        contrib.groupBy("grp")
        .agg(F.round(F.sum("term"), 6).alias("kl_vs_corpus"))
        .join(F.broadcast(g_tot), "grp")
        .select(
            F.col("grp").alias(group_col),
            "kl_vs_corpus",
            F.col("n_g").cast("long").alias("n_tokens"),
            F.col("vocab_g").cast("long").alias("vocab_size"),
        )
    )


def priority_sample(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "psample:",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement — priority sampling
    (Duffield, Lund & Thorup, "Priority sampling for estimation of
    arbitrary subset sums", JACM 2007): row i draws priority
    p_i = w_i / u_i with u_i uniform on (0, 1] and w_i =
    ``weight_col``; the k LARGEST priorities are the sample (see
    ``_dlt_priority`` for the exact shared keying). With weight =
    token count this is the "sample tokens, not documents" corpus
    subsample.

    Sibling of ``operators/curation.py:weighted_sample`` (A-ES
    exponential keys, per-stratum exactly-k) — same job, different
    published scheme and different guarantees: A-ES keys need ``ln``,
    whose last-ulp behavior is libm-specific, so that operator rounds
    keys to 9 decimals to pin a cross-engine frontier; DLT priorities
    are bit-exact BY CONSTRUCTION with NO rounding — the draw is an
    exact integer (first 7 md5 hex digits of ``seed || id`` plus 1,
    <= 2^28) and the weight an exact integer, so the priority is ONE
    IEEE division of two exactly-representable integers, correctly
    rounded and identical on every engine. DLT also carries the
    unbiased subset-sum estimator the paper is about (weight estimate
    w_i-hat = max(w_i, threshold)), which A-ES lacks. Use this one for
    a global weighted top-k; use ``weighted_sample`` when per-stratum
    exactly-k is the contract. Zero/negative weights are ineligible
    (u/0 would select unconditionally).

    Scale shape: the draw is computed scan-side (no shuffle of the
    weight source) and the k largest priorities resolve via
    orderBy().limit(k) -> TakeOrderedAndProject — per-partition size-k
    heaps and a k-row driver merge, never a global sort. One scan at
    any corpus size.
    """
    _require_integral_weight(df, weight_col)
    keyed = df.filter(F.col(weight_col) > 0).withColumn(
        "_p", _dlt_priority(weight_col, id_col, seed)
    )
    return keyed.orderBy(F.desc("_p"), id_col).limit(k).drop("_p")


def _require_integral_weight(df: DataFrame, weight_col: str) -> None:
    """The DLT keying's bit-exactness argument (one correctly-rounded
    IEEE division of EXACT integers) and its ``cast("long")`` both
    assume integral weights; a fractional weight would be silently
    truncated — a row with weight 0.5 passes the ``> 0`` eligibility
    filter but gets priority 0 and is effectively never sampled, while
    ``w_hat`` would still use the un-truncated value. Fail loudly
    instead: reject non-integral weight columns up front."""
    from pyspark.sql.types import (
        ByteType, IntegerType, LongType, ShortType,
    )

    dtype = df.schema[weight_col].dataType
    if not isinstance(dtype, (ByteType, ShortType, IntegerType, LongType)):
        raise TypeError(
            f"priority sampling requires an integral weight column "
            f"(got {weight_col}: {dtype.simpleString()}); fractional "
            f"weights would be silently truncated by the exact-integer "
            f"keying — cast or rescale to integers (e.g. token counts) "
            f"explicitly first"
        )


def _dlt_priority(weight_col: str, id_col: str, seed: str) -> F.Column:
    """The shared DLT priority p = w * 2^28 / draw, draw uniform on
    1..2^28 (so draw/2^28 is uniform on (0, 1] and p = w/u on the
    paper's scale). Selection-only consumers could use any rescaling,
    but ``priority_sample`` and ``priority_sample_estimates`` MUST rank
    the same double — two mathematically-equal representations (u/w
    ascending vs w/u descending) round differently in IEEE and can
    swap near-tied boundary rows, so sharing this expression is what
    makes the two functions select the same sample. Exact in double for
    w < 2^25 (~33M tokens per row). Callers validate the weight column
    is integral (``_require_integral_weight``) — the ``cast("long")``
    here is a type normalization, never a value truncation."""
    draw = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("long")
        + 1
    )
    return (
        F.col(weight_col).cast("long") * F.lit(1 << 28)
    ).cast("double") / draw.cast("double")


def priority_sample_estimates(
    df: DataFrame,
    k: int,
    weight_col: str,
    id_col: str = "doc_id",
    seed: str = "psample:",
) -> DataFrame:
    """``priority_sample`` plus the estimator that is the POINT of the
    DLT scheme: each sampled row carries ``w_hat = max(w, tau)`` where
    ``tau`` is the (k+1)-th largest priority ``p = w/u`` — for ANY
    subset S fixed in advance, ``sum(w_hat where i in S)`` is an
    unbiased estimate of S's true total weight (Duffield-Lund-Thorup,
    JACM 2007, Thm 1). With weight = token count: estimate the token
    mass of any slice (a language, a source, a quality band) from the
    k-row sample alone, without rescanning the corpus.

    The estimator (unlike bare selection) needs the draw on the paper's
    (0, 1] scale — tau competes against raw weights in ``max(w, tau)``
    — which ``_dlt_priority`` provides; sharing that exact expression
    with ``priority_sample`` is also what guarantees the two functions
    select the SAME rows (two mathematically-equal priority
    representations can IEEE-round into different boundary orders).
    Bit-exactness: the priority is one correctly-rounded IEEE division
    of exact integers and ``max`` introduces no rounding, so sample AND
    estimates are engine-identical.

    Membership is decided by RANK (row_number over (p desc, id) <= k),
    not by ``p > tau``: priorities can genuinely tie (u-collisions
    happen at birthday rates — observed at ~6.6k docs over 2^28 draw
    space), and a strict-inequality frontier under-selects on a tie at
    tau. tau itself is the minimum priority of the top k+1, which IS
    the rank-(k+1) priority even under ties. Requires ``k`` < the
    number of eligible rows.

    Scale shape: ONE scan — priorities are scan-local, the top (k+1)
    resolve via TakeOrderedAndProject, and the rank/threshold window
    runs over that (k+1)-row frame (single partition of k+1 rows, not
    of the corpus).
    """
    _require_integral_weight(df, weight_col)
    keyed = df.filter(F.col(weight_col) > 0).withColumn(
        "_p", _dlt_priority(weight_col, id_col, seed)
    )
    top = keyed.orderBy(F.desc("_p"), id_col).limit(k + 1)
    from pyspark.sql import Window as _W

    w = _W.partitionBy(F.lit(1))
    return (
        top.withColumn(
            "_rn", F.row_number().over(w.orderBy(F.desc("_p"), id_col))
        )
        .withColumn("_tau", F.min("_p").over(w))
        .filter(F.col("_rn") <= k)
        .withColumn(
            "w_hat",
            F.greatest(F.col(weight_col).cast("double"), F.col("_tau")),
        )
        .drop("_p", "_rn", "_tau")
    )
