"""Portable frequency sketches: a count-min sketch built from DataFrame
aggregations with md5-derived hash rows, so the whole sketch — and its
error — is value-checkable against DuckDB.

Spark ships a native count_min_sketch aggregate, but its murmur-based
cells aren't reproducible outside the JVM; this implementation trades a
few md5 calls for a sketch whose every cell both engines agree on, which
is what lets the accuracy evaluation below be an oracle-checked query
(same pattern as lsh_recall_eval / ann_pq_recall_eval).

Scale shape: the corpus collapses to (token, count) in one shuffle; the
sketch itself is a FIXED depth x width table (d*w cells regardless of
corpus size) built from the count table and broadcast back for the
estimate join. At 100 TB the exact-count side is the expensive path —
the point of the sketch — so the evaluation doubles as the migration
test for replacing exact counts with cells.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from kafka_stream_unify_order_messages_spark.functions.text import tokens

CMS_DEPTH = 4
CMS_WIDTH = 256


def _cms_bucket(row: int, token_col) -> F.Column:
    """Row-r bucket of a token: md5('cms<r>|' || token) mod width."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"cms{row}|"), token_col)), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % CMS_WIDTH
    )


def token_counts(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, exact_count): the one corpus-sized shuffle."""
    return (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("exact_count"))
    )


def cms_estimate_error(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(token, exact_count, cms_estimate, overcount): every distinct
    token's count-min estimate next to its exact count.

    The estimate is min over the sketch's depth rows of the cell the
    token hashes into; overcount = estimate - exact is >= 0 by
    construction (a violated invariant means a broken sketch, so the
    column doubles as a built-in audit, like bloom_decontaminate's
    false-positive columns).
    """
    counts = token_counts(df, id_col, text_col)

    rb = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).alias("r"),
                    _cms_bucket(r, F.col("token")).alias("bucket"),
                )
                for r in range(CMS_DEPTH)
            ]
        )
    ).alias("_rb")
    hashed = counts.select("token", "exact_count", rb).select(
        "token",
        "exact_count",
        F.col("_rb.r").alias("r"),
        F.col("_rb.bucket").alias("bucket"),
    )
    cells = hashed.groupBy("r", "bucket").agg(
        F.sum("exact_count").alias("cell")
    )
    return (
        hashed.join(F.broadcast(cells), ["r", "bucket"])
        .groupBy("token")
        .agg(
            F.first("exact_count").alias("exact_count"),
            F.min("cell").alias("cms_estimate"),
        )
        .select(
            "token",
            "exact_count",
            "cms_estimate",
            (F.col("cms_estimate") - F.col("exact_count"))
            .cast("long")
            .alias("overcount"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog distinct-count sketch (Flajolet et al. 2007), md5-derived
# like the CMS above so every register — and the final estimate — is
# value-checkable against DuckDB. Spark's approx_count_distinct is the
# production path (and is benchmarked in tests/test_sketches.py); this
# portable twin exists so the ACCURACY evaluation can be an oracle query.
# ---------------------------------------------------------------------------

HLL_BUCKETS = 256  # 2^8 registers; h is 60 bits -> 52 bits feed rho
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_BUCKETS)


def hll_distinct_per_group(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """(group, n_registers, hll_estimate): HLL over items within each
    group. Register index = low 8 hash bits; rho = leading-zero run of
    the remaining 52 bits + 1, computed integer-exactly via the binary
    string length (no float log2 at bit boundaries). Small-range
    (linear-counting) correction applies below 2.5m when empty registers
    exist — absent registers contribute 2^0 to the harmonic sum.

    Scale shape: one shuffle to (group, bucket) registers — at most
    m rows per group regardless of item count (max() combines map-side)
    — then an m-row-per-group rollup. Never materializes distincts.
    """
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll|"), F.col(item_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    hashed = df.select(F.col(group_col), h).select(
        group_col,
        (F.col("h") % HLL_BUCKETS).alias("bucket"),
        F.shiftrightunsigned("h", 8).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.conv(F.col("w").cast("string"), 10, 2))
    )
    regs = hashed.select(group_col, "bucket", rho.alias("rho")).groupBy(
        group_col, "bucket"
    ).agg(F.max("rho").alias("m"))

    per_group = regs.groupBy(group_col).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
        F.count(F.lit(1)).alias("n_present"),
    )
    s_total = F.col("s_present") + (
        F.lit(HLL_BUCKETS) - F.col("n_present")
    ).cast("double")
    zeros = F.lit(HLL_BUCKETS) - F.col("n_present")
    e_raw = F.lit(HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS) / s_total
    estimate = F.when(
        (e_raw <= F.lit(2.5 * HLL_BUCKETS)) & (zeros > 0),
        F.lit(float(HLL_BUCKETS)) * F.log(F.lit(float(HLL_BUCKETS)) / zeros),
    ).otherwise(e_raw)
    return per_group.select(
        group_col,
        F.col("n_present").alias("n_registers"),
        F.round(estimate, 6).alias("hll_estimate"),
    )


def hll_registers(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """(group, bucket, m): the raw HLL register frame per group — the
    MERGEABLE form. Same hashing/rho as ``hll_distinct_per_group``;
    exposed so register sets from different groups / partitions / days
    can be combined with a plain max before estimating."""
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("hll|"), F.col(item_col).cast("string"))),
                1,
                15,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h")
    )
    hashed = df.select(F.col(group_col), h).select(
        group_col,
        (F.col("h") % HLL_BUCKETS).alias("bucket"),
        F.shiftrightunsigned("h", 8).alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.conv(F.col("w").cast("string"), 10, 2))
    )
    return (
        hashed.select(group_col, "bucket", rho.alias("rho"))
        .groupBy(group_col, "bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_estimate_expr() -> tuple:
    """(s_present, n_present) -> estimate column builder shared by the
    per-group and merged paths (identical arithmetic, so a merged
    register set estimates EXACTLY like a direct pass over the union)."""

    def build(s_present, n_present):
        s_total = s_present + (F.lit(HLL_BUCKETS) - n_present).cast("double")
        zeros = F.lit(HLL_BUCKETS) - n_present
        e_raw = F.lit(HLL_ALPHA * HLL_BUCKETS * HLL_BUCKETS) / s_total
        return F.when(
            (e_raw <= F.lit(2.5 * HLL_BUCKETS)) & (zeros > 0),
            F.lit(float(HLL_BUCKETS))
            * F.log(F.lit(float(HLL_BUCKETS)) / zeros),
        ).otherwise(e_raw)

    return build


def hll_merge_groups(
    df: DataFrame, group_col: str, item_col: str
) -> DataFrame:
    """One-row proof of HLL mergeability: build per-group register sets,
    MERGE them (max per bucket — the sketch-union operation a 100 TB
    pipeline runs per partition/day/source instead of re-scanning), and
    estimate the global distinct count from the merged registers next to
    a direct single-pass estimate over the ungrouped data.

    merged == direct is an identity, not an approximation: max over
    (group, bucket) maxima is the bucket maximum over the union. The
    output exposes both so the equality is value-checked, plus the sum
    of per-group estimates (which double-counts cross-group overlap —
    the number the merge exists to avoid).

    Scale shape: registers are at most ``HLL_BUCKETS`` rows per group;
    everything after the first (group, bucket) shuffle is sketch-sized.
    """
    regs = hll_registers(df, group_col, item_col).persist()
    build = hll_estimate_expr()

    merged = (
        regs.groupBy("bucket")
        .agg(F.max("m").alias("m"))
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .select(
            F.round(
                build(F.col("s_present"), F.col("n_present")), 6
            ).alias("merged_estimate")
        )
    )
    direct = (
        df.select(F.lit("all").alias("_g"), F.col(item_col))
        .transform(lambda d: hll_registers(d, "_g", item_col))
        .groupBy("_g")
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .select(
            F.round(
                build(F.col("s_present"), F.col("n_present")), 6
            ).alias("direct_estimate")
        )
    )
    per_group_sum = (
        regs.groupBy(group_col)
        .agg(
            F.sum(F.pow(F.lit(2.0), -F.col("m"))).alias("s_present"),
            F.count(F.lit(1)).alias("n_present"),
        )
        .select(
            F.round(build(F.col("s_present"), F.col("n_present")), 6).alias(
                "est"
            )
        )
        .agg(F.round(F.sum("est"), 6).alias("sum_group_estimates"))
    )
    exact = df.agg(
        F.count_distinct(F.col(item_col)).alias("exact_distinct")
    )
    return (
        merged.crossJoin(direct).crossJoin(per_group_sum).crossJoin(exact)
        .select(
            "merged_estimate",
            "direct_estimate",
            "sum_group_estimates",
            "exact_distinct",
            F.round(
                (F.col("merged_estimate") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                6,
            ).alias("rel_error"),
        )
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values / bottom-k) distinct sketch (Bar-Yossef et al.
# 2002; Beyer et al. 2007). md5-derived like the CMS/HLL above so every
# retained hash — and every estimate — is value-checkable against DuckDB.
#
# Why it exists next to HLL: KMV supports set INTERSECTION. The bottom-k
# of a union is computable from per-set bottom-k sketches, and the
# fraction of union minima present in both sets is an unbiased Jaccard
# estimator — the cross-source vocabulary-overlap question HLL's
# union-only registers cannot answer.
# ---------------------------------------------------------------------------

KMV_K = 256
KMV_SPACE = float(2**60)  # 15 hex chars of md5 -> 60-bit hash space


def _kmv_hash(item_col) -> F.Column:
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("kmv|"), _str(item_col))), 1, 15
            ),
            16,
            10,
        ).cast("long")
    )


def _str(col) -> F.Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("string")


def kmv_sketch(
    df: DataFrame, group_col: str, item_col: str, k: int = KMV_K
) -> DataFrame:
    """(group, h): the k smallest distinct item hashes per group — the
    mergeable KMV form (union = union rows, re-take bottom-k).

    Scale shape: one distinct over (group, h) — the same vocabulary-
    sized shuffle class as ``token_counts``, map-side combinable — then
    a row_number window on the group key that Spark's WindowGroupLimit
    rewrites into a per-task bottom-k BEFORE the window exchange, so no
    task ever holds more than k rows per group. Everything downstream
    of this function is sketch-sized (<= k rows per group).
    """
    from pyspark.sql.window import Window

    hashed = df.select(
        F.col(group_col), _kmv_hash(item_col).alias("h")
    ).distinct()
    w = Window.partitionBy(group_col).orderBy("h")
    return (
        hashed.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select(group_col, "h")
    )


def kmv_pair_overlap(
    df: DataFrame, group_col: str, item_col: str, k: int = KMV_K
) -> DataFrame:
    """Pairwise distinct-set overlap between groups, estimated purely
    from KMV sketches and audited against the exact answer.

    For each unordered group pair (a < b) the estimator takes U = the
    k smallest hashes of sketch(a) ∪ sketch(b) (a valid KMV sketch of
    the union), then:

        jaccard_est = |{h in U : h in a AND h in b}| / |U|
        union_est   = |U| < k ? |U| : (k-1) * 2^60 / max(U)
        inter_est   = jaccard_est * union_est

    Exact columns ride along (the accuracy-eval pattern of
    ``cms_estimate_error`` / ``hll_source_distinct``): the exact side is
    the vocabulary-sized computation the sketch replaces at 100 TB,
    where per-source sketches would be built incrementally per
    partition/day and only the <= k-row frames ever meet.

    Scale shape: ONE pass over the input — the distinct (group, item)
    frame is persisted and BOTH halves derive from it (the sketch
    hashes it; the exact audit counts it), so the corpus is tokenized/
    exploded once, not twice. After the bottom-k every frame is bounded
    by |pairs| x 2k rows; the pair grid itself is |groups|^2 (sources,
    languages — small by construction).
    """
    from pyspark.sql.window import Window

    exact_sets = df.select(
        F.col(group_col).alias("g"), _str(item_col).alias("item")
    ).distinct().persist()
    # sketch from the persisted distinct frame: items are unique per
    # group, but two items may COLLIDE to one hash — the (g, h) distinct
    # keeps the bottom-k over distinct hash VALUES, as KMV requires
    hashed = exact_sets.select(
        "g", _kmv_hash(F.col("item")).alias("h")
    ).distinct()
    w0 = Window.partitionBy("g").orderBy("h")
    sk = (
        hashed.withColumn("_rn", F.row_number().over(w0))
        .filter(F.col("_rn") <= k)
        .select(F.col("g").alias(group_col), "h")
        .persist()
    )
    groups = sk.select(F.col(group_col).alias("g")).distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .join(groups.select(F.col("g").alias("gb")))
        .filter(F.col("ga") < F.col("gb"))
    )
    side_a = pairs.join(
        sk.select(F.col(group_col).alias("ga"), "h"), "ga"
    ).select("ga", "gb", "h", F.lit(1).alias("in_a"), F.lit(0).alias("in_b"))
    side_b = pairs.join(
        sk.select(F.col(group_col).alias("gb"), "h"), "gb"
    ).select("ga", "gb", "h", F.lit(0).alias("in_a"), F.lit(1).alias("in_b"))
    member = (
        side_a.unionByName(side_b)
        .groupBy("ga", "gb", "h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w = Window.partitionBy("ga", "gb").orderBy("h")
    u = member.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k
    )
    est = u.groupBy("ga", "gb").agg(
        F.count(F.lit(1)).alias("n_u"),
        F.max("h").alias("h_max"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("matches"),
    )
    union_est = F.when(
        F.col("n_u") < k, F.col("n_u").cast("double")
    ).otherwise(F.lit((k - 1) * KMV_SPACE) / F.col("h_max"))
    jac = F.col("matches") / F.col("n_u")

    sizes = exact_sets.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        exact_sets.select(F.col("g").alias("ga"), "item")
        .join(exact_sets.select(F.col("g").alias("gb"), "item"), "item")
        .filter(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    # LEFT join from the pair grid: a pair with ZERO intersection must
    # still appear (jaccard 0), not silently vanish from the report
    exact = (
        pairs
        .join(sizes.select(F.col("g").alias("ga"), F.col("n").alias("na")), "ga")
        .join(sizes.select(F.col("g").alias("gb"), F.col("n").alias("nb")), "gb")
        .join(inter, ["ga", "gb"], "left")
        .select(
            "ga",
            "gb",
            F.coalesce("n_inter", F.lit(0)).alias("exact_inter"),
            (
                F.col("na")
                + F.col("nb")
                - F.coalesce("n_inter", F.lit(0))
            ).alias("exact_union"),
        )
    )
    return (
        est.join(exact, ["ga", "gb"])
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.round(jac, 6).alias("kmv_jaccard"),
            F.round(
                F.col("exact_inter") / F.col("exact_union"), 6
            ).alias("exact_jaccard"),
            F.round(union_est, 6).alias("kmv_union_est"),
            F.col("exact_union").cast("long").alias("exact_union"),
            F.round(jac * union_est, 6).alias("kmv_inter_est"),
            F.col("exact_inter").cast("long").alias("exact_inter"),
        )
    )


# ---------------------------------------------------------------------------
# Equi-width histogram quantile sketch: the mergeable quantile companion
# to the HLL/KMV/CMS family above. Per shard/group, values reduce to
# (bin, count) over a SHARED fixed [lo, hi] range — additive under merge
# exactly like HLL registers under max — and any quantile is answered by
# linear interpolation inside the bin containing the target rank. The
# precise guarantee is RANK-based: the estimate lies in the bin holding
# the ceil(q*N)-th sorted value, so it is within one bin width of the
# inverse-CDF quantile (hypothesis-tested); against INTERPOLATED
# (percentile_cont-style) quantiles the gap can exceed a bin width when
# heavy ties straddle bins. Deterministic end-to-end (no sampling), so
# the estimate — not just its error bound — is value-checkable against
# DuckDB. At 100 TB the sketch is one narrow map-side-combined shuffle of
# at most n_bins rows per group; the merge and the quantile read touch
# only bin rows, never data.
# ---------------------------------------------------------------------------


def histogram_sketch(
    df: DataFrame,
    group_col: str,
    value_col: str,
    n_bins: int = 64,
) -> DataFrame:
    """(group, lo, hi, bin, cnt): per-group equi-width histogram over the
    GLOBAL [min, max] of ``value_col`` (shared bounds are what make the
    per-group sketches mergeable). The bounds pass is a 1-row aggregate
    broadcast back onto the scan; the sketch itself is one groupBy with
    map-side partial aggregation.
    """
    bounds = df.agg(
        F.min(value_col).cast("double").alias("lo"),
        F.max(value_col).cast("double").alias("hi"),
    )
    v = F.col(value_col).cast("double")
    bin_ = F.when(  # constant column: everything lands in bin 0
        F.col("hi") == F.col("lo"), F.lit(0).cast("long")
    ).otherwise(
        F.least(
            F.floor((v - F.col("lo")) / (F.col("hi") - F.col("lo")) * n_bins)
            .cast("long"),
            F.lit(n_bins - 1).cast("long"),
        )
    )
    return (
        df.crossJoin(F.broadcast(bounds))
        .groupBy(F.col(group_col), F.col("lo"), F.col("hi"),
                 bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def merge_histogram_sketches(sketches: DataFrame) -> DataFrame:
    """(lo, hi, bin, cnt): the MERGE — per-group sketches combine by
    summing counts per bin (shared bounds make this exact: the merged
    sketch is identical to a direct single-pass histogram)."""
    return sketches.groupBy("lo", "hi", "bin").agg(
        F.sum("cnt").alias("cnt")
    )


def histogram_quantiles(
    merged: DataFrame,
    quantiles: list[float],
    n_bins: int = 64,
    group_col: str | None = None,
) -> DataFrame:
    """(q, estimate) — or (group, q, estimate) with ``group_col`` —
    linear-interpolated quantiles from a histogram sketch. The cumulative
    pass runs over at most n_bins rows per group (a bounded frame — the
    windows are over bins, never data; with a group the partition key
    distributes them); absent (empty) bins cannot contain a target rank,
    so the cumsum over present bins is exact. Pass the MERGED sketch for
    global quantiles, or the per-group sketch with ``group_col`` to serve
    every group's quantiles from one shared-binning pass.
    """
    from pyspark.sql import Window

    spark = merged.sparkSession
    keys = [group_col] if group_col else []
    base = Window.partitionBy(*keys) if keys else Window
    # cum AND the per-group total come from windows over the same bounded
    # frame — ONE pass over the sketch, no second aggregation of it
    cum = merged.withColumn(
        "cum",
        F.sum("cnt").over(
            base.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
        ),
    ).withColumn(
        "n",
        F.sum("cnt")
        .over(
            base.orderBy("bin").rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("double"),
    )
    qs = spark.createDataFrame([(q,) for q in quantiles], "q double")
    # clamp the target rank to a tiny positive value so q = 0.0 hits the
    # first present bin (rank 0 can never satisfy `cum - cnt < target`
    # because the first bin's cum-cnt IS 0) and returns that bin's left
    # edge; for q > 0 the clamp is inert (q*n >= q >= 1e-12 whenever the
    # sketch is non-empty), so existing estimates stay bit-identical
    target = F.greatest(F.col("q") * F.col("n"), F.lit(1e-12))
    hit = cum.crossJoin(F.broadcast(qs)).filter(
        (F.col("cum") >= target) & ((F.col("cum") - F.col("cnt")) < target)
    )
    frac = (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt")
    width = (F.col("hi") - F.col("lo")) / n_bins
    return hit.select(
        *keys,
        "q",
        (F.col("lo") + (F.col("bin") + frac) * width).alias("estimate"),
    )


# ---------------------------------------------------------------------------
# Exact frequency heavy hitters via mergeable Misra-Gries candidates
# (Misra & Gries 1982 "Finding repeated elements"; merge operation per
# Agarwal, Cormode, Huang, Phillips, Wei, Yi, "Mergeable Summaries",
# PODS 2012). Two passes, both scans:
#
#   pass 1  per-partition capacity-k MG summary (mapInPandas; the whole
#           partition folds into <= k counters), so the shuffle that
#           follows is PARTITIONS x k rows — candidate-sized, never
#           vocabulary-sized;
#   pass 2  exact recount of the candidate union only (broadcast
#           semi-join onto the item stream), then the threshold filter.
#
# Why the candidate union is a guaranteed superset: MG with capacity k
# keeps every item whose partition-local frequency exceeds n_p/(k+1),
# and any item with global frequency ratio f/n must have at least one
# partition where its local ratio is >= f/n (a weighted average cannot
# exceed its maximum). So with threshold ceil(n/den) and k >= 2*den,
# f >= n/den > n/(k+1) on some partition and the item survives there.
# The exact recount then removes all false positives, which makes the
# OUTPUT independent of partitioning even though the candidate set is
# not — and lets the result be oracle-checked bit-exactly.
#
# This is the scale twin of the full-vocabulary top-k scan
# (queries_llm.py:top_tokens): that plan shuffles a vocabulary-sized
# partial-aggregate map; this one shuffles <= partitions*k summary rows
# plus a candidate-sized recount, at the price of a second corpus scan.
# At 100 TB with a web-scale vocabulary (n-grams: billions of distinct
# keys) the second scan is the cheaper side of that trade.
# ---------------------------------------------------------------------------


def misra_gries_partition_summaries(
    items: DataFrame, k: int, item_col: str = "item"
) -> DataFrame:
    """Per-partition Misra-Gries summaries of the ``item_col`` stream.

    Output rows per input partition: up to ``k`` candidate rows
    (``item``, ``lb`` = the MG counter, a lower bound on the partition
    count minus at most n_p/(k+1)) plus ONE sentinel row with
    ``item IS NULL`` carrying ``n_part`` = the partition's exact item
    count — emitted even for empty partitions, so summing sentinels
    always reproduces the exact corpus total without another scan.

    The kernel is vectorized: each Arrow batch collapses through
    ``value_counts`` (C-side), then the mergeable-summaries MERGE
    reduces to capacity k (subtract the (k+1)-th largest counter from
    all, drop non-positives) — O(distinct-in-batch) per batch, never
    the per-element decrement loop of the textbook formulation.
    """
    if k < 1:
        raise ValueError(f"capacity k must be >= 1 (got {k})")
    import pandas as pd

    def fn(batches):
        counts: pd.Series | None = None
        n = 0
        for pdf in batches:
            vc = pdf[item_col].value_counts()
            n += int(vc.sum())
            counts = vc if counts is None else counts.add(vc, fill_value=0)
            if len(counts) > k:
                cut = counts.nlargest(k + 1).iloc[-1]
                counts = counts[counts > cut] - cut
        out = {
            item_col: [None],
            "lb": [0],
            "n_part": [n],
        }
        if counts is not None and len(counts):
            out = {
                item_col: list(counts.index) + [None],
                "lb": [int(v) for v in counts] + [0],
                "n_part": [0] * len(counts) + [n],
            }
        yield pd.DataFrame(out)

    return items.select(item_col).mapInPandas(
        fn, f"{item_col} string, lb long, n_part long"
    )


def heavy_hitters_exact(
    items: DataFrame, den: int, item_col: str = "item", k: int | None = None
) -> DataFrame:
    """All items with exact frequency >= ceil(total/den), with their
    exact counts — computed in two scans and a candidate-sized shuffle
    (see the module-section comment above for the guarantee).

    ``den`` is the INTEGER reciprocal of the frequency threshold phi =
    1/den: the threshold ceil(total/den) is pure integer arithmetic, so
    the boundary is bit-identical on every engine (a float phi * total
    product could round either side of an integer count). Default
    capacity ``k = max(64, 2*den)`` satisfies the superset guarantee
    with margin; pass a larger k only to shrink pass-1 summary error
    (never needed for correctness).

    Output: (``item_col``, n_item) — exact, and independent of input
    partitioning (candidate sets vary with partitioning; the recount +
    threshold make the result invariant, pinned by test).
    """
    if den < 1:
        raise ValueError(f"den must be >= 1 (got {den})")
    if k is None:
        k = max(64, 2 * den)
    elif k < 2 * den:
        raise ValueError(
            f"capacity k={k} breaks the superset guarantee for den={den}:"
            f" need k >= {2 * den} so ceil(n/den) > n/(k+1)"
        )
    summ = misra_gries_partition_summaries(items, k, item_col)
    # consumed twice (total + candidates); partitions*(k+1) rows, so the
    # persist is summary-sized, never data-sized
    summ.persist()
    total = summ.filter(F.col(item_col).isNull()).agg(
        F.sum("n_part").alias("_total")
    )
    cands = (
        summ.filter(F.col(item_col).isNotNull()).select(item_col).distinct()
    )
    exact = (
        items.join(F.broadcast(cands), item_col)
        .groupBy(item_col)
        .agg(F.count(F.lit(1)).alias("n_item"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(
            F.col("n_item")
            >= F.expr(f"(_total + {den - 1}) DIV {den}")
        )
        .select(item_col, "n_item")
    )
