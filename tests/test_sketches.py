"""Sketch aggregates for 100 TB analytics: approx_percentile and
approx_count_distinct bounded against exact answers. Sketch outputs are
engine-specific (not oracle-hashable), so accuracy is pinned here."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.sources.files import load_table

SF = "/root/testdata/sf0.01"


def test_approx_percentile_rank_error(spark):
    events = load_table(spark, SF, "events")
    rows = events.agg(
        F.expr("percentile(value, 0.5)").alias("exact_p50"),
        F.expr("approx_percentile(value, 0.5, 1000)").alias("approx_p50"),
        F.expr("percentile(value, 0.99)").alias("exact_p99"),
        F.expr("approx_percentile(value, 0.99, 1000)").alias("approx_p99"),
    ).collect()[0]
    n = events.count()
    values = [r.value for r in events.select("value").collect()]
    values.sort()

    def rank(v):
        import bisect

        return bisect.bisect_left(values, v) / n

    # accuracy=1000 guarantees rank error <= 1/1000; allow 1% slack
    assert abs(rank(rows.approx_p50) - 0.5) <= 0.01
    assert abs(rank(rows.approx_p99) - 0.99) <= 0.011


def test_approx_count_distinct_error(spark):
    events = load_table(spark, SF, "events")
    row = events.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("approx"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact <= 0.1


def test_cms_estimate_never_undercounts_and_is_tight_here(spark):
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    docs = spark.createDataFrame(
        [(i, "alpha beta gamma alpha " + f"tok{i}") for i in range(50)],
        ["doc_id", "text"],
    )
    out = SK.cms_estimate_error(docs).collect()
    by_tok = {r["token"]: r for r in out}
    # invariant: a count-min sketch can only overcount
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["cms_estimate"] >= r["exact_count"] for r in out)
    # exact counts are the ground truth we fed in
    assert by_tok["alpha"]["exact_count"] == 100
    assert by_tok["beta"]["exact_count"] == 50
    assert by_tok["tok7"]["exact_count"] == 1
    # 53 distinct tokens over 4x256 cells: collisions are rare, the
    # median token must estimate exactly
    exact_hits = sum(1 for r in out if r["overcount"] == 0)
    assert exact_hits > len(out) / 2


def test_hll_estimate_tracks_exact_distinct(spark):
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    # group A: 500 distinct items, group B: 40 — both far under the
    # small-range threshold, so linear counting should land within 2 sigma (sigma = 1.04/sqrt(256) = 6.5%)
    rows = [("A", f"item{i}") for i in range(500)] * 2 + [
        ("B", f"tok{i}") for i in range(40)
    ]
    df = spark.createDataFrame(rows, ["grp", "item"])
    out = {r["grp"]: r for r in SK.hll_distinct_per_group(df, "grp", "item").collect()}
    assert abs(out["A"]["hll_estimate"] - 500) / 500 < 0.15
    assert abs(out["B"]["hll_estimate"] - 40) / 40 < 0.15
    # duplicates must not move the estimate (set semantics)
    df2 = spark.createDataFrame(rows * 3, ["grp", "item"])
    out2 = {
        r["grp"]: r for r in SK.hll_distinct_per_group(df2, "grp", "item").collect()
    }
    assert out2["A"]["hll_estimate"] == out["A"]["hll_estimate"]


def test_kmv_sketch_is_mergeable_and_exact_below_k(spark):
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    # two groups with known overlap: a = 0..59, b = 40..99 (inter = 20)
    rows = [("a", i) for i in range(60)] + [("b", i) for i in range(40, 100)]
    df = spark.createDataFrame(rows, ["g", "item"])

    # below k the sketch IS the distinct hash set -> estimates are exact
    out = {
        (r.group_a, r.group_b): r
        for r in SK.kmv_pair_overlap(df, "g", "item", k=256).collect()
    }
    r = out[("a", "b")]
    assert r.exact_inter == 20 and r.exact_union == 100
    assert r.kmv_union_est == 100.0
    assert r.kmv_inter_est == 20.0
    assert r.kmv_jaccard == r.exact_jaccard == 0.2

    # mergeability: bottom-k of (sketch(a) UNION sketch(b)) equals the
    # sketch of the union built directly from the raw data
    import pyspark.sql.functions as F

    k = 16
    sk = SK.kmv_sketch(df, "g", "item", k=k)
    merged = sorted(
        h.h
        for h in sk.select("h")
        .distinct()
        .orderBy("h")
        .limit(k)
        .collect()
    )
    direct = sorted(
        h.h
        for h in SK.kmv_sketch(
            df.select(F.lit("all").alias("g"), "item"), "g", "item", k=k
        ).collect()
    )
    assert merged == direct


def test_kmv_jaccard_error_within_bound(spark):
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    # 2000-item sets with true jaccard 1000/3000 = 1/3; k = 256 gives a
    # ~1/sqrt(k) ≈ 0.0625 standard error — assert 3 sigma
    rows = [("a", i) for i in range(2000)] + [
        ("b", i) for i in range(1000, 3000)
    ]
    df = spark.createDataFrame(rows, ["g", "item"])
    r = SK.kmv_pair_overlap(df, "g", "item", k=256).collect()[0]
    assert abs(r.exact_jaccard - round(1000 / 3000, 6)) < 1e-9
    assert abs(r.kmv_jaccard - r.exact_jaccard) < 3 / 16
    assert abs(r.kmv_union_est - 3000) / 3000 < 0.25


def test_histogram_sketch_merge_is_identity_and_bound_holds(spark):
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    # deterministic skewed values across 3 "shards"
    rows = [(f"s{i % 3}", float((i * i) % 997)) for i in range(3000)]
    df = spark.createDataFrame(rows, ["g", "v"])

    merged = SK.merge_histogram_sketches(
        SK.histogram_sketch(df, "g", "v", n_bins=32)
    )
    direct = SK.merge_histogram_sketches(
        SK.histogram_sketch(df.withColumn("g", df.g.substr(0, 0)), "g", "v",
                            n_bins=32)
    )
    # mergeability identity: per-shard sketches merged == one-pass histogram
    assert sorted(map(tuple, merged.select("bin", "cnt").collect())) == \
        sorted(map(tuple, direct.select("bin", "cnt").collect()))
    assert merged.agg({"cnt": "sum"}).collect()[0][0] == 3000

    qs = [0.1, 0.5, 0.9, 0.99]
    est = {
        r["q"]: r["estimate"]
        for r in SK.histogram_quantiles(merged, qs, n_bins=32).collect()
    }
    import numpy as np

    vals = np.array([v for _, v in rows])
    lo, hi = vals.min(), vals.max()
    bound = (hi - lo) / 32
    for q in qs:
        assert abs(est[q] - np.quantile(vals, q)) <= bound + 1e-9


def test_histogram_sketch_constant_column(spark):
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    df = spark.createDataFrame([("a", 7.0)] * 10 + [("b", 7.0)] * 5, ["g", "v"])
    merged = SK.merge_histogram_sketches(SK.histogram_sketch(df, "g", "v", 16))
    rows = merged.collect()
    assert [(r["bin"], r["cnt"]) for r in rows] == [(0, 15)]
    est = SK.histogram_quantiles(merged, [0.5], 16).collect()[0]
    assert est["estimate"] == 7.0  # width is 0, every interpolation is lo


def test_histogram_quantiles_q_zero_returns_first_bin_edge(spark):
    # q=0.0's target rank is 0, which `cum - cnt < target` can never
    # satisfy (the first bin's cum-cnt IS 0) — the clamp makes q=0 hit
    # the first PRESENT bin and interpolate ~its left edge, instead of
    # silently vanishing from the output
    from kafka_stream_unify_order_messages_spark.operators import sketches as SK

    rows = [("a", float(v)) for v in range(100, 200)]
    df = spark.createDataFrame(rows, ["g", "v"])
    merged = SK.merge_histogram_sketches(SK.histogram_sketch(df, "g", "v", 16))
    est = {
        r["q"]: r["estimate"]
        for r in SK.histogram_quantiles(merged, [0.0, 0.5, 1.0], 16).collect()
    }
    assert set(est) == {0.0, 0.5, 1.0}  # q=0 row present
    assert abs(est[0.0] - 100.0) < 1e-6  # lo = the data minimum
    # grouped form too: each group's q=0 lands at ITS first present bin
    df2 = spark.createDataFrame(
        [("a", float(v)) for v in range(0, 50)]
        + [("b", float(v)) for v in range(50, 100)],
        ["g", "v"],
    )
    sk = SK.histogram_sketch(df2, "g", "v", 10)
    by_g = {
        (r["g"], r["q"]): r["estimate"]
        for r in SK.histogram_quantiles(
            sk, [0.0], 10, group_col="g"
        ).collect()
    }
    assert abs(by_g[("a", 0.0)] - 0.0) < 1e-6
    # b's first present bin starts at the global midpoint
    assert abs(by_g[("b", 0.0)] - 49.5) < 1e-6


def test_kmeans_train_exact_rejects_zero_iterations(spark):
    import pytest

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    with pytest.raises(ValueError, match="iters >= 1"):
        S.kmeans_train_exact(emb, "vec_id", "embedding", 64, 8, 0)


def test_misra_gries_summary_compresses_and_keeps_frequent(spark):
    """Force the MG compression path (distinct >> capacity k): the
    per-partition summary must stay <= k candidate rows, the sentinel
    must carry the exact partition total, and the genuinely frequent
    item must survive the decrements (MG guarantee: anything with
    partition frequency > n_p/(k+1) is present)."""
    from kafka_stream_unify_order_messages_spark.operators.sketches import (
        misra_gries_partition_summaries,
    )

    # one partition: 2000 singletons + one item appearing 500 times
    rows = [(f"rare{i}",) for i in range(2000)] + [("hot",)] * 500
    items = spark.createDataFrame(rows, ["item"]).coalesce(1)
    summ = misra_gries_partition_summaries(items, k=64).collect()
    sentinel = [r for r in summ if r.item is None]
    cands = [r for r in summ if r.item is not None]
    assert len(sentinel) == 1 and sentinel[0].n_part == 2500
    assert 1 <= len(cands) <= 64
    hot = {r.item: r.lb for r in cands}["hot"]
    # counter is a lower bound, within n_p/(k+1) of the truth
    assert 500 - 2500 // 65 <= hot <= 500


def test_heavy_hitters_exact_matches_bruteforce_and_partitioning(spark):
    """Output = exact counts filtered at ceil(total/den), regardless of
    how the input is partitioned (candidate sets differ per layout; the
    recount + threshold must erase that)."""
    import collections

    from kafka_stream_unify_order_messages_spark.operators.sketches import (
        heavy_hitters_exact,
    )

    # zipf-ish: item j appears 1000//(j+1) times over j in 0..199,
    # plus 3000 distinct singletons to swamp small capacities
    raw = []
    for j in range(200):
        raw += [f"w{j}"] * (1000 // (j + 1))
    raw += [f"s{i}" for i in range(3000)]
    total = len(raw)
    den = 100
    thresh = -(-total // den)  # ceil
    exact = collections.Counter(raw)
    want = {(w, c) for w, c in exact.items() if c >= thresh}
    assert 3 <= len(want) <= 30  # non-degenerate slice

    for parts in (1, 7, 32):
        items = spark.createDataFrame(
            [(w,) for w in raw], ["item"]
        ).repartition(parts)
        got = {
            (r.item, r.n_item)
            for r in heavy_hitters_exact(items, den=den).collect()
        }
        assert got == want, f"partitions={parts}"


def test_heavy_hitters_exact_rejects_guarantee_breaking_k(spark):
    import pytest

    from kafka_stream_unify_order_messages_spark.operators.sketches import (
        heavy_hitters_exact,
        misra_gries_partition_summaries,
    )

    items = spark.createDataFrame([("a",)], ["item"])
    with pytest.raises(ValueError, match="superset guarantee"):
        heavy_hitters_exact(items, den=100, k=150)
    with pytest.raises(ValueError, match="den must be"):
        heavy_hitters_exact(items, den=0)
    with pytest.raises(ValueError, match="capacity k"):
        misra_gries_partition_summaries(items, k=0)
    # empty input: sentinel-only summaries, empty heavy-hitter set
    empty = spark.createDataFrame([], "item string")
    assert heavy_hitters_exact(empty, den=10).count() == 0
