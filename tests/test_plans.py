"""Physical-plan discipline tests: the properties that make the engine
viable at 100 TB are asserted here so they cannot silently regress —
shuffle counts, broadcast choices, parquet filter/column pushdown.
"""

from __future__ import annotations

import re

import pytest

from kafka_stream_unify_order_messages_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def plan_of(spark, name: str) -> str:
    # Cached-plan substitution would splice InMemoryTableScans from frames
    # other tests persisted (Spark matches canonicalized subplans session-
    # wide), changing exchange counts by run order; pin the plan we assert
    # on to the uncached shape.
    spark.catalog.clearCache()
    return QUERIES[name](spark, SF)._jdf.queryExecution().executedPlan().toString()


def test_unify_projection_single_shuffle(spark):
    # the flagship: first-wins + completeness + ordering in ONE exchange
    # (conditional per-type aggregates with map-side combine), plus the
    # window for `position` (no extra exchange: same partitioning)
    plan = plan_of(spark, "unify_projection")
    assert plan.count("Exchange") <= 2
    assert "partial_min" in plan  # map-side combine before the shuffle


def test_unify_projection_pushes_null_filter(spark):
    plan = plan_of(spark, "unify_projection")
    assert "PushedFilters: [IsNotNull(user_id)" in plan


def test_region_revenue_broadcasts_dimensions(spark):
    # nation/region/customer/supplier are broadcast; only the fact tables
    # shuffle — no shuffle-hash or sort-merge join on a dimension
    plan = plan_of(spark, "region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3


def test_tpch_q1_scan_pushdown_and_pruning(spark):
    plan = plan_of(spark, "tpch_q1")
    assert "LessThanOrEqual(l_shipdate" in plan  # predicate reaches parquet
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m, plan
    read_cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    # only the 6 needed columns are read, not all 11 (column pruning)
    assert len(read_cols) <= 6, read_cols


def test_regex_filter_no_shuffle(spark):
    # pure filter+project: must be a single scan stage, zero exchanges
    plan = plan_of(spark, "regex_filter")
    assert plan.count("Exchange") == 0


def test_brute_force_topk_prunes_before_shuffle(spark):
    # the numpy GEMM stage must emit pruned candidates (mapInPandas) and
    # only then shuffle for the global ranking window
    plan = plan_of(spark, "ann_cosine_topk")
    assert "MapInPandas" in plan
    assert plan.index("MapInPandas") > plan.index("Window")  # pandas below window


def test_minhash_one_shuffle_to_bands(spark):
    # signatures+bands = explode -> ONE hash aggregate -> projection;
    # the band self-join adds its own exchanges, but there must be exactly
    # one aggregate-side exchange pair feeding it. A single round-robin
    # exchange is tolerated: it is the scan-splitting repartition for
    # under-split local files (load_table min_partitions), not a
    # data-dependent shuffle — it disappears on many-file datasets.
    plan = plan_of(spark, "minhash_signatures")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Exchange") <= 2
    assert "partial_min" in plan


def test_metadata_ops_prune_payload_column(spark):
    plan = plan_of(spark, "multimodal_meta")
    # binary payload is derived in-flight from text; the scan reads only
    # what the query needs
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m
    read_cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    assert "text" in read_cols and "lang" not in read_cols


def test_real_decode_loop_scan_local(spark):
    # the real codec loop (synthetic_png_media -> decode_media) is two
    # chained MapInPandas over a ONE-column scan: no join, no aggregate,
    # no data-dependent shuffle — the only tolerated exchange is the
    # small-table scan-splitting repartition (see minhash note above)
    plan = plan_of(spark, "multimodal_real_decode")
    assert plan.count("MapInPandas") == 2
    assert "Exchange hashpartitioning" not in plan
    assert plan.count("Exchange") <= 1
    m = re.search(r"FileScan parquet \[([^\]]*)\]", plan)
    assert m
    read_cols = {c.split("#")[0] for c in m.group(1).split(",") if c}
    assert read_cols == {"doc_id"}


def test_decontaminate_broadcasts_benchmark_grams(spark):
    # the benchmark gram set is the small side — it must broadcast so the
    # corpus side never shuffles before the per-doc count
    plan = plan_of(spark, "decontaminate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    # two hash exchanges total: the per-doc count on the corpus side and
    # the distinct on the (small) benchmark side before its broadcast;
    # round-robin scan splits tolerated as in minhash
    assert plan.count("Exchange hashpartitioning") == 2


def test_big_orders_broadcasts_filtered_aggregate(spark):
    # IN-subquery shape: the post-aggregate, post-HAVING side broadcasts
    # into both probe joins — the orders/customer scans never shuffle
    plan = plan_of(spark, "big_orders")
    assert plan.count("BroadcastHashJoin") == 2
    assert "SortMergeJoin" not in plan


def test_repetition_ratio_scan_local(spark):
    # pure per-row expression work: no exchange at all
    plan = plan_of(spark, "repetition_ratio")
    assert plan.count("Exchange hashpartitioning") == 0


def test_idle_rich_anti_join_broadcasts(spark):
    # scalar subquery (1-row aggregate) and the anti join's build side are
    # both broadcast; the only hash exchange feeds the final segment agg
    plan = plan_of(spark, "idle_rich_customers")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert plan.count("SortMergeJoin") == 0


def test_training_shuffle_terasort_shape(spark):
    # hash-bucket exchange + per-shard local sort; NO global-order window
    # (a single-partition sort would be the 100 TB killer)
    plan = plan_of(spark, "training_shuffle")
    assert plan.count("Exchange") == 1
    assert "hashpartitioning(shard" in plan
    assert "SinglePartition" not in plan


def test_doc_chunking_scan_local(spark):
    # no WIDE exchange: the only allowed one is the deliberate round-robin
    # CPU rebalance for under-split local scans (a no-op in production)
    plan = plan_of(spark, "doc_chunking")
    import re as _re

    wide = [
        e
        for e in _re.findall(r"Exchange (\w+)", plan)
        if e != "RoundRobinPartitioning"
    ]
    assert wide == [], plan


def test_dup_ngram_spans_single_scan_no_broadcast(spark):
    plan = plan_of(spark, "dup_ngram_spans")
    # corpus totals via window-sum: ONE scan of the gram subtree, and the
    # corpus-sized totals table must never become a broadcast build side.
    # The window (vs aggregate + join back) is the MEASURED choice: at
    # the x300 ramp tier the window plan costs ~730 CPU-s in 3 stages
    # where the join rewrite costs ~1,800 CPU-s in 5 (one extra 75M-row
    # exchange + a 150M-row SMJ) — see duplicate_ngram_spans's docstring.
    assert plan.count("FileScan") == 1
    assert "BroadcastExchange" not in plan


def test_bpe_top_pairs_no_global_sort(spark):
    # top-k must be TakeOrdered (per-partition heads + merge), not a
    # global sort
    assert "TakeOrderedAndProject" in plan_of(spark, "bpe_top_pairs")


def test_fuzzy_pairs_blocked_equi_join(spark):
    # blocking must compile to an equi-join; a nested-loop/cartesian plan
    # means the blocking keys fell out of the join condition
    plan = plan_of(spark, "fuzzy_customer_pairs")
    assert "CartesianProduct" not in plan
    assert "NestedLoop" not in plan


def test_shard_packing_broadcast_offsets_no_literal_map(spark):
    # the global running sum decomposes into per-bucket windows plus a
    # broadcast-joined prefix-sum of the tiny bucket-totals frame; the
    # plan must not embed a per-bucket literal map (plan size would grow
    # with #buckets) and the offsets side must be broadcast
    plan = plan_of(spark, "shard_packing")
    assert "BroadcastHashJoin" in plan
    assert "keys: [" not in plan  # no create_map literal
    assert "map_from" not in plan


def test_gopher_rules_scan_local(spark):
    # rule cascade is pure per-row expressions: no hash shuffle (the one
    # allowed Exchange is _load's round-robin min_partitions rebalance),
    # no Python
    plan = plan_of(spark, "gopher_rules")
    assert plan.count("Exchange") <= 1
    assert "hashpartitioning" not in plan.lower()
    assert "pythonUDF" not in plan.lower()


def test_random_projection_scan_local(spark):
    # one Arrow-batched GEMM over the scan: no shuffle beyond the
    # min_partitions rebalance, nothing collected
    plan = plan_of(spark, "random_projection")
    assert plan.count("Exchange") <= 1  # the explicit min_partitions split
    assert "MapInPandas" in plan


def test_media_dedup_prunes_payload_before_shuffle(spark):
    # the binary payload must not reach the exchange: only the 32-byte
    # digest shuffles, whatever the media size
    plan = plan_of(spark, "media_dedup")
    import re as _re
    exchange_and_after = plan[plan.index("Exchange"):] if "Exchange" in plan else ""
    assert "payload" not in exchange_and_after


def test_simhash_pairs_equi_join_no_nested_loop(spark):
    # candidate generation must be the banded equi-join — a nested-loop
    # or cartesian join here is the all-pairs scale killer
    plan = plan_of(spark, "simhash_near_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_simhash64_pairs_equi_join_no_nested_loop(spark):
    # the at-scale width must keep the same join shape: widening the
    # fingerprint only widens band_val, never the join strategy
    plan = plan_of(spark, "simhash64_near_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_dedup_keep_best_no_text_in_wide_stages(spark):
    # the keep-best window runs on (id, cluster, n_chars) only; document
    # text must never reach an exchange
    plan = plan_of(spark, "dedup_keep_best")
    for m in re.finditer(r"Exchange hashpartitioning\(([^)]*)\)", plan):
        assert "text#" not in m.group(1)


def test_pq_topk_prunes_before_shuffle(spark):
    # ADC scoring emits only batch-local top-k survivors into the ranking
    # exchange; the corpus is never shuffled at full width
    plan = plan_of(spark, "ann_pq_fixed")
    assert plan.count("Exchange") <= 2
    idx_map = plan.find("MapInPandas")
    idx_ex = plan.find("Exchange")
    assert idx_map != -1 and idx_ex != -1
    # mapInPandas (scoring) sits below the only exchange (ranking window):
    # in the printed tree the exchange appears before its child
    assert idx_ex < idx_map


def test_ngram_novelty_no_pairwise_step(spark):
    plan = plan_of(spark, "ngram_novelty")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_bm25_broadcasts_small_sides_no_sort_merge(spark):
    # query terms, document frequencies, and the 1-row corpus stats are
    # all broadcast; the corpus-sized tf frame never sort-merge-joins
    plan = plan_of(spark, "bm25_topk")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
    # the 1-row stats frame rides a broadcast nested loop (scalar pattern)
    assert plan.count("BroadcastNestedLoopJoin") == 1


def test_quality_classifier_scan_local(spark):
    # hashed linear scorer: no data-dependent shuffle (the only exchange
    # permitted is the load-time round-robin split of an under-split
    # scan), zero python — pure codegen
    plan = plan_of(spark, "quality_classifier")
    assert plan.count("hashpartitioning") == 0
    assert "mapInPandas" not in plan.lower()
    assert "Window" not in plan and "Join" not in plan


def test_dsir_probs_join_is_broadcast(spark):
    # the O(buckets) model state must broadcast back to the token stream
    plan = plan_of(spark, "dsir_weights")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "SortMergeJoin" not in plan


def test_dup_span_removal_no_text_self_join(spark):
    # canonical-occurrence detection is a window over the gram hash, not
    # a self-join; the only join carries the per-doc removed-position
    # arrays back to the token arrays (AQE may broadcast that side)
    plan = plan_of(spark, "dup_span_removal")
    assert "windowspecdefinition(gh" in plan  # window, not self-join
    assert "hashpartitioning(gh" in plan
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 0
    # exactly one join in the whole plan: positions back onto tokens
    import re as _re

    assert len(_re.findall(r"\w+Join", plan)) == 1


def test_cms_cells_join_is_broadcast(spark):
    plan = plan_of(spark, "cms_token_error")
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_hll_registers_bound_shuffle_width(spark):
    # the register aggregation must partial-aggregate map-side (max
    # combines), so at most m rows per group cross the exchange
    plan = plan_of(spark, "hll_source_distinct")
    assert "partial_max" in plan
    assert "CartesianProduct" not in plan


def test_weighted_sample_topk_pruned_before_shuffle(spark):
    # Efraimidis–Spirakis per-stratum top-k: the es_key is scan-local and
    # Spark's WindowGroupLimit prunes each partition to k rows BEFORE the
    # single stratum exchange — the property that makes the sampling
    # frontier shuffle O(k * partitions), not O(rows)
    plan = plan_of(spark, "weighted_sample")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan[plan.index("WindowGroupLimit"):]


def test_per_source_cap_pruned_before_shuffle(spark):
    # per-group cap: the md5 order key is scan-local, the literal
    # rn <= cap filter becomes a WindowGroupLimit with a Partial mode map
    # side — a million-row group ships cap rows per input partition, and
    # the single exchange is the group key
    plan = plan_of(spark, "per_source_cap")
    assert plan.count("Exchange hashpartitioning") == 1
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan[plan.index("WindowGroupLimit"):]


def test_funnel_single_key_exchange(spark):
    # one shuffle on the entity key; the fold over the sorted event array
    # is scan-local and the step rollup is a single conditional aggregate
    # collapsing to one row before the |steps|-row stack
    plan = plan_of(spark, "funnel_report")
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("CartesianProduct") == 0
    assert "partial_sum" in plan  # map-side combine of the stage counters


def test_event_transitions_bounded_exchanges(spark):
    # user-key window shuffle, then everything downstream is bounded by
    # |event types|^2 rows — exchanges past the first are negligible
    plan = plan_of(spark, "event_transitions")
    assert plan.count("Exchange hashpartitioning") <= 3
    assert plan.count("CartesianProduct") == 0


def test_containment_pairs_postings_join_no_cartesian(spark):
    # containment uses the same shingle-postings self-join as Jaccard:
    # documents sharing no shingle never meet
    plan = plan_of(spark, "containment_pairs")
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_triangle_count_equi_joins_only(spark):
    # wedge join and closure join are both hash equi-joins; the degree
    # orientation bounds wedge cardinality — no nested-loop anywhere
    plan = plan_of(spark, "triangle_count")
    assert plan.count("CartesianProduct") == 0
    assert plan.count("BroadcastNestedLoopJoin") == 0


def test_source_token_kl_broadcast_total(spark):
    # the corpus-total (one row) joins via broadcast; the token join is a
    # hash equi-join between count frames bounded by |vocab|
    plan = plan_of(spark, "source_token_kl")
    assert plan.count("CartesianProduct") == 0
    # the only nested-loop is the deliberate one-row broadcast total
    assert plan.count("BroadcastNestedLoopJoin") <= 1


def test_skew_report_topk_no_global_sort(spark):
    # the hot-key report must not globally sort the per-key counts: the
    # top-k is TakeOrderedAndProject (k candidates per partition) and the
    # count aggregation is partial/final (map-side combined)
    plan = plan_of(spark, "skew_report")
    assert "TakeOrderedAndProject" in plan
    assert "partial_count" in plan


def test_parquet_v2_aggregate_pushdown(spark):
    # footer-only scans: with the v2 parquet source, min/max/count
    # aggregates with no filter are answered from parquet metadata —
    # the statistics path a 100 TB profile query should take instead of
    # reading data pages. session.py enables aggregatePushdown; the v2
    # source is opt-in per query because v1 is the engine default.
    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.sources.files import (
        load_table,
    )

    old = spark.conf.get("spark.sql.sources.useV1SourceList")
    spark.conf.set("spark.sql.sources.useV1SourceList", "")
    try:
        df = load_table(spark, SF, "lineitem")
        # numeric/integer columns only: parquet footer stats don't cover
        # timestamp_ntz, so a min(l_shipdate) would NOT push (the scan
        # falls back to reading data pages — PushedAggregation: [])
        agg = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_orderkey").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
        )
        plan = agg._jdf.queryExecution().executedPlan().toString()
        # the pushed form's scan OUTPUT is the aggregate values themselves
        assert re.search(
            r"BatchScan parquet [^\[]*\[count\(\*\)\S*, min\(l_orderkey\)",
            plan,
        ), plan
        row = agg.collect()[0]
        assert row.n == 6000 and row.mn == 0
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old)


def test_hilbert_codes_scan_local(spark):
    # scan-local: no exchange — the code computes where the data sits.
    # The 16-bit path is deliberately an Arrow-batched numpy kernel
    # (interpreted HOF fold was ~5x slower; pure-Column unroll explodes
    # — see layout.hilbert_code); row-at-a-time Python stays banned.
    plan = plan_of(spark, "hilbert_codes")
    assert plan.count("Exchange") == 0
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_kmv_overlap_bottomk_pruned_and_no_cartesian(spark):
    # the per-group bottom-k must prune map-side (WindowGroupLimit
    # before the exchange), and the pair grid joins hash-wise — a
    # cartesian or nested-loop pair expansion would be corpus-sized
    plan = plan_of(spark, "kmv_source_overlap")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_ann_ivf_served_partition_prunes_persisted_index(spark):
    # build-once/serve-many IVF: the probe set must become directory-level
    # partition pruning on the persisted inverted lists — the scan opens
    # ONLY the probed centroid_id= directories, never the whole index
    plan = plan_of(spark, "ann_ivf_served")
    m = re.search(r"PartitionFilters: \[centroid_id#\d+ IN \(([^)]*)\)", plan)
    assert m, plan
    probed = [int(x) for x in m.group(1).split(",")]
    assert 0 < len(probed) < 16  # pruned: a strict subset of the 16 cells


def test_near_dup_first_wins_single_signature_pass(spark):
    # band rows persist before the bucket-firsts agg and probe join:
    # exactly ONE shingle+minhash pipeline in the plan (a second
    # Generate-over-parquet leg means the persist regressed), and the
    # bucket-firsts side broadcasts (bounded by bucket count)
    plan = plan_of(spark, "near_dup_first_wins")
    assert plan.count("InMemoryTableScan") >= 2  # both legs read the cache
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_quantile_sketch_no_data_sized_shuffle_after_sketch(spark):
    # the sketch groupBy has map-side partial aggregation; every join
    # after reduction is a broadcast (bin rows + 1-row aggregates), and
    # the cumulative window sorts bins, never data
    plan = plan_of(spark, "quantile_sketch_merged")
    assert "partial_count" in plan or "partial_sum" in plan
    assert "SortMergeJoin" not in plan
    # merged sketch persisted: quantile + bound legs read the cache, so
    # the only parquet pipelines are sketch(bounds+binning) and exact
    assert plan.count("InMemoryTableScan") >= 2


def test_priority_sample_take_ordered_no_global_sort(spark):
    # DLT priority sampling: the priority is scan-local (md5 + one IEEE
    # division) and the k smallest resolve via TakeOrderedAndProject —
    # per-partition size-k heaps and a k-row driver merge; a global Sort
    # would single-partition the corpus
    plan = plan_of(spark, "priority_sample")
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan and "rangepartitioning" not in plan
    assert "Exchange hashpartitioning" not in plan


def test_bigram_heavy_hitters_candidate_broadcast_no_smj(spark):
    # two-pass MG heavy hitters: pass 1 is a MapInPandas fold to
    # partition summaries; pass 2 recounts ONLY candidates, which must
    # reach the gram stream as a BROADCAST hash join — a sort-merge
    # join here would shuffle the full gram stream on the join key,
    # re-creating the vocabulary-sized exchange the operator exists to
    # avoid. The persisted summary must be reused by both consumers.
    plan = plan_of(spark, "bigram_heavy_hitters")
    assert "MapInPandas" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("InMemoryTableScan") >= 2  # summary persisted, reused
