"""Event-sequence analytics semantics: funnel greedy ordering, cohort
offsets, transition normalization, robust outliers, weighted sampling,
containment asymmetry, and triangle counting."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from kafka_stream_unify_order_messages_spark.operators import analytics as A
from kafka_stream_unify_order_messages_spark.operators import curation as C
from kafka_stream_unify_order_messages_spark.operators import dedup as D
from kafka_stream_unify_order_messages_spark.operators import graph as G


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 0, minute)


@pytest.fixture()
def funnel_events(spark):
    # user 1: full ordered funnel; user 2: click BEFORE view (stage 1
    # only); user 3: purchase exactly at the view timestamp (strictly-
    # after rule -> stage 1); user 4: no view at all (stage 0)
    rows = [
        (1, 1, _ts(1), "view"),
        (2, 1, _ts(2), "click"),
        (3, 1, _ts(3), "purchase"),
        (4, 2, _ts(1), "click"),
        (5, 2, _ts(2), "view"),
        (6, 3, _ts(5), "view"),
        (7, 3, _ts(5), "purchase"),
        (8, 4, _ts(9), "purchase"),
    ]
    return spark.createDataFrame(
        rows, ["event_id", "user_id", "ts", "event_type"]
    )


def test_funnel_stages_greedy_and_strictly_ordered(funnel_events):
    out = {
        r["user_id"]: r["stage"]
        for r in A.funnel_stages(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert out == {1: 3, 2: 1, 3: 1, 4: 0}


def test_funnel_report_counts_reached_at_least(funnel_events):
    rows = {
        r["step"]: (r["step_name"], r["users"], r["conv_rate"])
        for r in A.funnel_report(
            funnel_events, ["view", "click", "purchase"]
        ).collect()
    }
    assert rows[1] == ("view", 3, 1.0)
    assert rows[2] == ("click", 1, round(1 / 3, 4))
    assert rows[3] == ("purchase", 1, round(1 / 3, 4))


def test_funnel_click_after_later_view_still_counts(spark):
    # greedy takes the EARLIEST view; a click between two views counts
    rows = [
        (1, 1, _ts(1), "view"),
        (2, 1, _ts(2), "click"),
        (3, 1, _ts(3), "view"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = A.funnel_stages(ev, ["view", "click"]).collect()
    assert out[0]["stage"] == 2


def test_cohort_retention_offsets(spark):
    # user 1 first seen week of Mon 2024-01-01, active again 2 weeks on;
    # user 2 first seen the second week
    rows = [
        (1, 1, dt.datetime(2024, 1, 2, 10)),   # week 2024-01-01
        (2, 1, dt.datetime(2024, 1, 16, 9)),   # week 2024-01-15 -> +2
        (3, 2, dt.datetime(2024, 1, 10, 8)),   # week 2024-01-08
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = {
        (r["cohort_week"].date(), r["week_offset"]): r["active_users"]
        for r in A.cohort_retention(ev).collect()
    }
    assert got == {
        (dt.date(2024, 1, 1), 0): 1,
        (dt.date(2024, 1, 1), 2): 1,
        (dt.date(2024, 1, 8), 0): 1,
    }


def test_event_transitions_rows_and_normalization(spark):
    rows = [
        (1, 1, _ts(1), "a"),
        (2, 1, _ts(2), "b"),
        (3, 1, _ts(3), "a"),
        (4, 1, _ts(4), "c"),
        (5, 2, _ts(1), "b"),
        (6, 2, _ts(2), "a"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = {
        (r["prev_type"], r["next_type"]): (r["n"], r["p"])
        for r in A.event_transitions(ev).collect()
    }
    # from 'a': -> b once, -> c once (p = 0.5 each); b -> a twice (p=1)
    assert out[("a", "b")] == (1, 0.5)
    assert out[("a", "c")] == (1, 0.5)
    assert out[("b", "a")] == (2, 1.0)
    # probabilities sum to 1 per prev state
    for prev in {"a", "b"}:
        assert (
            round(sum(p for (pv, _), (_, p) in out.items() if pv == prev), 4)
            == 1.0
        )


def test_robust_outliers_flags_only_the_planted_spike(spark):
    rows = [(i, "t", float(v)) for i, v in enumerate([10, 11, 12, 13, 14])]
    rows.append((99, "t", 1000.0))
    df = spark.createDataFrame(rows, ["event_id", "event_type", "value"])
    out = A.robust_outliers(df, k=3.0)
    got = out.collect()
    assert [r["event_id"] for r in got] == [99]
    # median 12.5, MAD 1.5 -> z = 987.5 / (1.4826 * 1.5)
    assert got[0]["robust_z"] == round(987.5 / (1.4826 * 1.5), 4)


def _es_key(doc_id: int, w: float, seed: str = "wsample42") -> float:
    h = int(hashlib.md5(f"{seed}:{doc_id}".encode()).hexdigest()[:15], 16)
    u = (float(h) + 1.0) / float(1 << 60)
    return round(math.log(u) / w, 9)


def test_weighted_sample_matches_reference_topk(spark):
    rows = [(i, "s", 10 * (1 + i % 7)) for i in range(50)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    out = C.weighted_sample(df, k=5, stratum_col="source")
    got = sorted(r["doc_id"] for r in out.collect())
    expect = sorted(
        i for i, _, w in sorted(
            rows, key=lambda r: (-_es_key(r[0], r[2]), r[0])
        )[:5]
    )
    assert got == expect


def test_weighted_sample_is_partitioning_invariant(spark):
    rows = [(i, "s", 10 + i) for i in range(40)]
    df1 = spark.createDataFrame(rows, ["doc_id", "source", "n_chars"])
    df2 = df1.repartition(7)
    pick = lambda df: sorted(
        r["doc_id"] for r in C.weighted_sample(df, k=8).collect()
    )
    assert pick(df1) == pick(df2)


def test_containment_detects_excerpt_jaccard_misses(spark):
    long_text = " ".join(f"tok{i}" for i in range(100))
    excerpt = " ".join(f"tok{i}" for i in range(20))
    df = spark.createDataFrame(
        [(1, long_text), (2, excerpt)], ["doc_id", "text"]
    )
    out = D.ngram_containment_pairs(df, shingle_n=3).collect()
    assert len(out) == 1
    r = out[0]
    # all 18 excerpt shingles appear in the long doc
    assert r["cont_b_in_a"] == 1.0
    assert r["cont_a_in_b"] == round(18 / 98, 6)
    # exact Jaccard for the same pair would be tiny
    jac = D.ngram_jaccard_pairs(df, shingle_n=3).collect()[0]["jaccard"]
    assert jac < 0.2 < r["cont_b_in_a"]


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant 4-5
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((4, 5))
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {r["node"]: r["n_triangles"] for r in G.triangle_count(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3, 5: 0}


def test_triangle_count_no_triangles_on_a_path(spark):
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], ["id_a", "id_b"]
    )
    got = {r["node"]: r["n_triangles"] for r in G.triangle_count(df).collect()}
    assert got == {1: 0, 2: 0, 3: 0, 4: 0}


def test_clustering_coefficient_k4_and_pendant(spark):
    edges = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    edges.append((4, 5))
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    got = {
        r["node"]: (r["degree"], r["n_triangles"], r["clustering"])
        for r in G.clustering_coefficient(df).collect()
    }
    # inside K4 every neighbor pair is connected -> coefficient 1
    for n in (1, 2, 3):
        assert got[n] == (3, 3, 1.0)
    # node 4 has degree 4 (K4 + pendant): 3 triangles of C(4,2)=6 pairs
    assert got[4] == (4, 3, 0.5)
    # pendant node: degree 1 -> defined as 0
    assert got[5] == (1, 0, 0.0)


def test_hll_merge_equals_direct_and_bounds(spark):
    from kafka_stream_unify_order_messages_spark.operators import (
        sketches as SK,
    )

    rows = [("a", f"tok{i}") for i in range(300)] + [
        ("b", f"tok{i}") for i in range(150, 450)
    ]
    df = spark.createDataFrame(rows, ["grp", "item"])
    r = SK.hll_merge_groups(df, "grp", "item").collect()[0]
    # merging register sets is EXACTLY the sketch of the union
    assert r["merged_estimate"] == r["direct_estimate"]
    # summing per-group estimates double-counts the 150-token overlap
    assert r["sum_group_estimates"] > r["merged_estimate"]
    assert r["exact_distinct"] == 450
    assert abs(r["rel_error"]) < 0.2  # 256 registers -> ~6.5% sigma


def test_rrf_fuse_prefers_doc_ranked_by_both_lists(spark):
    from kafka_stream_unify_order_messages_spark.operators import (
        retrieval as RT,
    )

    a = spark.createDataFrame(
        [(10, 1), (11, 2), (12, 3)], ["doc_id", "rank"]
    )
    b = spark.createDataFrame(
        [(12, 1), (13, 2)], ["doc_id", "rank"]
    )
    out = RT.rrf_fuse([("a", a), ("b", b)], k=10, c=60).collect()
    by_rank = sorted(out, key=lambda r: r["fused_rank"])
    # doc 12: 1/63 + 1/61 beats doc 10's single 1/61
    assert by_rank[0]["doc_id"] == 12
    assert by_rank[0]["n_lists"] == 2
    assert by_rank[1]["doc_id"] == 10
    scores = {r["doc_id"]: r["rrf_score"] for r in out}
    assert scores[12] == round(1 / 63 + 1 / 61, 6)


def test_windowed_funnel_later_first_step_rescues_chain(spark):
    # view@0 -> (no click within 60s) but view@100 -> click@110 works:
    # greedy-from-earliest would report stage 1; the reachability DP
    # must find stage 2
    rows = [
        (1, 1, _ts(0), "view"),
        (2, 1, dt.datetime(2024, 1, 1, 1, 40), "view"),
        (3, 1, dt.datetime(2024, 1, 1, 1, 41), "click"),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = A.funnel_stages(ev, ["view", "click"], max_gap_seconds=120).collect()
    assert out[0]["stage"] == 2


def test_windowed_funnel_expired_gap_blocks_stage(spark):
    rows = [
        (1, 1, _ts(0), "view"),
        (2, 1, dt.datetime(2024, 1, 1, 2, 0), "click"),  # 2h later
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts", "event_type"])
    out = A.funnel_stages(ev, ["view", "click"], max_gap_seconds=3600).collect()
    assert out[0]["stage"] == 1
    # unbounded form still completes
    out2 = A.funnel_stages(ev, ["view", "click"]).collect()
    assert out2[0]["stage"] == 2


def test_rolling_active_users_windows(spark):
    # user 1 active on day 1 and day 5; user 2 active on day 5 only
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 9)),
        (2, 1, dt.datetime(2024, 1, 5, 9)),
        (3, 2, dt.datetime(2024, 1, 5, 10)),
    ]
    ev = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
    got = {
        r["day"].date(): (r["dau"], r["wau"], r["mau"])
        for r in A.rolling_active_users(ev).collect()
    }
    assert got[dt.date(2024, 1, 1)] == (1, 1, 1)
    # on day 5: both users active that day; trailing 7 covers day 1 too
    assert got[dt.date(2024, 1, 5)] == (2, 2, 2)


def test_bfs_hops_path_graph_and_unreachable(spark):
    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.operators import graph as G

    # path 1-2-3-4-5, disconnected pair 10-11, isolated seedless node 20
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)], ["id_a", "id_b"]
    )
    edges = G.symmetrize(pairs)
    seeds = spark.createDataFrame([(1,)], ["node"])
    got = {
        r.node: r.hop for r in G.bfs_hops(edges, seeds, max_hops=6).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}  # 10/11 unreachable

    # cap respected: max_hops=2 stops the frontier
    capped = {
        r.node: r.hop for r in G.bfs_hops(edges, seeds, max_hops=2).collect()
    }
    assert capped == {1: 0, 2: 1, 3: 2}

    # shortest distance wins on a cycle: 1-2-3-4-5 plus chord 1-5
    cyc = G.symmetrize(
        spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (1, 5)], ["id_a", "id_b"]
        )
    )
    short = {
        r.node: r.hop for r in G.bfs_hops(cyc, seeds, max_hops=6).collect()
    }
    assert short == {1: 0, 2: 1, 5: 1, 3: 2, 4: 2}
