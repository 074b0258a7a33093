"""Dedup / similarity / text-analysis operator semantics on tiny fixtures."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_stream_unify_order_messages_spark.functions import text as T
from kafka_stream_unify_order_messages_spark.operators import dedup as D
from kafka_stream_unify_order_messages_spark.operators import similarity as S


@pytest.fixture()
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog"),
        (2, "the  quick brown FOX jumps over the lazy dog"),  # exact dup (norm)
        (3, "The quick brown fox jumps over the lazy cat"),  # near dup
        (4, "completely different content about spark engines"),
        (5, ""),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_dedup_exact_groups_normalized_copies(docs):
    out = {r["keep_id"]: r for r in D.dedup_exact(docs).collect()}
    assert out[1]["n_copies"] == 2
    assert out[1]["dup_ids_csv"] == "1,2"
    assert out[3]["n_copies"] == 1


def test_minhash_candidates_find_near_dup(docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_candidate_pairs(
            docs, num_hashes=16, bands=8, shingle_n=2
        ).collect()
    }
    assert (1, 2) in pairs  # identical after normalization
    assert (1, 3) in pairs  # one-word change
    assert (1, 4) not in pairs and (3, 4) not in pairs


def test_ngram_jaccard_values(docs):
    sim = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, shingle_n=2).collect()
    }
    assert sim[(1, 2)] == 1.0
    assert 0.3 < sim[(1, 3)] < 1.0
    assert (1, 4) not in sim  # no shared shingles


def test_simhash_close_for_near_dups(docs):
    out = {r["doc_id"]: r["simhash"] for r in D.simhash(docs).collect()}
    assert out[1] == out[2]  # same normalized tokens

    def hamming(a, b):
        return bin(a ^ b).count("1")

    assert hamming(out[1], out[3]) < hamming(out[1], out[4])


def test_lang_id_votes(spark):
    rows = [
        (1, "the cat and the dog of a house"),
        (2, "el perro y la casa de que si"),
        (3, "xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["pred"] for r in df.select(
        "doc_id", T.lang_id("text").alias("pred")
    ).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "und"


def test_quality_score_bounds(docs):
    vals = [
        r["q"]
        for r in docs.select(T.quality_score("text").alias("q")).collect()
    ]
    assert all(0.0 <= v <= 1.0 for v in vals)


@pytest.fixture()
def vectors(spark):
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.9, 0.1, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [-1.0, 0.0, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, ["vec_id", "embedding"])


def test_brute_force_topk(vectors):
    out = S.brute_force_topk(
        vectors.filter(F.col("vec_id") == 1), vectors, k=2
    ).collect()
    ranked = sorted((r["rnk"], r["neighbor_id"]) for r in out)
    assert ranked[0] == (1, 2)  # closest is the nearly-parallel vector
    assert len(ranked) == 2
    assert all(r["neighbor_id"] != 1 for r in out)


def test_lsh_buckets_group_similar_vectors(vectors):
    buckets = {
        r["vec_id"]: r["bucket"]
        for r in S.lsh_buckets(vectors, n_planes=6, dim=4).collect()
    }
    assert buckets[1] == buckets[2]  # nearly parallel -> same signature
    assert buckets[1] != buckets[4]  # antipodal -> different signature


def test_bigram_repetition_values(spark):
    rows = [
        (1, "a b a b a b"),        # bigrams: ab ba ab ba ab -> 2 distinct of 5
        (2, "w x y z"),            # all distinct -> 0.0
        (3, "solo"),               # < 2 tokens -> 0.0
        (4, ""),                   # empty -> 0.0
        (5, "r r r r r"),          # all same bigram -> 3/4 repeated
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r["rep"]
        for r in df.select(
            "doc_id", T.bigram_repetition("text").alias("rep")
        ).collect()
    }
    assert out[1] == 0.6  # 1 - 2/5
    assert out[2] == 0.0
    assert out[3] == 0.0
    assert out[4] == 0.0
    assert out[5] == 0.75  # 1 - 1/4


def test_scrub_pii_masks_and_counts(spark):
    rows = [
        (1, "mail me at a.user+x@site.co or b@x.io thanks"),
        (2, "call 555-0199 or 555-1234 now"),
        (3, "nothing sensitive here"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            T.scrub_pii("text").alias("scrubbed"),
            T.pii_counts("text").alias("c"),
        ).collect()
    }
    assert out[1]["scrubbed"] == "mail me at <EMAIL> or <EMAIL> thanks"
    assert out[1]["c"]["n_emails"] == 2 and out[1]["c"]["n_phones"] == 0
    assert out[2]["scrubbed"] == "call <PHONE> or <PHONE> now"
    assert out[2]["c"]["n_phones"] == 2
    assert out[3]["scrubbed"] == "nothing sensitive here"


def test_decontaminate_flags_overlapping_docs(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        decontaminate,
    )

    bench = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], ["doc_id", "text"]
    )
    corpus = spark.createDataFrame(
        [
            # contains the benchmark 4-gram "alpha beta gamma delta"
            (1, "intro alpha beta gamma delta outro"),
            # shares words but no 4-gram
            (2, "alpha beta something gamma delta"),
            (3, "totally unrelated text right here"),
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r["n_hits"]
        for r in decontaminate(corpus, bench, ngram_n=4).collect()
    }
    assert out == {1: 1}


def test_quantize_int8_roundtrip_error_bounded(spark):
    from kafka_stream_unify_order_messages_spark.functions.vectors import (
        dequantize,
        quantize_int8,
    )

    rows = [
        (1, [0.5, -1.0, 0.25, 0.0]),
        (2, [0.0, 0.0, 0.0, 0.0]),  # zero vector: scale 0, all-zero codes
        (3, [127.0, -127.0, 1.0, -1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    qz = df.select(
        "vec_id",
        "embedding",
        quantize_int8("embedding").alias("qz"),
    )
    out = {r["vec_id"]: r for r in qz.collect()}
    assert out[2]["qz"]["scale"] == 0.0
    assert out[2]["qz"]["q"] == [0, 0, 0, 0]
    assert out[3]["qz"]["q"] == [127, -127, 1, -1]
    assert max(abs(q) for q in out[1]["qz"]["q"]) == 127  # max|x| -> ±127

    # dequantized error is bounded by scale/2 per element (plus the slack
    # from the stored scale being rounded to 9 decimals: up to 127*5e-10
    # per code, and the half-up rounding itself sits exactly on the bound)
    deq = qz.select(
        "vec_id",
        "embedding",
        F.col("qz.scale").alias("s"),
        dequantize(F.col("qz.scale"), F.col("qz.q")).alias("xhat"),
    )
    for r in deq.collect():
        for x, xh in zip(r["embedding"], r["xhat"]):
            assert abs(x - xh) <= (r["s"] / 2) + 1e-6


def test_dedup_clusters_transitive_components(spark):
    # A~B, B~C, D~E: components {1,2,3} and {10,11}; labels = component min
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(pairs).collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_dedup_clusters_chain_converges_within_diameter(spark):
    # a 6-node path: min label must walk the whole chain
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(5)], ["id_a", "id_b"]
    )
    out = {
        r["doc_id"]: r["cluster_id"]
        for r in D.dedup_clusters(pairs, max_iter=10).collect()
    }
    assert set(out.values()) == {0}


def test_dedup_lines_removes_cross_doc_repeats(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        dedup_lines,
    )

    # 4-word chunks: doc 1 owns both chunks; doc 2 repeats doc 1's first
    # chunk (dropped) and adds a fresh one (kept); doc 3 is entirely a
    # repeat of doc 1 -> empty clean_text
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d x y z w"),
        (3, "a b c d"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in dedup_lines(docs, chunk_words=4).collect()
    }
    assert out[1]["clean_text"] == "a b c d e f g h"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (2, 0)
    assert out[2]["clean_text"] == "x y z w"
    assert (out[2]["n_kept"], out[2]["n_dropped"]) == (1, 1)
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (0, 1)


def test_dedup_lines_keeps_first_occurrence_within_doc(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        dedup_lines,
    )

    docs = spark.createDataFrame(
        [(7, "p q r s p q r s")], ["doc_id", "text"]
    )
    row = dedup_lines(docs, chunk_words=4).collect()[0]
    assert row["clean_text"] == "p q r s"
    assert (row["n_kept"], row["n_dropped"]) == (1, 1)


def test_remove_boilerplate_drops_every_copy(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        remove_boilerplate,
    )

    # chunk "a b c d" appears in 3 distinct docs; with max_doc_freq=2 it
    # is boilerplate and vanishes from ALL of them (line dedup would have
    # kept doc 1's copy). Unique chunks survive untouched.
    rows = [
        (1, "a b c d e f g h"),
        (2, "a b c d x y z w"),
        (3, "a b c d"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(
            docs, chunk_words=4, max_doc_freq=2
        ).collect()
    }
    assert out[1]["clean_text"] == "e f g h"
    assert (out[1]["n_kept"], out[1]["n_dropped"]) == (1, 1)
    assert out[2]["clean_text"] == "x y z w"
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_kept"], out[3]["n_dropped"]) == (0, 1)


def test_remove_boilerplate_counts_repeats_within_doc_once(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        remove_boilerplate,
    )

    # "p q r s" occurs twice in doc 7 but only in 2 distinct docs —
    # under the doc-frequency definition (df > 2) it is NOT boilerplate,
    # so both in-doc copies survive.
    docs = spark.createDataFrame(
        [(7, "p q r s p q r s"), (8, "p q r s")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r
        for r in remove_boilerplate(
            docs, chunk_words=4, max_doc_freq=2
        ).collect()
    }
    assert out[7]["clean_text"] == "p q r s p q r s"
    assert (out[7]["n_kept"], out[7]["n_dropped"]) == (2, 0)
    assert out[8]["clean_text"] == "p q r s"


def test_bigram_lm_scores_hand_computed(spark):
    import math

    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        bigram_lm_scores,
    )

    # bigrams: doc1 -> (a,b),(b,a),(a,b); doc2 -> (a,b); doc3 excluded
    # C(a,b)=3 C(b,a)=1 C(a,.)=3 C(b,.)=1 V=2 alpha=0.5
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b"), (3, "solo")], ["doc_id", "text"]
    )
    out = {
        r["doc_id"]: r for r in bigram_lm_scores(docs, alpha=0.5).collect()
    }
    p_ab = 3.5 / 4.0
    p_ba = 1.5 / 2.0
    assert set(out) == {1, 2}
    assert out[1]["n_bigrams"] == 3
    expected1 = -(2 * math.log(p_ab) + math.log(p_ba)) / 3
    assert abs(out[1]["avg_nll"] - round(expected1, 6)) < 1e-9
    assert abs(out[1]["ppl"] - round(math.exp(expected1), 4)) < 1e-9
    assert out[2]["n_bigrams"] == 1
    assert abs(out[2]["avg_nll"] - round(-math.log(p_ab), 6)) < 1e-9


def test_temperature_sample_determinism_and_cap(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        temperature_sample,
    )

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(50)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "source"])

    # deterministic: same draws, same rows, twice
    a = sorted(r["doc_id"] for r in temperature_sample(docs).collect())
    b = sorted(r["doc_id"] for r in temperature_sample(docs).collect())
    assert a == b and len(a) > 0

    # alpha=0 -> equal group weights; small group's p hits the cap at 1
    # (p_small = 0.5 * 0.5 * 450/50 = 2.25 -> 1), so ALL small docs kept
    out = temperature_sample(docs, alpha=0.0, budget_frac=0.5).collect()
    small_kept = [r for r in out if r["source"] == "small"]
    assert len(small_kept) == 50
    # big group keeps roughly p_big = 0.28 of 400 (binomial-ish via hash)
    big_kept = [r for r in out if r["source"] == "big"]
    assert 60 < len(big_kept) < 170


def test_semantic_dedup_pairs_within_cluster_exact(spark):
    import numpy as np

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    # two well-separated directions; near-dups only within a direction
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),   # ~dup of 1
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.01, 0.999, 0.0]),   # ~dup of 3
        (5, [0.7, 0.0, 0.7, 0.0]),      # between, dup of nobody at 0.99
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    pairs = {
        (r["id_a"], r["id_b"]): r["score"]
        for r in S.semantic_dedup_pairs(
            df, threshold=0.99, centroids=cents
        ).collect()
    }
    assert set(pairs) == {(1, 2), (3, 4)}
    assert all(s >= 0.99 for s in pairs.values())


def test_semdedup_agreement_eval_counts_and_subset(spark):
    import numpy as np

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    # hand-checkable geometry: pairs (1,2) and (3,4) are true near-dups;
    # (5,6) are near-dups ACROSS the two centroid directions, so
    # cluster-scoped SemDeDup must miss exactly that pair -> the
    # agreement eval's semantics (cand subset of truth, agreement =
    # retained fraction) are pinned without any fixture data
    rows = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.999, 0.01, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.01, 0.999, 0.0]),
        (5, [0.71, 0.0, 0.7, 0.0]),    # assigned to centroid 0
        (6, [0.7, 0.0, 0.71, 0.0]),    # assigned to centroid 1
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    truth = {
        (r["id_a"], r["id_b"])
        for r in S.semantic_dedup_pairs(
            df,
            threshold=0.99,
            centroids=np.zeros((1, 4), dtype=np.float64),
        ).collect()
    }
    cents = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 1.0, 0.0]])
    cand = {
        (r["id_a"], r["id_b"])
        for r in S.semantic_dedup_pairs(
            df, threshold=0.99, centroids=cents
        ).collect()
    }
    assert truth == {(1, 2), (3, 4), (5, 6)}
    assert cand == {(1, 2), (3, 4)}
    assert cand <= truth  # precision 1 by construction


def test_knn_join_matches_lsh_topk_including_chunked_blocks(spark):
    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    # the distributed-both-sides kNN join must reproduce the broadcast-
    # query lsh_topk exactly — same hyperplanes, buckets, ranking — and
    # max_block small enough to force the skew chunk-decomposition must
    # not change a single row (every (q,c) pair scored in exactly one
    # block, partial block top-k merged by the global window)
    rows = [
        (i, [float(x) for x in S.hyperplane(500 + i, 8)]) for i in range(60)
    ]
    corpus = spark.createDataFrame(rows, ["vec_id", "embedding"])
    queries = corpus.filter(F.col("vec_id") % 5 == 0)

    def as_set(df):
        return {
            (r["query_id"], r["neighbor_id"], r["score"], r["rnk"])
            for r in df.collect()
        }

    base = as_set(S.lsh_topk(queries, corpus, k=3, n_planes=4, dim=8))
    dist = as_set(S.knn_join(queries, corpus, k=3, n_planes=4, dim=8))
    chunked = as_set(
        S.knn_join(queries, corpus, k=3, n_planes=4, dim=8, max_block=4)
    )
    assert base == dist
    assert base == chunked
    # multi-probe parity too (query side explodes to Hamming-1 buckets)
    base_mp = as_set(
        S.lsh_topk(queries, corpus, k=3, n_planes=4, dim=8, multi_probe=True)
    )
    dist_mp = as_set(
        S.knn_join(queries, corpus, k=3, n_planes=4, dim=8, multi_probe=True)
    )
    assert base_mp == dist_mp
    assert len({q for q, *_ in base_mp}) >= len({q for q, *_ in base})


def test_semantic_dedup_keeps_one_per_component(spark):
    import numpy as np

    from kafka_stream_unify_order_messages_spark.operators import (
        dedup as D,
        similarity as S,
    )
    import pyspark.sql.functions as F

    # chain 1~2, 2~3 inside one cluster: component {1,2,3} keeps only 1
    rows = [
        (1, [1.0, 0.0]),
        (2, [0.9999, 0.01]),
        (3, [0.999, 0.02]),
        (9, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    pairs = S.semantic_dedup_pairs(
        df, n_centroids=2, threshold=0.999, centroids=cents
    )
    clusters = D.dedup_clusters(pairs.select("id_a", "id_b"))
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id"))
    kept = sorted(
        r["vec_id"]
        for r in df.join(
            losers.select(F.col("doc_id").alias("vec_id")),
            "vec_id",
            "left_anti",
        ).collect()
    )
    assert kept == [1, 9]


def test_dedup_lines_matches_pure_python_oracle_random_corpora(spark):
    import math
    import random

    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        dedup_lines,
    )

    def py_oracle(docs, cw):
        chunks = []
        for doc_id, text in docs:
            words = text.split(" ")
            for i in range(math.ceil(len(words) / cw)):
                chunks.append(
                    (doc_id, i, " ".join(words[i * cw:(i + 1) * cw]))
                )
        first = {}
        for doc_id, i, c in sorted(chunks):
            first.setdefault(c, (doc_id, i))
        out = {}
        for doc_id, _ in docs:
            kept = [
                c
                for d, i, c in sorted(chunks)
                if d == doc_id and first[c] == (d, i)
            ]
            dropped = sum(
                1
                for d, i, c in chunks
                if d == doc_id and first[c] != (d, i)
            )
            out[doc_id] = (" ".join(kept), len(kept), dropped)
        return out

    for seed, cw in [(7, 3), (8, 4), (9, 5)]:
        rng = random.Random(seed)
        vocab = [f"w{k}" for k in range(6)]  # tiny vocab -> many collisions
        docs = [
            (
                doc_id,
                " ".join(
                    rng.choice(vocab)
                    for _ in range(rng.randrange(1, 4 * cw + 2))
                ),
            )
            for doc_id in range(20)
        ]
        expected = py_oracle(docs, cw)
        got = {
            r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
            for r in dedup_lines(
                spark.createDataFrame(docs, ["doc_id", "text"]),
                chunk_words=cw,
            ).collect()
        }
        assert got == expected, f"seed={seed} cw={cw}"


def test_dedup_incremental_against_existing_and_intra_batch(spark):
    from kafka_stream_unify_order_messages_spark.operators.dedup import (
        dedup_incremental,
    )

    existing = spark.createDataFrame(
        [(1, "already ingested"), (2, "old news")], ["doc_id", "text"]
    )
    new = spark.createDataFrame(
        [
            (10, "Already   INGESTED"),  # dup of existing after normalize
            (11, "fresh content"),
            (12, "fresh content"),       # intra-batch dup of 11
            (13, "another one"),
        ],
        ["doc_id", "text"],
    )
    kept = sorted(
        r["doc_id"] for r in dedup_incremental(new, existing).collect()
    )
    assert kept == [11, 13]


def test_dedup_clusters_random_graphs_match_union_find(spark):
    import random

    for seed in (1, 2, 3):
        rng = random.Random(seed)
        n = 40
        edges = sorted(
            {tuple(sorted(rng.sample(range(n), 2))) for _ in range(25)}
        )
        parent = list(range(n))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        touched = {v for e in edges for v in e}
        expected = {
            v: min(u for u in touched if find(u) == find(v)) for v in touched
        }
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in D.dedup_clusters(
                spark.createDataFrame(edges, ["id_a", "id_b"]), max_iter=40
            ).collect()
        }
        assert got == expected, f"seed={seed}"


def test_semantic_dedup_skew_guard_matches_unsplit(spark):
    """A pathological cluster (every vector lands in one cell) is
    block-decomposed by max_cluster_size; each member pair is scored in
    exactly one block, so the pair set is identical to the unsplit run."""
    import math
    import random

    import numpy as np

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    rng = random.Random(7)
    rows = []
    for i in range(60):
        # all near one direction -> single cluster, many pairs over 0.9
        theta = rng.uniform(0.0, 0.4)
        rows.append((i, [math.cos(theta), math.sin(theta), 0.0, 0.0]))
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cents = np.array([[1.0, 0.0, 0.0, 0.0], [0.0, 0.0, 0.0, 1.0]])

    def pair_set(max_cluster_size):
        return {
            (r["id_a"], r["id_b"], r["score"])
            for r in S.semantic_dedup_pairs(
                df,
                threshold=0.95,
                centroids=cents,
                max_cluster_size=max_cluster_size,
            ).collect()
        }

    unsplit = pair_set(10**9)
    split = pair_set(8)  # 60 rows -> 8 chunks -> 36 block tasks
    assert unsplit  # non-trivial fixture
    assert split == unsplit
    assert all(a < b for a, b, _ in split)


def test_gopher_rules_flags_and_keep(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        gopher_quality,
    )

    rows = [
        # 25 words, normal lengths, has stopwords -> keep
        (1, "the quick brown fox jumps over a lazy dog and then "
            "runs far away to the old barn in search of warm food now"),
        # too short
        (2, "the cat sat"),
        # numbers only: fails alpha fraction and stopwords
        (3, " ".join(str(n) for n in range(30))),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert out[1]["keep"] and out[1]["r_words"] and out[1]["r_stopwords"]
    assert not out[2]["keep"] and not out[2]["r_words"]
    assert not out[3]["r_alpha"] and not out[3]["r_stopwords"]
    assert out[3]["alpha_frac"] == 0.0


def test_random_projection_deterministic_and_linear(spark):
    import numpy as np

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    rows = [
        (1, [1.0] + [0.0] * 63),
        (2, [0.0, 2.0] + [0.0] * 62),
        (3, [1.0, 2.0] + [0.0] * 62),
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    out = {r["vec_id"]: r for r in S.random_projection(df).collect()}
    planes = [S.hyperplane(100 + j, 64) for j in range(8)]
    # row 1 picks out component 0 of each plane; row 3 = row1 + row2
    for j in range(8):
        assert out[1][f"p{j}"] == round(planes[j][0], 6)
        assert abs(
            out[3][f"p{j}"] - (out[1][f"p{j}"] + out[2][f"p{j}"])
        ) < 2e-6


def test_dedup_clusters_driver_and_distributed_paths_agree(spark):
    # chain + triangle + isolate-pair: min-of-component labels must be
    # identical whether resolved by driver union-find (small-graph path)
    # or distributed min-label propagation (driver_edge_limit=0)
    pairs = spark.createDataFrame(
        [(2, 3), (1, 3), (5, 6), (6, 7), (5, 7), (9, 10)],
        ["id_a", "id_b"],
    )
    expect = {
        (1, 1), (2, 1), (3, 1),
        (5, 5), (6, 5), (7, 5),
        (9, 9), (10, 9),
    }
    fast = {
        (r["doc_id"], r["cluster_id"])
        for r in D.dedup_clusters(pairs).collect()
    }
    slow = {
        (r["doc_id"], r["cluster_id"])
        for r in D.dedup_clusters(pairs, driver_edge_limit=0).collect()
    }
    assert fast == expect
    assert slow == expect


def test_dedup_clusters_probe_executes_candidate_plan_once(spark):
    # the size probe must not pay candidate generation twice on the
    # distributed path: with the pair plan instrumented by a per-row
    # accumulator, total increments across probe + star clustering must
    # equal the edge count exactly (persist means every partition is
    # computed at most once; without it the probe's partitions recount)
    import pandas as pd

    acc = spark.sparkContext.accumulator(0)
    edges = [(i, i + 1) for i in range(0, 40, 2)]
    base = spark.createDataFrame(edges, ["id_a", "id_b"]).repartition(4)

    def counted(it):
        for pdf in it:
            acc.add(len(pdf))
            yield pdf

    pairs = base.mapInPandas(counted, "id_a long, id_b long")
    # driver_edge_limit below the edge count forces the distributed path
    got = {
        (r["doc_id"], r["cluster_id"])
        for r in D.dedup_clusters(pairs, driver_edge_limit=5).collect()
    }
    assert got == {(i, i) for i in range(0, 40, 2)} | {
        (i + 1, i) for i in range(0, 40, 2)
    }
    assert acc.value == len(edges), (
        f"candidate plan rows computed {acc.value}x, expected "
        f"{len(edges)} (one execution)"
    )


def test_minhash_edges_same_components_as_pairs(docs, spark):
    pairs = D.minhash_candidate_pairs(docs, num_hashes=16, bands=8, shingle_n=2)
    edges = D.minhash_candidate_edges(docs, num_hashes=16, bands=8, shingle_n=2)
    lbl_pairs = {
        (r["doc_id"], r["cluster_id"])
        for r in D.dedup_clusters(pairs).collect()
    }
    lbl_edges = {
        (r["doc_id"], r["cluster_id"])
        for r in D.dedup_clusters(edges).collect()
    }
    assert lbl_pairs == lbl_edges and lbl_pairs
    # the edge list never exceeds the pair list
    assert edges.count() <= pairs.count()


def test_dedup_clusters_star_deep_chain(spark):
    # a 40-node chain (diameter 39): min-label propagation would need 39
    # rounds; large-star/small-star must converge within its default
    # round budget and still label every node with the chain minimum
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], ["id_a", "id_b"]
    )
    out = {
        (r["doc_id"], r["cluster_id"])
        for r in D.dedup_clusters(pairs, driver_edge_limit=0).collect()
    }
    assert out == {(i, 0) for i in range(41)}


def test_dedup_clusters_star_matches_union_find_random_graphs(spark):
    import random

    rng = random.Random(11)
    for trial in range(3):
        n = 30
        edges = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(25)
        ]
        edges = [(a, b) for a, b in edges if a != b]
        pairs = spark.createDataFrame(edges, ["id_a", "id_b"])
        fast = {
            (r["doc_id"], r["cluster_id"])
            for r in D.dedup_clusters(pairs).collect()
        }
        star = {
            (r["doc_id"], r["cluster_id"])
            for r in D.dedup_clusters(pairs, driver_edge_limit=0).collect()
        }
        assert star == fast, f"trial {trial}"


def test_token_budget_mixture_upsamples_small_source(spark):
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        token_budget_mixture,
    )

    rows = [(i, "big" if i < 400 else "small", 100) for i in range(450)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "n_tokens"])
    kept = token_budget_mixture(df, alpha=0.5, budget_frac=0.5).collect()
    by_src = {}
    for r in kept:
        by_src.setdefault(r["source"], []).append(r["doc_id"])
    # alpha=0.5 boosts the small source's keep PROBABILITY above the
    # big one's: small keeps (nearly) everything, big keeps roughly its
    # scaled-down share; total tokens ≈ half the corpus
    assert len(by_src["small"]) >= 40  # ~all of 50
    frac_big = len(by_src["big"]) / 400
    frac_small = len(by_src["small"]) / 50
    assert frac_small > frac_big
    total_kept = sum(len(v) for v in by_src.values())
    assert 150 < total_kept < 300  # ~225 expected of 450


def test_minhash_edges_linear_under_extreme_duplication(spark):
    # 3000 identical docs in one LSH bucket: the pair form would emit
    # ~4.5M rows; the star form must emit exactly n-1 edges and cluster
    # them in one component — the quadratic-output guard, end to end
    docs = spark.createDataFrame(
        [(i, "the same boilerplate page content repeated everywhere")
         for i in range(3000)],
        ["doc_id", "text"],
    )
    edges = D.minhash_candidate_edges(docs, num_hashes=16, bands=4, shingle_n=3)
    assert edges.count() == 2999
    labels = D.dedup_clusters(edges.select("id_a", "id_b"))
    agg = labels.groupBy("cluster_id").count().collect()
    assert len(agg) == 1 and agg[0]["cluster_id"] == 0 and agg[0]["count"] == 3000


def test_lsh_recall_metric_detects_missed_candidates(spark):
    # the recall metric must DISCRIMINATE: with bands=1 (all 16 minhash
    # rows must collide) near-but-not-identical dups drop out of the
    # candidate set while exact jaccard still finds them
    rows = [
        (1, "alpha beta gamma delta epsilon zeta eta theta"),
        (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near dup
        (3, "completely different words everywhere here now"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    truth = D.ngram_jaccard_pairs(docs, shingle_n=2, threshold=0.3).select(
        "id_a", "id_b"
    )
    assert truth.count() >= 1  # (1,2) is true at jaccard>=0.3
    strict = D.minhash_candidate_pairs(
        docs, num_hashes=16, bands=1, shingle_n=2
    )
    loose = D.minhash_candidate_pairs(
        docs, num_hashes=16, bands=8, shingle_n=2
    )
    hits_strict = truth.join(strict, ["id_a", "id_b"]).count()
    hits_loose = truth.join(loose, ["id_a", "id_b"]).count()
    assert hits_loose > hits_strict  # banding is the recall lever


def test_bloom_decontaminate_no_false_negatives(spark):
    """Bloom screening is one-sided: every exactly-contaminated gram must
    be flagged (superset), and per doc n_bloom_hits >= n_exact_hits with
    the exact column matching the exact decontaminate operator."""
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        bloom_decontaminate,
        decontaminate,
    )
    from kafka_stream_unify_order_messages_spark.sources.files import (
        load_table,
    )
    import pyspark.sql.functions as F

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    bloom = {
        r.doc_id: (r.n_bloom_hits, r.n_exact_hits)
        for r in bloom_decontaminate(
            corpus, bench, ngram_n=4, m=16384, k=3
        ).collect()
    }
    exact = {
        r.doc_id: r.n_hits
        for r in decontaminate(corpus, bench, ngram_n=4).collect()
    }
    # every exactly-contaminated doc is flagged, with the same exact count
    for doc_id, n_hits in exact.items():
        assert doc_id in bloom
        assert bloom[doc_id][1] == n_hits
        assert bloom[doc_id][0] >= n_hits
    # exact column never exceeds the bloom column
    assert all(nb >= ne for nb, ne in bloom.values())


def test_semantic_dedup_auto_k_scales_with_corpus(spark):
    """n_centroids=None (the production scale path for the fixed-k
    ~n^2/k cliff measured in SCALING.md): k = max(16, ceil(sqrt(n))),
    and the auto-mode pairs are exactly the fixed-k pairs at the same
    k — auto only picks the geometry, never changes the scoring."""
    import math

    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.operators import (
        similarity as S,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    k_auto = max(16, math.ceil(math.sqrt(n)))
    auto = sorted(
        map(
            tuple,
            S.semantic_dedup_pairs(
                emb, n_centroids=None, threshold=0.35
            ).collect(),
        )
    )
    fixed = sorted(
        map(
            tuple,
            S.semantic_dedup_pairs(
                emb, n_centroids=k_auto, threshold=0.35
            ).collect(),
        )
    )
    assert auto == fixed and len(auto) > 0
    # more cells than the default 16 once n > 256 (sf0.001 has 500)
    assert k_auto > 16


def test_priority_sample_is_deterministic_and_length_biased(spark):
    """Priority sampling (u_i/w_i, k smallest win): repeat runs select the
    SAME set (the draw is hash-derived, no rand()), zero-token docs are
    ineligible, and selection is length-biased — with weight = token
    count, the expected token mass of the sample exceeds a uniform draw's
    by construction, so the selected docs' mean length must beat the
    corpus mean by a wide margin on any non-degenerate corpus."""
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        priority_sample,
    )
    from kafka_stream_unify_order_messages_spark.sources.files import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    sized = load_table(spark, sf, "documents").select(
        "doc_id", T.token_count("text").alias("n")
    )
    a = {r.doc_id for r in priority_sample(sized, 50, "n").collect()}
    b = {r.doc_id for r in priority_sample(sized, 50, "n").collect()}
    assert a == b and len(a) == 50

    stats = sized.agg(
        F.avg("n").alias("corpus_mean"),
        F.avg(F.when(F.col("doc_id").isin(list(a)), F.col("n"))).alias(
            "sample_mean"
        ),
        F.min(F.when(F.col("doc_id").isin(list(a)), F.col("n"))).alias(
            "sample_min"
        ),
    ).first()
    assert stats.sample_min >= 1  # zero-weight rows ineligible
    assert stats.sample_mean > stats.corpus_mean * 1.1

    # weight monotonicity on a controlled fixture: doubling one row's
    # weight halves its priority, so among two rows with the same draw
    # geometry the heavier one enters the sample first
    rows = spark.createDataFrame(
        [(i, 1 if i != 7 else 1000) for i in range(100)], ["doc_id", "w"]
    )
    top = {r.doc_id for r in priority_sample(rows, 5, "w").collect()}
    assert 7 in top  # the 1000x-weight row is effectively certain


def test_priority_sample_estimates_unbiased_subset_sums(spark):
    """DLT estimator invariants (exact) + unbiasedness (statistical, but
    DETERMINISTIC here — the draws are md5-seeded, so the averaged
    estimate is a fixed number and the assertion can never flake):
    exactly k rows; w_hat = w above the threshold and = tau below it
    (one shared tau); averaging sum(w_hat) over independent seeds
    converges on the true total weight."""
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        priority_sample_estimates,
    )

    rows = [(i, (i % 7) + 1) for i in range(200)]  # weights 1..7
    total = sum(w for _, w in rows)
    df = spark.createDataFrame(rows, ["doc_id", "w"])

    got = priority_sample_estimates(df, 40, "w").collect()
    assert len(got) == 40
    assert all(r.w_hat >= r.w for r in got)
    taus = {r.w_hat for r in got if r.w_hat > r.w}
    assert len(taus) == 1  # every below-threshold row shares ONE tau

    sums = [
        sum(
            r.w_hat
            for r in priority_sample_estimates(
                df, 40, "w", seed=f"est{s}:"
            ).collect()
        )
        for s in range(12)
    ]
    mean = sum(sums) / len(sums)
    assert abs(mean - total) / total < 0.15, (mean, total, sums)

    # the estimator's sample is the SAME set priority_sample selects —
    # guaranteed by the shared _dlt_priority keying (two mathematically
    # equal priority forms would IEEE-round boundary rows differently)
    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        priority_sample,
    )

    plain = {r.doc_id for r in priority_sample(df, 40, "w").collect()}
    est = {
        r.doc_id for r in priority_sample_estimates(df, 40, "w").collect()
    }
    assert plain == est


def test_priority_sample_rejects_fractional_weights(spark):
    """The DLT keying casts the weight to long, so a fractional weight
    would be silently truncated — weight 0.5 passes the > 0 eligibility
    filter yet keys to priority 0 and is never sampled, while w_hat
    would mix the truncated priority with the raw weight. Both entry
    points must fail loudly on a non-integral weight column instead."""
    import pytest

    from kafka_stream_unify_order_messages_spark.operators.pipeline import (
        priority_sample,
        priority_sample_estimates,
    )

    frac = spark.createDataFrame(
        [(i, 0.5 + i) for i in range(10)], ["doc_id", "w"]
    )
    with pytest.raises(TypeError, match="integral weight column"):
        priority_sample(frac, 3, "w")
    with pytest.raises(TypeError, match="integral weight column"):
        priority_sample_estimates(frac, 3, "w")

    # every integral width is accepted (the cast is normalization only)
    ints = spark.createDataFrame([(i, i + 1) for i in range(10)],
                                 "doc_id long, w int")
    assert priority_sample(ints, 3, "w").count() == 3
