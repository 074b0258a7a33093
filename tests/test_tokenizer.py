"""BPE tokenizer training vs an independent pure-Python oracle."""

from __future__ import annotations

from collections import Counter

import pytest

from kafka_stream_unify_order_messages_spark.operators import tokenizer as TK


# --- independent reference implementation (classic Sennrich BPE) ---------


def _py_word_freqs(texts):
    c = Counter()
    for t in texts:
        c.update(t.lower().split())
    return c


def _py_pair_counts(vocab):
    pc = Counter()
    for syms, freq in vocab:
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += freq
    return pc


def _py_learn_bpe(texts, n_merges):
    vocab = [(list(w), f) for w, f in sorted(_py_word_freqs(texts).items())]
    merges = []
    for _ in range(n_merges):
        pc = _py_pair_counts(vocab)
        if not pc:
            break
        # max count, ties -> lexicographically smallest pair
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        if best[1] < 2:
            break
        a, b = best[0]
        merges.append((a, b))
        vocab = [(TK._merge_word(s, a, b), f) for s, f in vocab]
    return merges, vocab


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "the quick brown fox the quick brown fox",
]


@pytest.mark.parametrize("limit", [2_000_000, 0], ids=["driver", "distributed"])
def test_learn_bpe_matches_pure_python_oracle(spark, limit):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    got_merges, got_vocab = TK.learn_bpe(df, n_merges=10, driver_vocab_limit=limit)
    exp_merges, exp_vocab = _py_learn_bpe(CORPUS, 10)
    assert got_merges == exp_merges
    got = {r["word"]: list(r["symbols"]) for r in got_vocab.collect()}
    exp_map = {"".join(syms): syms for syms, _ in exp_vocab}
    assert set(got) == set(exp_map)
    for word, syms in got.items():
        assert exp_map[word] == syms, word


def test_learn_bpe_stops_when_no_pair_repeats(spark):
    df = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    merges, _ = TK.learn_bpe(df, n_merges=5)
    assert merges == []  # every pair occurs once -> below min count 2


def test_segment_word_replays_merges_equivalently():
    texts = CORPUS
    merges, _ = _py_learn_bpe(texts, 10)
    ranks = {p: i for i, p in enumerate(merges)}
    for word in _py_word_freqs(texts):
        # sequential replay of merges in training order
        syms = list(word)
        for a, b in merges:
            syms = TK._merge_word(syms, a, b)
        assert TK.segment_word(word, ranks) == syms
        assert "".join(TK.segment_word(word, ranks)) == word


def test_bpe_segment_counts_and_roundtrip(spark):
    df = spark.createDataFrame([(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"])
    merges, _ = TK.learn_bpe(df, n_merges=10)
    out = {r["doc_id"]: r for r in TK.bpe_segment(df, merges).collect()}
    for i, t in enumerate(CORPUS):
        words = t.lower().split()
        assert out[i]["n_words"] == len(words)
        ranks = {p: j for j, p in enumerate(merges)}
        n_pieces = sum(len(TK.segment_word(w, ranks)) for w in words)
        assert out[i]["n_bpe_tokens"] == n_pieces
        assert out[i]["n_bpe_tokens"] <= sum(len(w) for w in words)


def test_merge_word_greedy_overlap():
    assert TK._merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert TK._merge_word(list("aaaa"), "a", "a") == ["aa", "aa"]
    assert TK._merge_word(["ab", "c", "ab"], "ab", "c") == ["abc", "ab"]


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer
# ---------------------------------------------------------------------------


def _brute_force_best(word, logp):
    """Enumerate every segmentation (2^(n-1)) and return the best score
    with longest-piece-preferred tie-breaking, mirroring the DP's rule."""
    import itertools

    n = len(word)
    best = None
    for cuts in itertools.product([0, 1], repeat=n - 1):
        pieces, start = [], 0
        for i, c in enumerate(cuts, 1):
            if c:
                pieces.append(word[start:i])
                start = i
        pieces.append(word[start:])
        score = 0.0
        ok = True
        for p in pieces:
            if p in logp:
                score += logp[p]
            elif len(p) == 1:
                score += -100.0
            else:
                ok = False
                break
        if ok and (best is None or score > best[0]):
            best = (score, pieces)
    return best[0]


def test_viterbi_segment_is_optimal():
    import math

    from kafka_stream_unify_order_messages_spark.operators.tokenizer import (
        viterbi_segment,
    )

    logp = {
        "a": math.log(0.2), "b": math.log(0.1), "c": math.log(0.05),
        "ab": math.log(0.3), "bc": math.log(0.2), "abc": math.log(0.1),
        "d": math.log(0.05),
    }
    for word in ["abc", "abcd", "abcabc", "dd", "adbc", "x", "xa"]:
        got = viterbi_segment(word, logp)
        assert "".join(got) == word
        got_score = sum(
            logp.get(p, -100.0) for p in got
        )
        assert got_score == pytest.approx(_brute_force_best(word, logp), abs=1e-12)


def test_learn_unigram_finds_common_substrings_and_is_deterministic(spark):
    rows = [(i, "banana bandana banana") for i in range(20)]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    from kafka_stream_unify_order_messages_spark.operators import tokenizer as TK

    logp1 = TK.learn_unigram(docs)
    logp2 = TK.learn_unigram(docs)
    assert logp1 == logp2  # bit-identical across runs
    # the dominant word survives EM as a whole (or near-whole) piece
    assert any(len(p) >= 4 for p in logp1)
    # coverage: segmentation reconstructs any word, even unseen chars
    segs = TK.viterbi_segment("banzana", logp1)
    assert "".join(segs) == "banzana"


def test_unigram_segment_stats_shape(spark):
    from kafka_stream_unify_order_messages_spark.operators import tokenizer as TK

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "")], ["doc_id", "text"]
    )
    logp = TK.learn_unigram(docs)
    out = {r["doc_id"]: r for r in TK.unigram_segment(docs, logp).collect()}
    assert out[1]["n_words"] == 3
    assert out[1]["n_pieces"] >= 3
    assert out[2]["n_words"] == 0 and out[2]["n_pieces"] == 0
    assert len(out[1]["pieces_hash"]) == 32


def test_unigram_agreement_eval_is_perfect(spark):
    # the registry's quality bound for the rows-only unigram queries:
    # the independent pure-Python trainer (own tokenizer/seeder/backward
    # Viterbi) must reproduce the distributed trainer exactly — pieces,
    # 6-decimal log-probs, AND per-word segmentations
    from kafka_stream_unify_order_messages_spark.queries_training import (
        unigram_agreement_eval,
    )

    row = unigram_agreement_eval(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["agreement"] == 1.0
    assert row["n_pieces_dist"] == row["n_pieces_indep"] == row["n_logp_agree"]
    assert row["n_seg_agree"] == row["n_vocab_words"] > 0


def test_bpe_sql_oracle_early_stop_parity(spark, tmp_path):
    # the DuckDB training oracle must STOP like the operator when no
    # pair reaches count 2 (sentinel rounds): full exhaustion (no
    # merges at all) and partial exhaustion (one merge then stop) both
    # have to agree on merges AND segmentation stats
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from kafka_stream_unify_order_messages_spark.queries_training import (
        _bpe_learn_sql,
        _bpe_segment_sql,
    )

    cases = {
        "full": ["abc def", "ghij kl", "mnop qr"],  # every pair count 1
        "partial": ["aa aa aa bb", "aa cc", "zz yy"],  # one merge, stop
    }
    for name, texts in cases.items():
        d = tmp_path / name
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(1, len(texts) + 1)),
                    "text": pa.array(texts),
                    "lang": pa.array(["en"] * len(texts)),
                    "source": pa.array(["s"] * len(texts)),
                    "n_chars": pa.array([len(t) for t in texts]),
                }
            ),
            str(d / "documents.parquet"),
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        docs = spark.read.parquet(str(d / "documents.parquet"))
        merges, _ = TK.learn_bpe(docs, n_merges=8)
        assert con.execute(_bpe_learn_sql(8)).fetchall() == [
            (i, a, b) for i, (a, b) in enumerate(merges)
        ]
        duck_seg = {
            r[0]: r[1:] for r in con.execute(_bpe_segment_sql(8)).fetchall()
        }
        spark_seg = {
            r["doc_id"]: (r["n_words"], r["n_bpe_tokens"], r["tokens_hash"])
            for r in TK.bpe_segment(docs, merges).collect()
        }
        assert duck_seg == spark_seg
