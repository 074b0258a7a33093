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
