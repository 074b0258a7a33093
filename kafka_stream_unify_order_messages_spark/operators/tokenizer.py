"""Distributed BPE tokenizer training and application.

A training-data pipeline doesn't just *count* tokens — it learns the
tokenizer from the corpus. This module implements byte-pair-encoding
training the way it actually scales:

1. The corpus is reduced ONCE to a (word, freq) vocabulary table — the
   only corpus-wide pass. Everything after runs on the vocabulary, which
   is orders of magnitude smaller than the corpus (Zipf), so per-merge
   iteration cost is independent of corpus size.
2. Each merge round: adjacent-symbol-pair counts (freq-weighted) are a
   distributed aggregate over the vocab; the argmax pair (count desc,
   then lexicographic for determinism) is a 1-row TakeOrdered collect;
   the merge itself rewrites symbol arrays via an Arrow-batched
   ``mapInPandas`` (greedy left-to-right, standard BPE).
3. Lineage is truncated with ``localCheckpoint`` every few rounds, the
   same discipline as the connected-components loop (see
   operators/dedup.py:dedup_clusters) — otherwise plan strings grow
   exponentially across iterations.
4. Applying the tokenizer to the corpus (``bpe_segment``) is scan-local:
   one Arrow-batched pass with the merge ranks broadcast in the closure.

The reference has no tokenizer surface (SURVEY.md §2.6); this is part of
the north-star training-pipeline extension.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
import pyspark.sql.functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from kafka_stream_unify_order_messages_spark.functions.text import tokens


def word_freqs(
    df: DataFrame, text_col: str = "text", min_len: int = 1
) -> DataFrame:
    """(word, freq) vocabulary table — the single corpus-wide pass.

    One explode + one hash aggregate (map-side combined); the result is
    vocabulary-sized, so every subsequent BPE round is corpus-independent.
    """
    return (
        df.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _adjacent_pairs(symbols: Column) -> Column:
    """Adjacent symbol pairs of a BOUND array column, as 'a b' strings
    (symbols can be multi-char after merges, so the pair needs a
    separator)."""
    return F.transform(
        F.sequence(F.lit(1), F.size(symbols) - 1),
        lambda i: F.concat_ws(
            " ", F.element_at(symbols, i), F.element_at(symbols, i + 1)
        ),
    )


def pair_counts(vocab: DataFrame) -> DataFrame:
    """Frequency-weighted adjacent-pair counts over a (symbols, freq)
    vocabulary. Map-side combine applies before the one exchange; rows
    shuffled are (pair, partial count) — vocabulary-bounded."""
    pairs = vocab.filter(F.size("symbols") >= 2).select(
        "freq", F.explode(_adjacent_pairs(F.col("symbols"))).alias("pair")
    )
    return pairs.groupBy("pair").agg(F.sum("freq").cast("long").alias("cnt"))


def _merge_word(symbols: list, a: str, b: str) -> list:
    """Greedy left-to-right BPE merge of one pair within one word."""
    out, i, n = [], 0, len(symbols)
    while i < n:
        if i + 1 < n and symbols[i] == a and symbols[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(symbols[i])
            i += 1
    return out


_VOCAB_SCHEMA = StructType(
    [
        StructField("word", StringType(), True),
        StructField("symbols", ArrayType(StringType()), True),
        StructField("freq", LongType(), True),
    ]
)


def learn_bpe(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 8,
    checkpoint_every: int = 4,
    driver_vocab_limit: int = 2_000_000,
) -> tuple[list[tuple[str, str]], DataFrame]:
    """Learn ``n_merges`` BPE merges from the corpus.

    Returns (merges in learned order, final vocabulary DataFrame with the
    merged ``symbols`` arrays). Ties in pair frequency break on the
    lexicographically smallest pair, making training fully deterministic.

    The corpus-wide pass (word_freqs) is always distributed. The merge
    loop itself runs on the VOCABULARY, which even at web scale is a few
    million rows — when it fits under ``driver_vocab_limit`` the loop runs
    in driver memory (how production BPE trainers work: one cluster pass
    for counts, in-memory merges), and the final symbol table is rebuilt
    distributed in a single ``mapInPandas`` pass by replaying the learned
    ranks. Above the limit, the loop runs fully distributed: per round one
    vocab-sized aggregate, a 1-row TakeOrdered collect, and an
    Arrow-batched merge rewrite, with lineage checkpoints.
    """
    wf = word_freqs(df)
    if wf.limit(driver_vocab_limit + 1).count() <= driver_vocab_limit:
        rows = wf.collect()
        vocab_py = sorted((list(r["word"]), r["freq"]) for r in rows)
        merges: list[tuple[str, str]] = []
        from collections import Counter

        for _ in range(n_merges):
            pc: Counter = Counter()
            for syms, freq in vocab_py:
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += freq
            if not pc:
                break
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            if cnt < 2:
                break
            merges.append((a, b))
            vocab_py = [(_merge_word(s, a, b), f) for s, f in vocab_py]
        return merges, _replay_vocab(wf, merges)

    vocab = wf.select(
        "word",
        F.split("word", "(?!$)").alias("symbols"),  # chars, no trailing ''
        F.col("freq").cast("long"),
    ).localCheckpoint()

    merges = []
    for r in range(n_merges):
        top = (
            pair_counts(vocab)
            .orderBy(F.desc("cnt"), F.asc("pair"))
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < 2:
            break
        a, b = top[0]["pair"].split(" ", 1)
        merges.append((a, b))

        def apply_merge(
            pdfs: Iterator[pd.DataFrame], a: str = a, b: str = b
        ) -> Iterator[pd.DataFrame]:
            for pdf in pdfs:
                pdf["symbols"] = [
                    _merge_word(list(s), a, b) for s in pdf["symbols"]
                ]
                yield pdf

        vocab = vocab.mapInPandas(apply_merge, _VOCAB_SCHEMA)
        # truncate lineage: each round otherwise nests the previous plan
        if (r + 1) % checkpoint_every == 0:
            vocab = vocab.localCheckpoint()
    return merges, vocab


def _replay_vocab(wf: DataFrame, merges: list[tuple[str, str]]) -> DataFrame:
    """Final (word, symbols, freq) table: replay all merges in one
    distributed pass (rank-greedy segmentation == sequential replay)."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def seg(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            yield pd.DataFrame(
                {
                    "word": pdf["word"],
                    "symbols": [segment_word(w, ranks) for w in pdf["word"]],
                    "freq": pdf["freq"],
                }
            )

    return wf.mapInPandas(seg, _VOCAB_SCHEMA)


def segment_word(word: str, ranks: dict[tuple[str, str], int]) -> list:
    """Encode one word with learned merges, best-rank-first (the standard
    BPE inference order — equivalent to replaying merges in sequence)."""
    syms = list(word)
    while len(syms) >= 2:
        best, best_rank = None, None
        for i in range(len(syms) - 1):
            rk = ranks.get((syms[i], syms[i + 1]))
            if rk is not None and (best_rank is None or rk < best_rank):
                best, best_rank = i, rk
        if best is None:
            break
        syms = syms[:best] + [syms[best] + syms[best + 1]] + syms[best + 2 :]
    return syms


def bpe_segment(
    df: DataFrame,
    merges: list[tuple[str, str]],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_bpe_tokens, tokens_hash) — the corpus re-tokenized
    with the learned merges. Scan-local: one Arrow-batched pass, merge
    ranks broadcast in the closure (vocab-sized, KBs)."""
    import hashlib

    ranks = {pair: i for i, pair in enumerate(merges)}
    schema = StructType(
        [
            df.schema[id_col],
            StructField("n_words", LongType(), True),
            StructField("n_bpe_tokens", LongType(), True),
            StructField("tokens_hash", StringType(), True),
        ]
    )

    def seg(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = str(text).lower().split()
                pieces = []
                for w in words:
                    pieces.extend(segment_word(w, ranks))
                rows.append(
                    (
                        rid,
                        len(words),
                        len(pieces),
                        hashlib.md5(" ".join(pieces).encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_words", "n_bpe_tokens", "tokens_hash"]
            )

    return df.select(id_col, text_col).mapInPandas(seg, schema)


# ---------------------------------------------------------------------------
# Unigram-LM tokenizer (SentencePiece's second algorithm, Kudo 2018) —
# the complement of BPE above. Same scale discipline: ONE corpus pass to
# the (word, freq) vocabulary; seeding and every EM round run on the
# vocabulary, Arrow-batched, with the piece table broadcast in the
# closure. Hard (Viterbi) EM keeps training fully deterministic: the DP
# breaks score ties toward the LONGEST piece at each position, so two
# runs — and the pure-Python test oracle — produce identical pieces.
# ---------------------------------------------------------------------------


def seed_unigram_pieces(
    wf: DataFrame,
    max_piece_len: int = 4,
    max_pieces: int = 64,
) -> DataFrame:
    """(piece, cnt): candidate vocabulary — every substring of every word
    up to ``max_piece_len`` chars, frequency-weighted; all single chars
    are kept unconditionally (coverage guarantee), multi-char candidates
    keep the top ``max_pieces`` by (count desc, piece asc).

    The substring explosion is pure codegen: positions and lengths come
    from ``sequence`` + ``Column.substr`` on the vocabulary table, which
    is already corpus-independent in size.
    """
    word = F.col("word")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(word) - i + 1),
                ),
                lambda L: word.substr(i, L),
            ),
        )
    )
    counts = (
        wf.select(F.explode(subs).alias("piece"), "freq")
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    chars = counts.filter(F.length("piece") == 1)
    multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.desc("cnt"), F.asc("piece"))
        .limit(max_pieces)
    )
    return chars.unionByName(multi)


def viterbi_segment(word: str, logp: dict) -> list:
    """Max-log-prob segmentation of one word under piece log-probs.

    DP over end positions; ties (exact float equality) prefer the longest
    last piece, making segmentation deterministic and independent of dict
    iteration order. Unknown single chars get a large penalty instead of
    -inf so coverage never fails.
    """
    n = len(word)
    UNK = -100.0
    best = [0.0] + [float("-inf")] * n
    back = [0] * (n + 1)
    max_len = max((len(p) for p in logp), default=1)
    for end in range(1, n + 1):
        for start in range(max(0, end - max_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if end - start == 1:
                    lp = UNK
                else:
                    continue
            score = best[start] + lp
            # strictly-greater OR equal-with-longer-piece wins
            if score > best[end] or (
                score == best[end] and start < back[end]
            ):
                best[end] = score
                back[end] = start
    pieces = []
    end = n
    while end > 0:
        start = back[end]
        pieces.append(word[start:end])
        end = start
    return list(reversed(pieces))


def _viterbi_counts(
    vocab_wf: DataFrame, logp: dict
) -> DataFrame:
    """(piece, cnt) expected counts under hard-EM: each word's Viterbi
    segmentation, frequency-weighted. Arrow-batched over the vocabulary
    with the piece table broadcast in the closure."""
    schema = StructType(
        [
            StructField("piece", StringType(), True),
            StructField("cnt", LongType(), True),
        ]
    )

    def count_batch(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            agg: dict = {}
            for w, f in zip(pdf["word"], pdf["freq"]):
                for piece in viterbi_segment(str(w), logp):
                    agg[piece] = agg.get(piece, 0) + int(f)
            yield pd.DataFrame(
                {"piece": list(agg.keys()), "cnt": list(agg.values())}
            )

    return (
        vocab_wf.mapInPandas(count_batch, schema)
        .groupBy("piece")
        .agg(F.sum("cnt").alias("cnt"))
    )


def learn_unigram(
    df: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    max_pieces: int = 64,
    em_iterations: int = 2,
) -> dict:
    """Train the unigram LM: seed from substring counts, then
    ``em_iterations`` rounds of Viterbi (hard) EM. Returns {piece:
    log-prob} for every piece with nonzero final count.

    Driver state is the piece table only (<= max_pieces + alphabet,
    KBs); each EM round is one vocabulary-sized distributed pass.
    """
    import math

    wf = word_freqs(df, text_col).localCheckpoint()
    seed = seed_unigram_pieces(wf, max_piece_len, max_pieces).collect()
    total = sum(r["cnt"] for r in seed)
    # log-probs round to 6 decimals at the seed AND at every EM
    # boundary: DP scores are then sums of identical quantized doubles
    # in identical order across engines, which is what lets the DuckDB
    # oracle re-train this model bit-exactly (the same iteration-
    # boundary rounding rule as kmeans_train_exact)
    logp = {r["piece"]: round(math.log(r["cnt"] / total), 6) for r in seed}

    for _ in range(em_iterations):
        counts = _viterbi_counts(wf, logp).collect()
        total = sum(r["cnt"] for r in counts)
        logp = {
            r["piece"]: round(math.log(r["cnt"] / total), 6)
            for r in counts
            if r["cnt"] > 0
        }
    return logp


def unigram_segment(
    df: DataFrame,
    logp: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id, n_words, n_pieces, pieces_hash): the corpus re-tokenized with
    the trained unigram LM. Scan-local Arrow pass, piece log-probs
    broadcast in the closure — the same shape as bpe_segment."""
    import hashlib

    schema = StructType(
        [
            df.schema[id_col],
            StructField("n_words", LongType(), True),
            StructField("n_pieces", LongType(), True),
            StructField("pieces_hash", StringType(), True),
        ]
    )

    def seg(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            rows = []
            for rid, text in zip(pdf[id_col], pdf[text_col]):
                words = str(text).lower().split()
                pieces = []
                for w in words:
                    pieces.extend(viterbi_segment(w, logp))
                rows.append(
                    (
                        rid,
                        len(words),
                        len(pieces),
                        hashlib.md5(" ".join(pieces).encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "n_words", "n_pieces", "pieces_hash"]
            )

    return df.select(id_col, text_col).mapInPandas(seg, schema)
