"""Simhash near-dup pairs: the pigeonhole banding must have EXACT recall
— every pair within the hamming budget appears in the banded join's
output (Manku et al.'s lemma: hamming <= bands-1 implies at least one
identical band slice). Verified against a brute-force all-pairs scan of
the same fingerprints, which the SQL oracle (same banding) cannot check.
"""

from __future__ import annotations

import numpy as np
import pytest

from kafka_stream_unify_order_messages_spark.operators.dedup import (
    simhash,
    simhash_near_dup_pairs,
)
from kafka_stream_unify_order_messages_spark.sources.files import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF, "documents").limit(200).cache()


def brute_force_pairs(sims: dict[int, int], max_hamming: int):
    ids = sorted(sims)
    out = set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            # mask to 64 bits: fingerprints arrive as SIGNED longs (bit
            # 63 makes them negative) and Python's ^ on negatives is
            # infinite-precision two's complement
            x = (sims[a] ^ sims[b]) & ((1 << 64) - 1)
            h = bin(x).count("1")
            if h <= max_hamming:
                out.add((a, b, h))
    return out


def test_banded_pairs_equal_brute_force(spark, docs):
    sims = {
        r.doc_id: r.simhash for r in simhash(docs, bits=32).collect()
    }
    expected = brute_force_pairs(sims, max_hamming=3)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            docs, bits=32, bands=4, max_hamming=3
        ).collect()
    }
    # exact recall AND exact precision: banding is a blocking strategy,
    # and the hamming filter makes the output identical to all-pairs
    assert got == expected


def test_recall_guard_rejects_bad_geometry(spark, docs):
    with pytest.raises(ValueError):
        simhash_near_dup_pairs(docs, bands=4, max_hamming=4)


def test_banded_pairs_equal_brute_force_64bit(spark, docs):
    # the at-scale width (16-bit band slices, SCALING.md): banding must
    # keep exact recall with the sign bit in play
    sims = {
        r.doc_id: r.simhash for r in simhash(docs, bits=64).collect()
    }
    expected = brute_force_pairs(sims, max_hamming=3)
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in simhash_near_dup_pairs(
            docs, bits=64, bands=4, max_hamming=3
        ).collect()
    }
    assert got == expected


def test_simhash_64bit_uses_the_sign_bit(spark, docs):
    # bit 63 is an independent fair-coin vote per doc, so a 200-doc
    # corpus with none set would mean the OR assembly silently dropped
    # it (the old sum-of-2^j assembly could not represent it at all)
    sims = [r.simhash for r in simhash(docs, bits=64).collect()]
    assert any(s < 0 for s in sims)
    # and the low 32 bits must be EXACTLY the 32-bit fingerprint (same
    # md5 word, same votes) — widening never changes existing bits
    sims32 = {
        r.doc_id: r.simhash for r in simhash(docs, bits=32).collect()
    }
    sims64 = {
        r.doc_id: r.simhash for r in simhash(docs, bits=64).collect()
    }
    for d, s in sims32.items():
        assert sims64[d] & 0xFFFFFFFF == s


def test_simhash_rejects_bad_width(spark, docs):
    for bad in (0, 65, -1):
        with pytest.raises(ValueError):
            simhash(docs, bits=bad)


def test_saturation_guard_trips_at_threshold(spark, docs):
    # 8-bit fingerprint / 4 bands = 2-bit slices -> 4 blocking buckets,
    # guard threshold 32<<2 = 128 rows; the 200-doc fixture must trip it
    # BEFORE any fingerprint job runs, and the explicit opt-in must
    # restore the old behavior (same geometry, tiny corpus)
    with pytest.raises(ValueError, match="blocking buckets"):
        simhash_near_dup_pairs(docs, bits=8, bands=4, max_hamming=3)
    out = simhash_near_dup_pairs(
        docs, bits=8, bands=4, max_hamming=3, allow_saturated_bands=True
    )
    assert out.columns == ["id_a", "id_b", "hamming"]
    out.count()  # runs without raising


def test_saturation_guard_respects_corpus_size(spark, docs):
    # same saturating geometry, but a corpus UNDER the threshold (128
    # rows for 2-bit slices) must pass untouched — the guard is about
    # rows-per-bucket, not the geometry alone
    small = docs.limit(100)
    out = simhash_near_dup_pairs(small, bits=8, bands=4, max_hamming=3)
    out.count()
