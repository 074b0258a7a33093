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
            h = bin(sims[a] ^ sims[b]).count("1")
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
