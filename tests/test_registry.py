"""Every registry query runs at sf0.001 and returns rows with the declared
columns; every oracle has a matching query key. (Full Spark-vs-DuckDB value
equality runs in scripts/check_oracle.py and the driver's own gate.)
"""

from __future__ import annotations

import pytest

from kafka_stream_unify_order_messages_spark import registry
from tests.conftest import SF_DIR


def test_oracles_subset_of_queries():
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_driver_window_rotation_covers_all_oracled():
    # ordering policy (registry.py / PARITY.md): 14 pinned §2 queries
    # first every round; the next 36 slots fill COVERAGE-FIRST (queries
    # without a driver CORRECTNESS row precede confirmed ones, so the
    # policy is self-advancing as each round's artifact lands), with the
    # confirmed remainder on the round-keyed rotation; rows-only queries
    # always sort last. Simulated here by feeding each round's window
    # back as the next round's checked set.
    pinned = registry._PINNED
    slots = registry._ROTATING_SLOTS
    rotatable = [
        n for n in registry.QUERIES
        if n in registry.ORACLES and n not in pinned
    ]
    try:
        seen: set[str] = set()
        rounds_needed = -(-len(rotatable) // slots)
        for rnd in range(1, rounds_needed + 1):
            registry._apply_registration_order(rnd, checked=set(seen))
            window = list(registry.QUERIES)[: len(pinned) + slots]
            assert window[: len(pinned)] == pinned
            tail = window[len(pinned):]
            assert all(n in registry.ORACLES for n in tail)
            # every slot is spent on a never-checked query until none
            # remain — the coverage-first invariant
            remaining = len(set(rotatable) - seen)
            n_new = sum(1 for n in tail if n not in seen)
            assert n_new == min(slots, remaining)
            seen.update(tail)
        assert seen >= set(rotatable)
        # rows-only queries after every oracled one
        names = list(registry.QUERIES)
        idx_rows_only = [
            i for i, n in enumerate(names) if n not in registry.ORACLES
        ]
        if idx_rows_only:
            assert min(idx_rows_only) >= len(names) - len(idx_rows_only)
        # same (round, artifacts) -> same order (the driver imports more
        # than once per round)
        registry._apply_registration_order(3)
        once = list(registry.QUERIES)
        registry._apply_registration_order(3)
        assert list(registry.QUERIES) == once
    finally:
        registry._apply_registration_order()  # restore real-round order


# Queries allowed to run without a SQL oracle (rows-only driver check).
# Every entry must have a reason and a stronger pytest pinning
# correctness. EMPTY since round 8: ann_ivf_topk and semantic_dedup
# graduated onto the exact-trained k-means model (kmeans_train_exact,
# SQL-replicable), and unigram_agreement_eval's oracle pins the eval to
# the DuckDB-retrained model's perfect-agreement maxima.
ROWS_ONLY_ALLOWED: set[str] = set()


def test_driver_checked_names_skips_malformed_artifacts(tmp_path, monkeypatch):
    """A CORRECTNESS_r*.json whose top level is a LIST (or junk) is
    skipped like a parse failure — query ordering must never crash on a
    malformed driver artifact."""
    import json

    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps(["not", "a", "dict"]))
    (tmp_path / "CORRECTNESS_r02.json").write_text("{broken json")
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps(
        {"good_q": {"hash_match": True},
         "bad_q": {"hash_match": True, "err": "boom"},
         "weird": "not-a-dict-value"}
    ))
    # _driver_checked_names globs Path(__file__).parent.parent first
    monkeypatch.setattr(
        registry, "__file__", str(tmp_path / "pkg" / "registry.py")
    )
    checked = registry._driver_checked_names()
    assert checked == {"good_q"}


def test_every_query_is_oracle_checked_or_documented():
    missing = set(registry.QUERIES) - set(registry.ORACLES)
    assert missing <= ROWS_ONLY_ALLOWED, (
        f"queries without oracle or documented exemption: "
        f"{missing - ROWS_ONLY_ALLOWED}"
    )


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_runs(spark, name):
    df = registry.QUERIES[name](spark, SF_DIR)
    rows = df.limit(5).collect()
    assert len(df.columns) > 0
    assert rows is not None


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())


def test_pinned_queries_all_registered():
    # _apply_registration_order skips pinned names missing from QUERIES
    # (so fixture deregistration can't KeyError a rebuild); this test is
    # the loud guard a typo or stale _PINNED entry would otherwise lose
    missing = [n for n in registry._PINNED if n not in registry.QUERIES]
    assert missing == [], f"stale names in registry._PINNED: {missing}"
