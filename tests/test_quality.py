"""Data-quality operator semantics: CDC log collapse, expectation
checking, column profiling, zone-map skipping eval."""

from __future__ import annotations

import pytest

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.operators import layout as L
from kafka_stream_unify_order_messages_spark.operators import quality as Q
from kafka_stream_unify_order_messages_spark.operators import warehouse as W


def test_apply_changes_latest_wins_and_delete_removes(spark):
    log = spark.createDataFrame(
        [
            # key 1: two upserts -> latest value survives
            (1, 1, "upsert", 10.0),
            (1, 2, "upsert", 20.0),
            # key 2: upsert then delete -> gone
            (2, 1, "upsert", 5.0),
            (2, 2, "delete", 0.0),
            # key 3: delete then upsert (out-of-order op) -> resurrected
            (3, 1, "delete", 0.0),
            (3, 2, "upsert", 7.0),
        ],
        ["k", "seq", "op", "v"],
    )
    got = {
        r["k"]: r["v"]
        for r in W.apply_changes(log, ["k"], ["seq"]).collect()
    }
    assert got == {1: 20.0, 3: 7.0}


def test_apply_changes_seq_tiebreak_is_deterministic(spark):
    log = spark.createDataFrame(
        [(1, 5, 1, "upsert", 1.0), (1, 5, 2, "upsert", 2.0)],
        ["k", "seq", "sub", "op", "v"],
    )
    out = W.apply_changes(log, ["k"], ["seq", "sub"]).collect()
    assert [r["v"] for r in out] == [2.0]


def test_check_expectations_counts_each_violation_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "ok", 10.0),
            (1, "ok", 20.0),       # dup id
            (None, "ok", 30.0),    # null id
            (3, "junk", -1.0),     # bad status AND out of range
        ],
        ["id", "status", "price"],
    )
    out = {
        r["expectation"]: (r["n_violations"], r["passed"])
        for r in Q.check_expectations(
            df,
            [
                Q.expect_not_null("id"),
                Q.expect_unique("id"),
                Q.expect_in_set("status", ["ok"]),
                Q.expect_between("price", 0, 100),
            ],
        ).collect()
    }
    assert out["not_null_id"] == (1, False)
    # 4 rows, 3 distinct ids (1, 3, null->not counted) -> 4 - 3 = 1
    assert out["unique_id"] == (1, False)
    assert out["accepted_values_status"] == (1, False)
    assert out["range_price"] == (1, False)


def test_check_expectations_all_pass(spark):
    df = spark.createDataFrame([(1, "ok"), (2, "ok")], ["id", "status"])
    out = Q.check_expectations(
        df, [Q.expect_not_null("id"), Q.expect_unique("id")]
    ).collect()
    assert all(r["passed"] and r["n_violations"] == 0 for r in out)


def test_check_expectations_single_scan(spark):
    df = spark.createDataFrame([(1, "ok")], ["id", "status"])
    plan = (
        Q.check_expectations(
            df,
            [
                Q.expect_not_null("id"),
                Q.expect_unique("id"),
                Q.expect_in_set("status", ["ok"]),
            ],
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole expectation set evaluates in one pass over one scan
    n_scans = (
        plan.count("LocalTableScan")
        + plan.count("FileScan")
        + plan.count("Scan ExistingRDD")
    )
    assert n_scans == 1, plan


def test_profile_table_values(spark):
    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (2, None)], ["id", "s"]
    )
    out = {r["column_name"]: r for r in Q.profile_table(df, ["id", "s"]).collect()}
    r = out["id"]
    assert (r["n_rows"], r["n_null"], r["n_distinct"]) == (3, 0, 2)
    assert (r["min_value"], r["max_value"]) == ("1", "2")
    r = out["s"]
    assert (r["n_rows"], r["n_null"], r["n_distinct"]) == (3, 1, 2)
    assert (r["min_value"], r["max_value"]) == ("a", "b")


def test_profile_table_modes_share_schema(spark):
    # the 100 TB knob (approx_count_distinct) must be a drop-in: same
    # columns, same types, same row set — only n_distinct may differ
    # (and at these cardinalities HLL++ is exact anyway)
    df = spark.createDataFrame(
        [(1, "b"), (2, "a"), (2, None)], ["id", "s"]
    )
    exact = Q.profile_table(df, ["id", "s"], exact=True)
    approx = Q.profile_table(df, ["id", "s"], exact=False)
    assert [f.name for f in exact.schema.fields] == [
        f.name for f in approx.schema.fields
    ]
    assert [f.dataType for f in exact.schema.fields] == [
        f.dataType for f in approx.schema.fields
    ]
    e = {r["column_name"]: r.asDict() for r in exact.collect()}
    a = {r["column_name"]: r.asDict() for r in approx.collect()}
    assert e == a


def test_profile_table_exact_distinct_binary_and_all_null(spark):
    # the exploded exact path encodes non-string types via
    # to_json(struct(col)) — binary must stay injective (plain
    # cast-to-string is lossy UTF-8 and would collapse distinct blobs),
    # and an all-null column must report 0 distinct, not vanish
    df = spark.createDataFrame(
        [
            (bytearray(b"\xff\xfe"), None),
            (bytearray(b"\xff\xfd"), None),
            (bytearray(b"\xff\xfe"), None),
        ],
        "b binary, z string",
    )
    out = {
        r["column_name"]: r
        for r in Q.profile_table(df, ["b", "z"]).collect()
    }
    assert out["b"]["n_distinct"] == 2
    assert (out["z"]["n_null"], out["z"]["n_distinct"]) == (3, 0)


def test_profile_table_exact_micros_timestamps_and_nested_floats(spark):
    # two regressions the default to_json encoding hides:
    # 1) timestamps differing only in MICROseconds — the default JSON
    #    timestampFormat truncates to millis and collapses them;
    # 2) -0.0 vs 0.0 NESTED inside an array — SQL grouping normalizes
    #    them to one value at any depth, but to_json renders two
    #    distinct strings, overcounting. (Those columns fall back to
    #    countDistinct.)
    import datetime as dt

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            (ts.replace(microsecond=1000), [0.0, 1.0]),
            (ts.replace(microsecond=1001), [-0.0, 1.0]),
            (ts.replace(microsecond=1002), [float("nan")]),
            (ts.replace(microsecond=1002), [float("nan")]),
        ],
        "t timestamp, a array<double>",
    )
    out = {
        r["column_name"]: r
        for r in Q.profile_table(df, ["t", "a"]).collect()
    }
    assert out["t"]["n_distinct"] == 3  # micros-distinct must not collapse
    assert out["a"]["n_distinct"] == 2  # [0.0,1.0]==[-0.0,1.0]; NaN==NaN


def test_zonemap_eval_zorder_skips_clustered_dimension(spark):
    # x clustered by z-tiles must prune; the "natural" order (y) spreads
    # x uniformly so its zone maps cover everything
    rows = [(x, y) for x in range(64) for y in range(16)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = L.zonemap_skipping_eval(
        df,
        x_col="x",
        y_col="y",
        probe_values=[3, 40],
        natural_col="y",
        bits=8,
        tile_shift=8,   # 16-bit z-code -> tiles on high byte
        natural_rows_per_file=4,
    )
    res = {(r["layout"], r["probe_value"]): r for r in out.collect()}
    for v in (3, 40):
        z = res[("zorder", v)]
        n = res[("natural", v)]
        assert z["skip_ratio"] > 0.5, z
        # every natural file spans almost the whole x range
        assert n["skip_ratio"] == 0.0, n


def test_compaction_plan_bin_packs_per_partition(spark):
    from kafka_stream_unify_order_messages_spark.operators.warehouse import (
        compaction_plan,
    )

    # partition "a": sizes 60,60,60 at target 100 -> groups 0 (60+60=120
    # crosses after the second file joins: before=60 < 100 so file 2 is
    # group 0; file 3 has before=120 -> group 1). partition "b": one file.
    rows = [
        ("a", 1, 60),
        ("a", 2, 60),
        ("a", 3, 60),
        ("b", 9, 10),
    ]
    files = spark.createDataFrame(rows, ["part_key", "file_id", "size_bytes"])
    out = {
        (r["part_key"], r["compact_group"]): (r["n_files"], r["group_bytes"])
        for r in compaction_plan(files, target_bytes=100).collect()
    }
    assert out == {
        ("a", 0): (2, 120),
        ("a", 1): (1, 60),
        ("b", 0): (1, 10),
    }


def test_apply_compaction_rewrites_small_files(spark, tmp_path):
    import pyspark.sql.functions as F
    from pathlib import Path

    from kafka_stream_unify_order_messages_spark.operators.warehouse import (
        apply_compaction,
    )
    from kafka_stream_unify_order_messages_spark.sources.files import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "fragmented")
    # fragment: ~20 small files
    (
        events.repartition(4)
        .write.option("maxRecordsPerFile", 60)
        .parquet(src)
    )
    n_small = len(list(Path(src).glob("*.parquet")))
    assert n_small >= 10

    out = str(tmp_path / "compacted")
    n_before, n_groups = apply_compaction(
        spark, src, out, target_bytes=64 * 1024
    )
    assert n_before == n_small
    n_after = len(list(Path(out).glob("*.parquet")))
    assert n_after < n_small
    assert abs(n_after - n_groups) <= 1  # one file per planned group

    # rewrite is lossless
    a = spark.read.parquet(src)
    b = spark.read.parquet(out)
    assert b.count() == a.count()
    assert set(b.columns) == set(a.columns)
    sa = a.agg(F.sum("value"), F.sum("event_id")).collect()[0]
    sb = b.agg(F.sum("value"), F.sum("event_id")).collect()[0]
    assert sa == sb

    # partitioned layout refused, not flattened
    part = str(tmp_path / "parted")
    events.write.partitionBy("event_type").parquet(part)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        apply_compaction(spark, part, str(tmp_path / "x"))


def test_profile_table_exact_nested_timestamp_micros(spark):
    # the timestampFormat fix must reach NESTED timestamps too: a struct
    # field differing only in microseconds collapses under the default
    # millis JSON rendering
    import datetime as dt

    ts = dt.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [
            ((ts.replace(microsecond=1000), 1),),
            ((ts.replace(microsecond=1001), 1),),
        ],
        "s struct<t timestamp, x int>",
    )
    out = {
        r["column_name"]: r for r in Q.profile_table(df, ["s"]).collect()
    }
    assert out["s"]["n_distinct"] == 2
