"""load_table's plan memo: hit on identical (session, path, confs), miss on
anything that changes what the read resolves.

Round-13 regression pinned here: the memo key ignored session confs, so a
test that flipped ``spark.sql.sources.useV1SourceList`` got back a stale V1
relation resolved under the default conf.
"""

from __future__ import annotations

import os

from kafka_stream_unify_order_messages_spark.sources.files import (
    _TABLE_MEMO,
    clear_table_memo,
    load_table,
)

SF = "/root/testdata/sf0.001"


def test_memo_hit_same_args(spark):
    clear_table_memo()
    a = load_table(spark, SF, "lineitem")
    b = load_table(spark, SF, "lineitem")
    assert a is b


def test_memo_miss_on_v2_source_conf(spark):
    # flipping the V1/V2 split must yield a freshly-resolved relation,
    # and the V2 one must actually BE v2 (BatchScan, not FileScan)
    clear_table_memo()
    old = spark.conf.get("spark.sql.sources.useV1SourceList")
    v1 = load_table(spark, SF, "lineitem")
    try:
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        v2 = load_table(spark, SF, "lineitem")
        assert v2 is not v1
        plan = v2._jdf.queryExecution().executedPlan().toString()
        assert "BatchScan" in plan, plan
    finally:
        spark.conf.set("spark.sql.sources.useV1SourceList", old)
    # restoring the conf restores the original memo entry
    assert load_table(spark, SF, "lineitem") is v1


def test_memo_miss_on_part_file_rewrite(spark, tmp_path):
    # in-place rewrite of a same-named part file leaves the DIRECTORY
    # mtime unchanged; the memo must still notice (max-over-entries key)
    sf_dir = str(tmp_path)
    path = os.path.join(sf_dir, "t.parquet")
    spark.range(10).toDF("id").write.mode("overwrite").parquet(path)
    clear_table_memo()
    a = load_table(spark, sf_dir, "t")
    part = next(
        os.path.join(path, f) for f in os.listdir(path) if f.endswith(".parquet")
    )
    dir_mtime = os.path.getmtime(path)
    os.utime(part, (dir_mtime + 10, dir_mtime + 10))  # rewrite-in-place proxy
    os.utime(path, (dir_mtime, dir_mtime))  # dir mtime pinned unchanged
    b = load_table(spark, sf_dir, "t")
    assert b is not a


def test_memo_capped(spark):
    from kafka_stream_unify_order_messages_spark.sources import files

    clear_table_memo()
    load_table(spark, SF, "lineitem")
    old_cap = files._TABLE_MEMO_CAP
    files._TABLE_MEMO_CAP = len(_TABLE_MEMO)
    try:
        load_table(spark, SF, "orders")
        assert len(_TABLE_MEMO) <= files._TABLE_MEMO_CAP
    finally:
        files._TABLE_MEMO_CAP = old_cap
        clear_table_memo()
