"""As-of join and bucketed range join edge cases: inclusive boundaries,
timestamp ties, missing matches, bucket-crossing bands."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.operators.temporal import (
    asof_join,
    range_join,
)


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive_and_missing(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", ts("2024-01-01T10:00:00")),
            (2, "u1", ts("2024-01-01T12:00:00")),
            (3, "u2", ts("2024-01-01T09:00:00")),  # no right rows at all
        ],
        "lid long, user string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (10, "u1", ts("2024-01-01T10:00:00"), 1.0),  # exact tie: matches
            (11, "u1", ts("2024-01-01T11:30:00"), 2.0),
            (12, "u1", ts("2024-01-01T13:00:00"), 3.0),  # future: never used
        ],
        "rid long, user string, ts timestamp_ntz, v double",
    )
    out = {
        r.lid: (r.rid_r, r.v_r)
        for r in asof_join(
            left, right, on="user", right_cols=["rid", "v"], tiebreak="rid"
        ).collect()
    }
    assert out[1] == (10, 1.0)  # ts tie is a match (inclusive)
    assert out[2] == (11, 2.0)  # latest at-or-before
    assert out[3] == (None, None)  # no match -> nulls, row preserved


def test_asof_tiebreak_largest_wins(spark):
    left = spark.createDataFrame(
        [(1, "u", ts("2024-01-01T10:00:00"))],
        "lid long, user string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (7, "u", ts("2024-01-01T09:00:00")),
            (9, "u", ts("2024-01-01T09:00:00")),  # same ts: larger rid wins
            (8, "u", ts("2024-01-01T09:00:00")),
        ],
        "rid long, user string, ts timestamp_ntz",
    )
    [row] = asof_join(
        left, right, on="user", right_cols=["rid"], tiebreak="rid"
    ).collect()
    assert row.rid_r == 9


def test_range_join_band_boundaries(spark):
    left = spark.createDataFrame(
        [(1, "u", ts("2024-01-01T10:00:00"))],
        "id long, user string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (20, "u", ts("2024-01-01T10:00:00")),  # lower bound: included
            (21, "u", ts("2024-01-01T10:00:59")),
            (22, "u", ts("2024-01-01T10:01:00")),  # upper bound: excluded
            (23, "u", ts("2024-01-01T09:59:59")),  # before: excluded
            (24, "x", ts("2024-01-01T10:00:30")),  # other key: excluded
        ],
        "id long, user string, ts timestamp_ntz",
    )
    out = range_join(left, right, on="user", lower_s=0.0, upper_s=60.0)
    assert sorted(r.r_id for r in out.collect()) == [20, 21]


def test_range_join_band_crossing_bucket_edge(spark):
    # right rows land in the neighbor bucket relative to the left row;
    # the two-bucket probe must still find them
    left = spark.createDataFrame(
        [(1, "u", ts("2024-01-01T10:00:50"))],
        "id long, user string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (30, "u", ts("2024-01-01T10:01:40")),  # +50s, next minute bucket
            (31, "u", ts("2024-01-01T10:01:55")),  # +65s: outside band
        ],
        "id long, user string, ts timestamp_ntz",
    )
    out = range_join(left, right, on="user", lower_s=0.0, upper_s=60.0)
    assert [r.r_id for r in out.collect()] == [30]


def test_range_join_nonzero_lower(spark):
    left = spark.createDataFrame(
        [(1, "u", ts("2024-01-01T10:00:00"))],
        "id long, user string, ts timestamp_ntz",
    )
    right = spark.createDataFrame(
        [
            (40, "u", ts("2024-01-01T10:00:10")),  # < lower 30s: excluded
            (41, "u", ts("2024-01-01T10:00:30")),  # = lower: included
            (42, "u", ts("2024-01-01T10:00:59")),  # in band
            (43, "u", ts("2024-01-01T10:01:00")),  # = upper: excluded
        ],
        "id long, user string, ts timestamp_ntz",
    )
    out = range_join(left, right, on="user", lower_s=30.0, upper_s=60.0)
    assert sorted(r.r_id for r in out.collect()) == [41, 42]
