"""Z-order layout: Morton code correctness + real row-group pruning
effect (per-file parquet min/max ranges narrow in BOTH dimensions)."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pyspark.sql.functions as F

from kafka_stream_unify_order_messages_spark.operators import layout as L


def _py_morton(x: int, y: int, bits: int = 16) -> int:
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def test_morton_code_matches_python_oracle(spark):
    rows = [(x, y) for x in [0, 1, 5, 255, 65535] for y in [0, 2, 7, 1024, 65535]]
    df = spark.createDataFrame(rows, ["x", "y"])
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", L.morton_code(F.col("x"), F.col("y")).alias("z")).collect()
    }
    for (x, y), z in got.items():
        assert z == _py_morton(x, y), (x, y)
    # distinct inputs -> distinct codes (bijective on the bit range)
    assert len(set(got.values())) == len(rows)


def _file_stat_spans(path: str, col: str) -> list[tuple[int, int]]:
    spans = []
    for f in sorted(glob.glob(f"{path}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        spans.append((min(mins), max(maxs)))
    return spans


def test_zorder_write_narrows_stat_ranges_in_both_dims(spark, tmp_path):
    # grid data: x and y independent -> a single-column sort would leave
    # the other dimension's per-file span at full width
    rows = [(x, y, x * 1000 + y) for x in range(64) for y in range(64)]
    df = spark.createDataFrame(rows, ["x", "y", "payload"])

    flat = str(tmp_path / "flat")
    df.repartition(8).write.mode("overwrite").parquet(flat)
    zpath = str(tmp_path / "zorder")
    L.zorder_write(df, zpath, "x", "y", n_files=8, bits=6)

    # round-robin files cover ~the full domain in both dims; z-ordered
    # files must be local in the SUM of dimensions (individual files may
    # straddle one quadrant boundary because range bounds are sampled,
    # but they cannot be wide in x and y at once — that's the Z property)
    full_span = 63
    flat_sum = z_sum = 0.0
    for col in ("x", "y"):
        flat_avg = sum(hi - lo for lo, hi in _file_stat_spans(flat, col)) / 8
        assert flat_avg > 0.9 * full_span, (col, flat_avg)
        flat_sum += flat_avg
        z_sum += sum(hi - lo for lo, hi in _file_stat_spans(zpath, col)) / 8
    assert z_sum < 0.55 * flat_sum, (z_sum, flat_sum)

    # pruning effect: a 16x16 box touches only a fraction of the files
    lo, hi = 16, 31
    touched = sum(
        1
        for (xlo, xhi), (ylo, yhi) in zip(
            _file_stat_spans(zpath, "x"), _file_stat_spans(zpath, "y")
        )
        if not (xhi < lo or xlo > hi or yhi < lo or ylo > hi)
    )
    assert touched <= 4, touched  # vs all 8 for the unsorted layout


def _xy2d(n, x, y):
    # classic recursive-rotation reference implementation
    d, s = 0, n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x, y = s - 1 - x, s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_recursive_reference(spark):
    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.operators import layout as L

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.select(
        "x", "y", L.hilbert_code(F.col("x"), F.col("y"), bits=5).alias("h")
    ).collect()
    assert all(r.h == _xy2d(32, r.x, r.y) for r in out)
    # bijection: every grid cell gets a distinct curve position
    assert sorted(r.h for r in out) == list(range(32 * 32))


def test_hilbert_consecutive_positions_are_adjacent(spark):
    # THE Hilbert property (and why its tiles beat Morton's): walking
    # the curve moves one grid step at a time, so any contiguous code
    # range covers a connected blob -> tight per-file bounding boxes.
    # Morton violates this at every power-of-two seam.
    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.operators import layout as L

    rows = [(x, y) for x in range(32) for y in range(32)]
    df = spark.createDataFrame(rows, ["x", "y"])
    out = df.select(
        "x", "y", L.hilbert_code(F.col("x"), F.col("y"), bits=5).alias("h")
    ).collect()
    by_d = {r.h: (r.x, r.y) for r in out}
    manhattan = [
        abs(by_d[d][0] - by_d[d + 1][0]) + abs(by_d[d][1] - by_d[d + 1][1])
        for d in range(32 * 32 - 1)
    ]
    assert max(manhattan) == 1

    morton = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", L.morton_code(F.col("x"), F.col("y"), bits=5).alias("z")
        ).collect()
    }
    by_z = {z: xy for xy, z in morton.items()}
    z_steps = [
        abs(by_z[z][0] - by_z[z + 1][0]) + abs(by_z[z][1] - by_z[z + 1][1])
        for z in range(32 * 32 - 1)
    ]
    assert max(z_steps) > 1  # Morton's seam jumps — the gap Hilbert closes


def test_hilbert16_vectorized_equals_fsm_fold(spark):
    # the two 16-bit implementations — Arrow-batched branchless numpy
    # and the FSM fold the oracle replicates — must agree bit-for-bit
    import random

    import pyspark.sql.functions as F

    from kafka_stream_unify_order_messages_spark.operators import layout as L

    random.seed(11)
    pts = [
        (random.randrange(65536), random.randrange(65536))
        for _ in range(2000)
    ] + [(0, 0), (65535, 65535), (0, 65535), (65535, 0)]
    df = spark.createDataFrame(pts, ["x", "y"])
    quads = F.array(
        *[
            F.shiftright(F.col("x"), lev).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(F.col("y"), lev).bitwiseAND(F.lit(1))
            for lev in range(15, -1, -1)
        ]
    )
    dig = F.array(*[F.lit(v) for v in L.HILBERT_DIG])
    nxt = F.array(*[F.lit(v) for v in L.HILBERT_NXT])
    fold = F.aggregate(
        quads,
        F.struct(F.lit(0).alias("st"), F.lit(0).cast("long").alias("d")),
        lambda acc, q: F.struct(
            F.element_at(nxt, (acc["st"] * 4 + q + 1).cast("int")).alias(
                "st"
            ),
            (
                acc["d"] * 4
                + F.element_at(
                    dig, (acc["st"] * 4 + q + 1).cast("int")
                ).cast("long")
            ).alias("d"),
        ),
    ).getField("d")
    out = df.select(
        L.hilbert_code16(F.col("x"), F.col("y")).alias("fast"),
        fold.alias("slow"),
    ).collect()
    assert all(r.fast == r.slow for r in out)
