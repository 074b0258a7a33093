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
