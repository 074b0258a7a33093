"""Local proxy for the driver's correctness gate.

Runs every registry query on Spark and its oracle on DuckDB at the given
scale factor, then compares row count, sorted column names, and values
(order-insensitive, float-tolerant). With --strict it instead replicates
the driver's exact hash semantics: columns sorted by name, every cell
stringified, rows sorted, and the whole frame compared bit-for-bit (no
float tolerance) — the comparison a query must survive to be driver-green.
Usage:

    python scripts/check_oracle.py [--strict] [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_stream_unify_order_messages_spark import get_spark, registry
from kafka_stream_unify_order_messages_spark.sources.files import TABLE_NAMES


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def dtype_clash(a: pd.DataFrame, b: pd.DataFrame) -> list[str]:
    """Columns where one side is integer and the other float.

    The driver's value-hash stringifies cells, so Spark int64 vs a DuckDB
    HUGEINT (-> float64 in pandas) hashes differently even when the values
    are numerically equal (1 vs 1.0). Local float-tolerant compare hides
    that; surface it explicitly.
    """
    out = []
    for c in a.columns:
        ai = pd.api.types.is_integer_dtype(a[c])
        bi = pd.api.types.is_integer_dtype(b[c])
        af = pd.api.types.is_float_dtype(a[c])
        bf = pd.api.types.is_float_dtype(b[c])
        if (ai and bf) or (af and bi):
            out.append(c)
    return out


def stringify(df: pd.DataFrame) -> pd.DataFrame:
    """Driver-hash semantics: sorted columns, stringified cells (floats
    via repr of the rounded double, ints without decimal point), sorted
    rows. Two frames hash alike iff these stringifications are equal."""
    df = df.reindex(sorted(df.columns), axis=1)
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            col = col.astype("datetime64[us]")
        if pd.api.types.is_float_dtype(col):
            out[c] = col.round(6).map(repr)
        elif pd.api.types.is_integer_dtype(col):
            out[c] = col.astype("int64").map(str)
        else:
            out[c] = col.map(repr)
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def main() -> int:
    argv = sys.argv[1:]
    strict = "--strict" in argv
    if strict:
        argv = [a for a in argv if a != "--strict"]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    failures = []
    checked = 0
    for name, fn in registry.QUERIES.items():
        if only and name not in only:
            continue
        checked += 1
        t0 = time.time()
        try:
            spark_df = normalize(fn(spark, sf_dir).toPandas())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: spark error {type(e).__name__}: {e}")
            continue
        oracle = registry.ORACLES.get(name)
        if oracle is None:
            print(f"skip  {name}: rows-only ({len(spark_df)} rows)")
            continue
        try:
            duck_df = normalize(con.sql(oracle).df())
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: duckdb error {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if list(spark_df.columns) != list(duck_df.columns):
            failures.append(name)
            print(
                f"FAIL  {name}: columns {list(spark_df.columns)} != "
                f"{list(duck_df.columns)}"
            )
        elif len(spark_df) != len(duck_df):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(spark_df)} != {len(duck_df)}")
        elif clash := dtype_clash(spark_df, duck_df):
            failures.append(name)
            print(f"FAIL  {name}: int-vs-float dtype clash in {clash}")
        else:
            try:
                if strict:
                    a = stringify(fn(spark, sf_dir).toPandas())
                    b = stringify(con.sql(oracle).df())
                    pd.testing.assert_frame_equal(a, b)
                    print(
                        f"ok    {name}: {len(spark_df)} rows "
                        f"(strict bit-exact)  ({dt:.1f}s)"
                    )
                else:
                    pd.testing.assert_frame_equal(
                        spark_df, duck_df, check_dtype=False, rtol=0,
                        atol=2e-6,
                    )
                    print(f"ok    {name}: {len(spark_df)} rows  ({dt:.1f}s)")
            except AssertionError as e:
                failures.append(name)
                msg = str(e).splitlines()
                print(f"FAIL  {name}: values differ: {' | '.join(msg[:3])}")

    print(f"\n{checked - len(failures)}/{checked} ok")
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
