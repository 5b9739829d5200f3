"""Local replica of the driver's t2 correctness gate.

Runs every registered query on Spark and its DuckDB oracle twin on the
same parquet tables, then compares row-count + schema + order-insensitive
values (exact, via Arrow → pandas). Strict exact equality on doubles is
intentional: the engine's aggregates use exact decimal accumulation
(``functions/exact.py``) precisely so that bit-exact parity holds.

Usage:
    python tools/oracle_check.py [--sf-dir /root/testdata/sf0.01] [name ...]
"""

from __future__ import annotations

import argparse
import math
import os
import sys
import time

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from dmi_ingestor_spark.catalog import TABLES  # noqa: E402
from dmi_ingestor_spark.registry import load_all  # noqa: E402
from dmi_ingestor_spark.session import get_spark  # noqa: E402


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(df):
    """Sort columns by name, then rows by all values (driver-style)."""
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def values_equal(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return (math.isnan(a) and math.isnan(b)) or a == b
    try:
        if a != a and b != b:  # NaT/NaN-likes
            return True
    except Exception:
        pass
    return bool(a == b)


def compare(name: str, spark_df, duck_df) -> list[str]:
    problems: list[str] = []
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duckdb={len(duck_df)}")
    s_cols, d_cols = list(spark_df.columns), list(duck_df.columns)
    if s_cols != d_cols:
        problems.append(f"columns: spark={s_cols} duckdb={d_cols}")
    if problems:
        return problems
    for col in s_cols:
        sv, dv = spark_df[col].tolist(), duck_df[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(sv, dv)) if not values_equal(x, y)
        ]
        if bad:
            i, x, y = bad[0]
            problems.append(
                f"col {col!r}: {len(bad)}/{len(sv)} mismatches; "
                f"first at row {i}: spark={x!r} duckdb={y!r} "
                f"(types {type(x).__name__}/{type(y).__name__})"
            )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    ap.add_argument("names", nargs="*")
    ap.add_argument(
        "--vanilla",
        action="store_true",
        help="use a bare SparkSession (driver fidelity: no session.py configs)",
    )
    args = ap.parse_args()

    registry = load_all()
    names = args.names or list(registry)
    if args.vanilla:
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master("local[8]").getOrCreate()
    else:
        spark = get_spark("oracle-check")
    con = duck_connection(args.sf_dir)

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = registry[name]
        t0 = time.time()
        try:
            sdf = spec.builder(spark, args.sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if spec.oracle is None:
            status = "ROWS-ONLY" if len(sdf) >= 0 else "EMPTY"
            print(f"{status:9s} {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            n_rows_only += 1
            continue
        try:
            ddf = con.execute(spec.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        problems = compare(name, normalize(sdf), normalize(ddf))
        if problems:
            n_fail += 1
            print(f"FAIL {name} ({time.time()-t0:.1f}s):")
            for p in problems:
                print(f"   - {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only of {len(names)}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
