"""Local oracle-differential checker — mimics the driver's t2 gate.

Runs every registered query on Spark and its oracle SQL on DuckDB over
the same parquet tables, then compares row count, column names, and
values (exact where possible, reporting max float deviation otherwise).

Usage:
    python tools/oracle_check.py [--sf /root/testdata/sf0.001] [names...]
"""

from __future__ import annotations

import argparse
import sys
import time
import traceback
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from weather_flink_spark.io import TABLES, table_path  # noqa: E402
from weather_flink_spark.plans.registry import all_specs  # noqa: E402
from weather_flink_spark.session import get_spark  # noqa: E402


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Canonical form: columns sorted by name, rows sorted by stringified values."""
    df = df[sorted(df.columns)].copy()
    if len(df):
        key = df.astype(str).agg("|".join, axis=1)
        df = df.iloc[np.argsort(key.values, kind="stable")].reset_index(drop=True)
    return df


def compare(name: str, sdf: pd.DataFrame, odf: pd.DataFrame) -> list[str]:
    problems: list[str] = []
    if len(sdf) != len(odf):
        problems.append(f"rowcount spark={len(sdf)} oracle={len(odf)}")
    if sorted(sdf.columns) != sorted(odf.columns):
        problems.append(f"columns spark={sorted(sdf.columns)} oracle={sorted(odf.columns)}")
        return problems
    if problems:
        return problems
    s, o = canon(sdf), canon(odf)
    for col in s.columns:
        sv, ov = s[col], o[col]
        if pd.api.types.is_float_dtype(sv) and pd.api.types.is_float_dtype(ov):
            both_nan = sv.isna() & ov.isna()
            eq = (sv == ov) | both_nan
            if not eq.all():
                diff = (sv - ov).abs()
                mx = float(diff[~both_nan].max())
                n_bad = int((~eq).sum())
                problems.append(f"col {col}: {n_bad} float mismatches, max_abs_diff={mx:.3e}")
        else:
            sv2 = sv.astype(str)
            ov2 = ov.astype(str)
            eq = (sv2 == ov2).values
            if not eq.all():
                i = int(np.argmax(~eq))
                problems.append(
                    f"col {col}: {int((~eq).sum())} mismatches "
                    f"(dtype s={sv.dtype} o={ov.dtype}); first: row {i} "
                    f"spark={sv2.iloc[i]!r} oracle={ov2.iloc[i]!r}"
                )
    return problems


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.001")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    spark = get_spark("oracle-check")
    con = duck_con(args.sf)
    specs = all_specs()
    names = args.names or sorted(specs)
    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = specs[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, args.sf).toPandas()
        except Exception:
            print(f"FAIL {name}: spark raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"ROWS {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(spec.oracle).df()
        except Exception:
            print(f"FAIL {name}: oracle raised\n{traceback.format_exc()}")
            n_fail += 1
            continue
        problems = compare(name, sdf, odf)
        if problems:
            n_fail += 1
            print(f"FAIL {name} [{time.time()-t0:.1f}s] ({len(sdf)} rows)")
            for p in problems:
                print(f"     {p}")
        else:
            n_pass += 1
            print(f"PASS {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
