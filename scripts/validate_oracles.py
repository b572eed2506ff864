"""Mimic the driver's correctness gate locally: run each queries()[name] on an
sf dir and compare with DuckDB running oracle_sql()[name] on the same parquet
tables (row count + column names + order-insensitive values).

Usage: python scripts/validate_oracles.py [sf_dir] [name ...]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(sorted(df.columns), kind="stable").reset_index(drop=True)


def compare(name: str, mine: pd.DataFrame, oracle: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(mine.columns) != sorted(oracle.columns):
        problems.append(f"columns {sorted(mine.columns)} != {sorted(oracle.columns)}")
        return problems
    if len(mine) != len(oracle):
        problems.append(f"rows {len(mine)} != {len(oracle)}")
    a, b = canon(mine), canon(oracle)
    if len(a) == len(b):
        for c in a.columns:
            if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(
                b[c].dtype, np.floating
            ):
                ok = np.allclose(
                    a[c].astype(float), b[c].astype(float), rtol=0, atol=5e-7
                )
            else:
                ok = (a[c].to_numpy() == b[c].to_numpy()).all()
            if not ok:
                bad = np.flatnonzero(
                    ~(a[c].astype(str).to_numpy() == b[c].astype(str).to_numpy())
                )[:3]
                problems.append(
                    f"col {c} differs, e.g. rows {bad.tolist()}: "
                    f"mine={a[c].iloc[bad].tolist()} oracle={b[c].iloc[bad].tolist()}"
                )
    return problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR"
        )

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    n_ok = n_bad = n_rowsonly = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: engine raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(mine)} rows")
            n_rowsonly += 1
            continue
        try:
            oracle = con.sql(sqls[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL raised {type(e).__name__}: {e}")
            n_bad += 1
            continue
        problems = compare(name, mine, oracle)
        if problems:
            print(f"[FAIL] {name}: " + "; ".join(problems))
            n_bad += 1
        else:
            print(f"[ok] {name}: {len(mine)} rows")
            n_ok += 1
    print(f"\n{n_ok} ok, {n_bad} fail, {n_rowsonly} rows-only")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
