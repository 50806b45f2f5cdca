"""Local replica of the driver's correctness gate: run each query's Ray
pipeline AND its DuckDB oracle over the same sf directory and compare
row count, schema (sorted column names), and order-insensitive values.

Usage:  python tools/check_oracle.py [sf_dir] [query ...]
        (no query args = every oracled query)
"""
from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data
    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    if sorted(a.columns) != sorted(b.columns):
        return f"schema: {sorted(a.columns)} vs {sorted(b.columns)}"
    if len(a) != len(b):
        return f"rows: {len(a)} vs {len(b)}"
    a, b = _canon(a), _canon(b)
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or \
                np.issubdtype(np.asarray(bv).dtype, np.floating):
            if not np.allclose(av.astype(float), bv.astype(float),
                               rtol=1e-9, atol=1e-12, equal_nan=True):
                return f"values differ in float col {c}"
        else:
            # NA-aware equality: NaT/None must match NaT/None (plain
            # == is False for NaT pairs, a checker artifact, not a
            # query mismatch — both engines emit the same missing rows)
            eq = (av == bv) | (pd.isna(a[c]).to_numpy()
                               & pd.isna(b[c]).to_numpy())
            if not eq.all():
                i = int(np.argmax(~eq))
                return f"values differ in col {c} @row {i}: " \
                       f"{av[i]!r} vs {bv[i]!r}"
    return None


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, "/root/repo")
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(
            os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False)
    import __ray_entry__ as e
    qs, osql = e.queries(), e.oracle_sql()
    names = sys.argv[2:] or [k for k in qs if k in osql]
    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf}/{t}.parquet')")
    bad = 0
    for name in names:
        t0 = time.time()
        try:
            mine = _to_pandas(qs[name](sf))
            oracle = con.execute(osql[name]).df()
            err = compare(mine, oracle)
        except Exception as ex:  # noqa: BLE001
            err = f"EXC {type(ex).__name__}: {ex}"
        dt = time.time() - t0
        if err:
            bad += 1
            print(f"FAIL {name} ({dt:.1f}s): {err}")
        else:
            print(f"ok   {name} ({dt:.1f}s)")
    print(f"{len(names) - bad}/{len(names)} green")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
