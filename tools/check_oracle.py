"""Local replica of the driver's correctness gate: run every queries() entry
and its oracle_sql() side by side on an sf dir, compare row-count + schema +
order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import os
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if df[c].dtype == object:
            try:
                df[c] = df[c].astype(str)
            except Exception:
                pass
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ours: pd.DataFrame, theirs: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(ours.columns) != sorted(theirs.columns):
        problems.append(f"columns {sorted(ours.columns)} != {sorted(theirs.columns)}")
        return problems
    if len(ours) != len(theirs):
        problems.append(f"rows {len(ours)} != {len(theirs)}")
        return problems
    a, b = normalize(ours), normalize(theirs)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            ok = np.allclose(
                av.astype(float), bv.astype(float), atol=0, rtol=0, equal_nan=True
            )
        else:
            ok = (pd.Series(av).astype(str) == pd.Series(bv).astype(str)).all()
        if not ok:
            idx = None
            try:
                neq = np.nonzero(av != bv)[0]
                idx = neq[:3]
            except Exception:
                pass
            problems.append(f"col {c} mismatch (e.g. rows {idx}: {av[idx] if idx is not None else ''} vs {bv[idx] if idx is not None else ''})")
    return problems


def to_pandas(res) -> pd.DataFrame:
    import ray.data
    import pyarrow as pa

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "8")),
            include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    qs, sql = E.queries(), E.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: query raised {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if name not in sql:
            print(f"[rows-only] {name}: {len(ours)} rows ({dt:.1f}s)")
            continue
        try:
            theirs = con.sql(sql[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: oracle SQL raised {type(e).__name__}: {e}")
            failures += 1
            continue
        probs = compare(name, ours, theirs)
        if probs:
            print(f"[FAIL] {name} ({dt:.1f}s): " + "; ".join(probs))
            failures += 1
        else:
            print(f"[ok] {name}: {len(ours)} rows match ({dt:.1f}s)")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray

    ray.shutdown()
    sys.exit(rc)
