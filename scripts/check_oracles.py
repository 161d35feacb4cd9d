"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side-by-side over an sf dir, compare row count,
column names, and order-insensitive values.

Usage: python scripts/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")

    import __ray_entry__ as E

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            continue
        if name not in oracles:
            print(f"ok-   {name}: rows-only ({len(got)} rows, cols={list(got.columns)})")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as exc:
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            continue
        if list(got.columns) != list(exp.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            continue
        if len(got) != len(exp):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(got)} vs {len(exp)}")
            continue
        # tolerant compare for float cols; exact for everything else
        bad = None
        for c in got.columns:
            a, b = got[c], exp[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                # NULL == NULL: NaN fails any <, so compare nullness apart
                ok = ((a - b).abs() < 1e-12) | (a.isna() & b.isna())
                if not ok.all():
                    bad = c
                    break
            else:
                if not (a.astype(str) == b.astype(str)).all():
                    bad = c
                    break
        if bad:
            failures.append(name)
            d = got[~(got[bad].astype(str) == exp[bad].astype(str))]
            print(f"FAIL  {name}: column {bad!r} differs; first diffs:\n{d.head(3)}\n{exp.loc[d.index].head(3)}")
        else:
            print(f"PASS  {name}: {len(got)} rows")
    ray.shutdown()
    print("failures:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
