"""Driver-mimicking correctness harness: run every queries() entry and its
oracle_sql() side-by-side, compare row-count + schema + order-insensitive
values.  Usage: python tools/check_oracles.py [sf_dir] [--only q1,q2,...]"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, only: set[str] | None = None):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown --only query names: {sorted(unknown)}")
            sys.exit(2)
    fails = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            res = fn(sf_dir)
            if hasattr(res, "to_pandas"):
                got = res.to_pandas()
            else:
                got = pd.DataFrame(res)
            if name not in oracles:
                print(f"[rows-only] {name}: {len(got)} rows, cols={sorted(got.columns)}")
                continue
            exp = con.sql(oracles[name]).fetchdf()
            g, e = canon(got), canon(exp)
            status = []
            if len(g) != len(e):
                status.append(f"ROWS {len(g)} vs {len(e)}")
            if list(g.columns) != list(e.columns):
                status.append(f"SCHEMA {list(g.columns)} vs {list(e.columns)}")
            if not status:
                if not g.equals(e):
                    # locate differing columns
                    bad = [
                        c
                        for c in g.columns
                        if not (
                            (g[c].isna() & e[c].isna())
                            | (g[c] == e[c])
                        ).all()
                    ]
                    # distinguish float-eps from real mismatch
                    detail = []
                    for c in bad:
                        if pd.api.types.is_float_dtype(g[c]):
                            mx = np.nanmax(np.abs(g[c] - e[c]))
                            detail.append(f"{c} (max|d|={mx:.3e})")
                        else:
                            detail.append(c)
                    status.append("VALUES " + ", ".join(detail))
            if status:
                fails.append(name)
                print(f"[FAIL] {name}: {'; '.join(status)}")
            else:
                print(f"[ok]   {name}: {len(g)} rows")
        except Exception as ex:
            fails.append(name)
            print(f"[ERR]  {name}: {type(ex).__name__}: {ex}")
    print()
    if fails:
        print("FAILURES:", fails)
        sys.exit(1)
    print("all queries match their oracles")


if __name__ == "__main__":
    args = sys.argv[1:]
    only = None
    if "--only" in args:
        i = args.index("--only")
        only = set(args[i + 1].split(","))
        args = args[:i] + args[i + 2:]
    main(args[0] if args else "/root/testdata/sf0.01", only=only)
