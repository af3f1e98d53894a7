"""Dev-side mimic of the driver's correctness gate.

Runs `queries()` entries next to their `oracle_sql()` DuckDB statements
over the same sf dir and reports rows / schema / value-hash match.
The driver sorts columns by name before hashing values; we replicate
that, then canonicalize dtypes (all ints -> int64, floats -> float64,
timestamps -> datetime64[us]) and compare full sorted value frames.

Usage:
    python tools/check_oracle.py [--sf /root/testdata/sf0.01] [query ...]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("Int64")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(6)
        elif pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(
        drop=True
    )


def value_hash(df: pd.DataFrame) -> str:
    h = hashlib.sha256()
    for c in df.columns:
        h.update(c.encode())
        h.update(df[c].astype(str).str.cat(sep="\x1f").encode())
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=16, include_dashboard=False,
            ignore_reinit_error=True,
        )
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()
    names = args.queries or [q for q in qs if q in sqls]

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf}/{t}.parquet')"
        )

    failures = []
    for name in names:
        if name not in sqls:
            print(f"{name}: no oracle (skipped)")
            continue
        t0 = time.time()
        try:
            ours = canon(to_pandas(qs[name](args.sf)))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: QUERY ERROR {type(e).__name__}: {e}")
            failures.append(name)
            continue
        theirs = canon(con.execute(sqls[name]).fetchdf())
        rows = len(ours) == len(theirs)
        schema = list(ours.dtypes.astype(str)) == list(
            theirs.dtypes.astype(str)
        ) and list(ours.columns) == list(theirs.columns)
        hmatch = rows and schema and value_hash(ours) == value_hash(theirs)
        status = "OK " if (rows and schema and hmatch) else "FAIL"
        print(
            f"{name}: {status} rows={rows}({len(ours)}/{len(theirs)}) "
            f"schema={schema} hash={hmatch} [{time.time()-t0:.1f}s]"
        )
        if not (rows and schema and hmatch):
            failures.append(name)
            if not schema:
                print(f"  ours:   {dict(ours.dtypes.astype(str))}")
                print(f"  oracle: {dict(theirs.dtypes.astype(str))}")
            elif rows and not hmatch:
                neq = (ours != theirs) & ~(ours.isna() & theirs.isna())
                bad = neq.any(axis=1)
                print(f"  {bad.sum()} differing rows; first few:")
                print(ours[bad].head(3))
                print(theirs[bad].head(3))
    print(f"\n{len(names) - len(failures)}/{len(names)} green")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
