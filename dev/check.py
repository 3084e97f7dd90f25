#!/usr/bin/env python3
"""Dev-only oracle check emulating the driver's t2 compare.

Usage: python3 dev/check.py <sfDir> <verifyOutDir>

Loads every parquet result written by graft.Verify, runs the paired
oracle SQL in DuckDB over the same testdata, sorts columns by name in
both, and diffs values (floats within 1e-9). NOT part of the Scala
library — this is the local feedback loop before the driver's real
DuckDB gate runs.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            n_bad += 1
            continue
        try:
            want = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_bad += 1
            continue
        got = got[sorted(got.columns)]
        want = want[sorted(want.columns)]
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            n_bad += 1
            continue
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            n_bad += 1
            continue
        bad = None
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                af = a.to_numpy(dtype=float)
                bf = b.to_numpy(dtype=float)
                # atol-only: the driver's gate is a strict hash compare,
                # so default rtol=1e-5 drift would hide real mismatches.
                ok = (np.isclose(af, bf, rtol=0, atol=1e-9, equal_nan=True)).all()
            elif pd.api.types.is_float_dtype(a) != pd.api.types.is_float_dtype(b):
                # int-vs-float dtype mismatch IS a failure at the real gate
                # (DuckDB HUGEINT renders as float) -- never coerce it away.
                ok = False
            else:
                ok = (a.astype(str).to_numpy() == b.astype(str).to_numpy()).all()
            if not ok:
                bad = c
                break
        if bad is not None:
            mism = got[bad].astype(str).to_numpy() != want[bad].astype(str).to_numpy()
            i = int(np.argmax(mism)) if mism.any() else 0
            print(f"FAIL {name}: column {bad} differs (row {i}: "
                  f"got={got[bad].iloc[i]!r} want={want[bad].iloc[i]!r})")
            n_bad += 1
        else:
            print(f"ok   {name} ({got.shape[0]} rows)")
            n_ok += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
