#!/usr/bin/env python3
"""Local emulation of the driver's correctness gate.

Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name> parquet written by graft.Verify, runs the matching
oracle SQL from oracle_sql.json in DuckDB (tables = views over the sf
dir), sorts columns by name, and compares values exactly.
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        # driver data ships one file per table; ScaleGen corpora (sf1)
        # are Spark-written DIRECTORIES of part files
        p = Path(sf_dir) / f"{t}.parquet"
        src = f"{p}/*.parquet" if p.is_dir() else str(p)
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name in sorted(oracle):
        res_path = Path(out_dir) / name
        if not res_path.exists():
            print(f"FAIL {name}: no result parquet")
            n_fail += 1
            continue
        got = norm(con.sql(f"SELECT * FROM '{res_path}/*.parquet'").df())
        want = norm(con.sql(oracle[name]).df())
        if got.shape != want.shape:
            print(f"FAIL {name}: shape {got.shape} != {want.shape}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            continue
        diffs = []
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                import numpy as np
                if a.dtype.kind == "f" and b.dtype.kind == "f":
                    # Bit-level compare, like the driver's value hash:
                    # catches -0.0 vs 0.0 and NaN-payload drift that == hides.
                    av = a.to_numpy().astype(np.float64).view(np.uint64)
                    bv = b.to_numpy().astype(np.float64).view(np.uint64)
                    eq = pd.Series(av == bv)
                else:
                    eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                bad = (~eq).idxmax()
                diffs.append(f"{c}[row {bad}]: {a[bad]!r} != {b[bad]!r} "
                             f"(dtype {a.dtype}/{b.dtype}, {int((~eq).sum())} rows differ)")
        if diffs:
            print(f"FAIL {name}: " + "; ".join(diffs[:3]))
            n_fail += 1
        else:
            n_pass += 1
            print(f"ok   {name} ({got.shape[0]} rows)")
    print(f"\n{n_pass} pass / {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
