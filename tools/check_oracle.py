#!/usr/bin/env python3
"""Local pre-flight for the driver's correctness gate: compare each
Verify output parquet against its DuckDB oracle on the same sf dir.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob
import os

import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents", "embeddings"]:
        p = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for q, sql in sorted(oracle.items()):
        spark_dir = os.path.join(out_dir, q)
        files = glob.glob(os.path.join(spark_dir, "*.parquet"))
        if not files:
            print(f"FAIL {q}: no spark output")
            n_fail += 1
            continue
        try:
            got = norm(pd.read_parquet(spark_dir))
            want = norm(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {q}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {q}: columns {list(got.columns)} vs {list(want.columns)}")
            n_fail += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {q}: rows {len(got)} vs {len(want)}")
            n_fail += 1
            continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            try:
                same = a.equals(b) or (a.astype(object) == b.astype(object)).all()
            except Exception:
                same = False
            if not same:
                # surface first differing row
                for i in range(len(a)):
                    av, bv = a.iloc[i], b.iloc[i]
                    if av != bv and not (pd.isna(av) and pd.isna(bv)):
                        mismatch = (c, i, av, bv)
                        break
                if mismatch is None:
                    continue
                break
        if mismatch:
            c, i, av, bv = mismatch
            print(f"FAIL {q}: col {c} row {i}: spark={av!r} oracle={bv!r} "
                  f"(dtypes {got[c].dtype}/{want[c].dtype})")
            n_fail += 1
        else:
            # dtype check (schema-match analog)
            dt = [(c, str(got[c].dtype), str(want[c].dtype)) for c in got.columns
                  if str(got[c].dtype) != str(want[c].dtype)]
            tag = f" [dtype diff: {dt}]" if dt else ""
            print(f"PASS {q} ({len(got)} rows){tag}")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
