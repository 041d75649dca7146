#!/usr/bin/env python3
"""Dev-only parity checker (mimics the driver's DuckDB oracle compare).

Not part of the shipped Scala library. Usage:
    python3 tools/check_parity.py /tmp/verify_out /root/testdata/sf0.01
"""
import json
import os
import sys

import duckdb
import pandas as pd

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.reset_index(drop=True)

def main(out_dir: str, sf_dir: str, only=None) -> int:
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    if only is not None:
        for name in sorted(only - set(oracles)):
            print(f"FAIL {name}: unknown query name in filter")
            failures += 1
    for name, sql in sorted(oracles.items()):
        if only is not None and name not in only:
            continue
        if not os.path.isdir(f"{out_dir}/{name}"):
            # a full run with a missing dump means the query CRASHED in
            # Verify -- that is a failure, not a skip
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            got = canon(con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
            want = canon(con.sql(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns {list(got.columns)} != {list(want.columns)}")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}")
            failures += 1
            continue
        eq = got.equals(want)
        if not eq:
            diff = (got != want) & ~(got.isna() & want.isna())
            ncell = int(diff.sum().sum())
            print(f"FAIL {name}: {ncell} differing cells")
            for c in diff.columns[diff.any()]:
                i = diff[c].idxmax()
                print(f"   col {c} row {i}: spark={got[c][i]!r} oracle={want[c][i]!r}")
            failures += 1
        else:
            print(f"ok   {name} ({len(got)} rows)")
    return failures

if __name__ == "__main__":
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], only))
