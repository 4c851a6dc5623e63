#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: selfcheck.py <outDir-from-graft.Verify> <sfDir>

Loads each <outDir>/<name> parquet (Spark result), runs the matching SQL from
<outDir>/oracle_sql.json in DuckDB over the raw testdata tables, and compares
after sorting columns by name and rows by all values.
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to ns-naive for comparison
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(out_dir: str, sf_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = canon(con.sql(sql).df())
            got = canon(duckdb.sql(f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df())
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        if list(exp.columns) != list(got.columns):
            print(f"FAIL {name}: columns oracle={list(exp.columns)} spark={list(got.columns)}")
            failed.append(name)
        elif len(exp) != len(got):
            print(f"FAIL {name}: rows oracle={len(exp)} spark={len(got)}")
            failed.append(name)
        else:
            try:
                pd.testing.assert_frame_equal(exp, got, check_dtype=False, check_exact=True)
                print(f"OK   {name} ({len(exp)} rows)")
            except AssertionError as e:
                print(f"FAIL {name}: {str(e).splitlines()[-1] if str(e) else e}")
                failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} oracle-checked queries pass")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
