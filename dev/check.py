#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and diff. Dev tooling only — the
shipped library has no Python dependency.

Usage: python3 dev/check.py <sfDir> <outDir>
(after: sbt "runMain graft.Verify <sfDir> <outDir>")
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_ok = n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output"); n_bad += 1; continue
        got = normalize(pd.concat([pd.read_parquet(f) for f in files]))
        try:
            exp = normalize(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_bad += 1; continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                          check_exact=True)
            print(f"ok   {name} ({len(got)} rows)"); n_ok += 1
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}")
            print("  got:", got.head(3).to_dict("records"))
            print("  exp:", exp.head(3).to_dict("records"))
            n_bad += 1
    # rows-only queries (no oracle): check the dump exists and has rows
    for d in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(d)
        if name in oracle or not os.path.isdir(d):
            continue
        files = glob.glob(os.path.join(d, "*.parquet"))
        n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
        status = "ok  " if n > 0 else "WARN"
        print(f"{status} {name} (rows-only, {n} rows)")
    print(f"\n{n_ok} ok, {n_bad} failed")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
