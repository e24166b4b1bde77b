#!/usr/bin/env python3
"""Time each oracle SQL in DuckDB over the same parquet tables the
Spark bench reads — the BASELINE.md comparison's denominator.

Usage: python3 dev/duck_bench.py <sfDir> <verifyOutDir> [reps]
  <verifyOutDir> must contain oracle_sql.json (graft.Verify output).
Prints one JSON line: {"total": s, "queries": {name: s, ...}}.
"""
import json
import sys
import time

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    con = duckdb.connect()
    con.execute(f"SET threads TO 32")
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    times = {}
    for name in sorted(oracles):
        best = None
        for _ in range(reps):
            t0 = time.monotonic()
            con.execute(oracles[name]).fetchall()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        times[name] = round(best, 3)
    print(json.dumps({"total": round(sum(times.values()), 3),
                      "queries": times}))


if __name__ == "__main__":
    main()
