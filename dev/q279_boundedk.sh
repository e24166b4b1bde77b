#!/usr/bin/env bash
# Bounded-K exact differential for q279_louvain_gains (VERDICT r9 §5).
#
# q279's Louvain gain carries a 1/m term (m = total edge weight), so the
# gen_scale replication law CANNOT derive its scaled answer from the
# base oracle (unlike q123/q181) — and DuckDB's all-pairs enumeration
# dies on temp disk at sf1.0. This script closes the gap at bounded K:
# generate K=2,3 replicas of sf0.1 (where DuckDB survives), run the
# FULL DuckDB oracle and the Spark query at each K, and assert exact
# equality — demonstrating the Spark gain formula tracks the oracle AS
# m GROWS, which is precisely the term the law can't cover. K=1 is the
# base sf0.1 gate (always green) and anchors the trend.
#
# Usage: dev/q279_boundedk.sh       (artifacts →
#        dev/bench_artifacts/r10_q279_boundedK.json)
set -euo pipefail
cd "$(dirname "$0")/.."
BASE="${BASE:-/root/testdata/sf0.1}"
WORK="${WORK:-/tmp/q279_boundedK}"
OUT=dev/bench_artifacts/r10_q279_boundedK.json
Q=q279_louvain_gains
mkdir -p "$WORK"

declare -A DIR
DIR[1]="$BASE"
for k in 2 3; do
  if [ ! -f "$WORK/sfx$k/lineitem.parquet" ]; then
    echo "[q279] generating ${k}x replica set"
    python3 dev/gen_scale.py "$BASE" "$WORK/sfx$k" "$k"
  fi
  DIR[$k]="$WORK/sfx$k"
done

for k in 1 2 3; do
  echo "[q279] Verify at K=$k (${DIR[$k]})"
  sbt -batch "runMain graft.Verify ${DIR[$k]} $WORK/v$k $Q" \
    > "$WORK/verify_$k.log" 2>&1 || { tail -5 "$WORK/verify_$k.log"; exit 1; }
done

python3 - "$OUT" <<EOF
import glob, json, sys, time
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
DIRS = {1: "${DIR[1]}", 2: "${DIR[2]}", 3: "${DIR[3]}"}
Q = "$Q"
art = {"query": Q, "base": "${DIR[1]}", "Ks": {}}
ok = True
for k, d in DIRS.items():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{d}/{t}.parquet')")
    sql = json.load(open(f"$WORK/v{k}/oracle_sql.json"))[Q]
    t0 = time.monotonic()
    exp = con.sql(sql).df()
    dt = round(time.monotonic() - t0, 1)
    got = pd.concat([pd.read_parquet(f)
                     for f in glob.glob(f"$WORK/v{k}/{Q}/*.parquet")])
    norm = lambda df: df.reindex(sorted(df.columns), axis=1) \
        .sort_values(by=sorted(df.columns), ignore_index=True)
    exp, got = norm(exp), norm(got)
    try:
        pd.testing.assert_frame_equal(got, exp, check_dtype=True,
                                      check_exact=True)
        match = True
    except AssertionError as e:
        match = False
        ok = False
        print(f"FAIL K={k}: {str(e)[:300]}")
    art["Ks"][k] = {"rows": len(got), "match": match,
                    "duck_oracle_sec": dt,
                    "head": got.head(3).to_dict("records")}
    print(f"{'ok  ' if match else 'FAIL'} K={k}: {len(got)} rows, "
          f"oracle {dt}s")
with open(sys.argv[1], "w") as f:
    json.dump(art, f, indent=1, default=str)
print(f"[q279] artifact -> {sys.argv[1]}")
sys.exit(0 if ok else 1)
EOF
