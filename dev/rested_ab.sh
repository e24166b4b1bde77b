#!/usr/bin/env bash
# Rested A/B protocol (NEXT.md thermal rules): idle-cool the box, then
# run the full Bench suite at two driver heaps plus a contemporaneous
# DuckDB pass, writing raw artifacts to dev/bench_artifacts/.
#
# Usage: dev/rested_ab.sh <tag> <oracleDir>   (oracleDir must hold
#        oracle_sql.json from a Verify run)
set -euo pipefail
cd "$(dirname "$0")/.."
TAG="${1:?tag}"
ORACLE="${2:?oracle dir with oracle_sql.json}"
SF="${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1}"
REST="${REST_SECONDS:-240}"
OUT=dev/bench_artifacts

for mem in 32g 16g; do
  echo "[ab] resting ${REST}s before ${mem} run"
  sleep "$REST"
  SPARK_DRIVER_MEM=$mem SPARK_GRAFT_SF_DIR=$SF SPARK_GRAFT_REPS=2 \
    SPARK_GRAFT_BENCH_OUT=$OUT/${TAG}_spark_${mem}.json \
    sbt -batch "runMain graft.Bench" > /tmp/${TAG}_${mem}.log 2>&1
  python3 - <<EOF
import json
d = json.load(open("$OUT/${TAG}_spark_${mem}.json"))
print(f"[ab] ${mem}: total {d['value']} s over {len(d['queries'])} queries")
EOF
done

echo "[ab] resting ${REST}s before DuckDB run"
sleep "$REST"
python3 dev/duck_bench.py "$SF" "$ORACLE" 2 > $OUT/${TAG}_duck_reps2.json
python3 - <<EOF
import json
d = json.load(open("$OUT/${TAG}_duck_reps2.json"))
print(f"[ab] duck: total {d['total']} s over {len(d['queries'])} queries")
EOF
echo "[ab] done — artifacts under $OUT/${TAG}_*"
