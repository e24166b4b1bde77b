#!/usr/bin/env bash
# One-command scale sweep (round-8 institutionalization of the round-7
# process that caught 8 scale-only defects): build sf0.3 by tripling
# sf0.1 with referential key offsets, run the full Verify surface on
# it, and gate it against the DuckDB oracle over the SAME scaled
# parquet. Exact-×3-tie stressor included for free (gen_scale clones
# rows, so every top-k has triplicate ties).
#
# Usage:   dev/scale_sweep.sh [K] [srcSf]
# Default: K=3 over /root/testdata/sf0.1 -> /tmp/sf0.3-sweep
# Exit 0 iff every query hash-matches at the scaled factor.
set -euo pipefail
cd "$(dirname "$0")/.."

K="${1:-3}"
SRC="${2:-/root/testdata/sf0.1}"
DST="/tmp/sf$(python3 -c "print(round(0.1 * $K, 2))")-sweep"
OUT="$DST.verify"

echo "[sweep] scaling $SRC x$K -> $DST"
rm -rf "$DST" "$OUT"
python3 dev/gen_scale.py "$SRC" "$DST" "$K"

echo "[sweep] running Verify surface at $DST (this is the slow part)"
sbt -batch "runMain graft.Verify $DST $OUT" 2>&1 \
  | grep -E "\[verify\]" || true   # surfaced throws, if any

echo "[sweep] DuckDB oracle gate over the scaled parquet"
LOG="$OUT.check.log"
python3 dev/check.py "$DST" "$OUT" | tee "$LOG" | tail -20

# fail loudly unless the last line reads "N ok, 0 failed"
tail -1 "$LOG" | grep -q " 0 failed" \
  && echo "[sweep] PASS" \
  || { echo "[sweep] FAIL — scale-only defects above (full log: $LOG)"; exit 1; }
