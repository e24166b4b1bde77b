#!/usr/bin/env bash
# Capture .explain("formatted") for a comma-separated query list into
# per-query files: dev/capture_plans.sh <outSuffix> <q1,q2,...> [sfDir]
# Writes plans/r12/<query>_<outSuffix>.txt for each query.
set -euo pipefail
cd "$(dirname "$0")/.."
SUFFIX="${1:?suffix (before|after)}"
QUERIES="${2:?comma-separated query names}"
SF="${3:-/root/testdata/sf0.1}"
TMP=$(mktemp)
sbt -batch "runMain graft.Explain $SF $QUERIES" > "$TMP" 2>/dev/null
python3 - "$TMP" "$SUFFIX" <<'EOF'
import re, sys
txt = open(sys.argv[1]).read()
suffix = sys.argv[2]
txt = re.sub(r"^\[info\] ?", "", txt, flags=re.M)
parts = re.split(r"^===== (\S+) =====$", txt, flags=re.M)
# parts: [prefix, name1, body1, name2, body2, ...]
for name, body in zip(parts[1::2], parts[2::2]):
    path = f"plans/r12/{name}_{suffix}.txt"
    with open(path, "w") as f:
        f.write(body.strip() + "\n")
    print("wrote", path)
EOF
rm -f "$TMP"
