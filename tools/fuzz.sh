#!/usr/bin/env bash
# Differential fuzz run: generate N seeded composition cases with
# graft.tools.Fuzz, replay every one in DuckDB via check_oracle.py, and
# record FUZZ_RESULT.json at the repo root.
#
# Usage: tools/fuzz.sh [sfDir] [outDir] [nCases] [seed]
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=${2:-/tmp/graft_fuzz}
N=${3:-200}
SEED=${4:-20260814}

sbt -batch "runMain graft.tools.Fuzz $SF $OUT $N $SEED"
python3 tools/check_oracle.py "$SF" "$OUT" | tee "$OUT/check.txt"

python3 - "$SF" "$OUT" "$N" "$SEED" <<'EOF'
import json, re, sys
sf, out, n, seed = sys.argv[1], sys.argv[2], int(sys.argv[3]), int(sys.argv[4])
txt = open(f"{out}/check.txt").read()
ok = len(re.findall(r"^OK ", txt, re.M))
bad = [l for l in txt.splitlines() if l.startswith(("FAIL", "ERR"))]
result = {"cases": n, "ok": ok, "mismatches": len(bad), "seed": seed,
          "sf_dir": sf, "failing": bad[:20]}
json.dump(result, open("FUZZ_RESULT.json", "w"), indent=1)
print("[fuzz] FUZZ_RESULT.json:", json.dumps(result)[:200])
sys.exit(1 if bad else 0)
EOF
