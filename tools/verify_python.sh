#!/usr/bin/env bash
# PySpark-wrapper gate: package the library jar, then run the committed
# pytest e2e suite against it. Exits nonzero on any wrapper breakage
# (param rename, FQN change, py4j signature drift), so a driver can wire
# this next to `sbt test` + `graft.Verify`.
#
# Usage: tools/verify_python.sh   (from the repo root or anywhere)
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch package
exec python3 -m pytest src/main/python/test -q
