#!/usr/bin/env bash
# Full local gate: tests + correctness dump + DuckDB oracle replay.
# Usage: scripts/ci.sh [sfDir]          (default /root/testdata/sf0.01)
#        scripts/ci.sh --bench [sfDir]  run graft.Bench instead and emit the
#                                       bench JSON as the FINAL stdout line
#                                       (sbt's [success] footer otherwise
#                                       follows the in-run print, which
#                                       breaks naive last-line parsers)
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--bench" ]]; then
  SF=${2:-/root/testdata/sf0.1}
  SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-32} \
    sbt -batch "runMain graft.Bench"
  cat target/bench.json
  exit 0
fi

SF=${1:-/root/testdata/sf0.01}
OUT=target/ci_verify

sbt -batch test

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $PWD/$OUT"

python3 scripts/check_oracle.py "$SF" "$PWD/$OUT"
echo "CI gate green at $SF"
