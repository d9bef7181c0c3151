#!/usr/bin/env bash
# Full local gate: tests + correctness dump + DuckDB oracle replay.
# Usage: scripts/ci.sh [sfDir]   (default /root/testdata/sf0.01)
set -euo pipefail
cd "$(dirname "$0")/.."
SF=${1:-/root/testdata/sf0.01}
OUT=target/ci_verify

sbt -batch test

SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} \
  sbt -batch "runMain graft.Verify $SF $PWD/$OUT"

python3 scripts/check_oracle.py "$SF" "$PWD/$OUT"
echo "CI gate green at $SF"
