#!/usr/bin/env bash
# Green-tree guard: run as the LAST action before any end-of-round
# snapshot or commit of the working tree. A non-compiling tree must
# never be snapshotted (round 5 shipped 14 compile errors as HEAD and
# forfeited every gate); an unfinished feature belongs behind a
# revert/stash, not in the final tree.
#
#   tools/preflight.sh          # compile + full test suite (the bar)
#   tools/preflight.sh --fast   # compile only (~40s, the minimum)
#
# Exit 0 = safe to snapshot. Anything else: fix or revert first.
set -euo pipefail
cd "$(dirname "$0")/.."

if [[ "${1:-}" == "--fast" ]]; then
  sbt -batch "Test/compile"
else
  sbt -batch test
fi
echo "preflight: tree is green — safe to snapshot"
