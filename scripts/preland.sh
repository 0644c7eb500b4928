#!/usr/bin/env bash
# Mechanical enforcement of the README "Pre-land checklist": chains the
# three gates that must be green before a round's snapshot commit. Exits
# non-zero the moment any gate fails — round 10 wrote the checklist into
# README and then landed commits with BenchLineSuite red; this script is
# the reason that cannot silently happen again.
#
# Usage: scripts/preland.sh [--skip-scaling]
#   --skip-scaling drops the (slow) 10x/100x corpus sweep — acceptable
#   only for rounds that touched no shuffle/window/collect path; the
#   skip is printed so the round log records it.
set -uo pipefail
cd "$(dirname "$0")/.."

SKIP_SCALING=0
[ "${1:-}" = "--skip-scaling" ] && SKIP_SCALING=1

rc=0
echo "== preland 1/3: verify_sweep (every oracle gate at sf0.001/0.01/0.1)"
if ! scripts/verify_sweep.sh; then
  echo "preland: FAIL verify_sweep"; rc=1
fi

if [ "$SKIP_SCALING" = 1 ]; then
  echo "== preland 2/3: scaling_sweep SKIPPED (--skip-scaling; record why in PROGRESS)"
else
  echo "== preland 2/3: scaling_sweep (scale-sensitive queries at sf0.1/10x/100x)"
  if ! scripts/scaling_sweep.sh; then
    echo "preland: FAIL scaling_sweep"; rc=1
  fi
fi

echo "== preland: bench settled-band gate (BENCH_FULL.json refresh)"
scripts/bench_guard.sh

echo "== preland 3/3: sbt test (full suite)"
if ! sbt -batch test >/tmp/preland_sbt_test.log 2>&1; then
  echo "preland: FAIL sbt test (tail of /tmp/preland_sbt_test.log follows)"
  tail -20 /tmp/preland_sbt_test.log
  rc=1
else
  grep -E "Tests: succeeded" /tmp/preland_sbt_test.log | tail -1
fi

if [ "$rc" = 0 ]; then
  echo "preland: ALL GREEN"
else
  echo "preland: RED — do not land"
fi
exit $rc
