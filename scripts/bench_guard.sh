#!/usr/bin/env bash
# Settled-band gate for the COMMITTED bench record (BENCH_FULL.json).
#
# Round-14 attribution proved hypervisor-level CPU steal can inflate
# identical back-to-back suite runs 183 -> 257 s (same commit, same
# box), and every bench record now carries /proc/stat steal/busy
# telemetry. This guard makes the round-14 discipline ("committed
# records only from the settled band") mechanical: a working-tree
# refresh of BENCH_FULL.json is only kept when the run's telemetry says
# the box was settled (steal_pct <= 0.15) and the total lands inside
# the demonstrated settled band; otherwise the committed record is
# restored from HEAD and the refusal is printed. A genuine perf shift
# that moves the total outside the band is landed by widening the band
# explicitly: GRAFT_BENCH_BAND="<lo> <hi>" scripts/bench_guard.sh
# (the override is printed, so the round log records it).
set -uo pipefail
cd "$(dirname "$0")/.."

BAND_LO=160
BAND_HI=195
if [ -n "${GRAFT_BENCH_BAND:-}" ]; then
  read -r BAND_LO BAND_HI <<<"$GRAFT_BENCH_BAND"
  echo "bench_guard: band OVERRIDE [$BAND_LO, $BAND_HI] (GRAFT_BENCH_BAND)"
fi

if git diff --quiet -- BENCH_FULL.json; then
  echo "bench_guard: BENCH_FULL.json unchanged — nothing to gate"
  exit 0
fi

if python3 - "$BAND_LO" "$BAND_HI" <<'EOF'
import json, sys
lo, hi = float(sys.argv[1]), float(sys.argv[2])
rec = json.load(open("BENCH_FULL.json"))
total = float(rec["value"])
env = rec.get("env") or {}
bad = []
if "steal_pct" not in env:
    bad.append("record carries no env telemetry (pre-round-15 format?)")
elif float(env["steal_pct"]) > 0.15:
    bad.append(f"steal_pct {env['steal_pct']} > 0.15 (contended box)")
if not (lo <= total <= hi):
    bad.append(f"total {total} outside the settled band [{lo}, {hi}]")
if bad:
    print("bench_guard: REFUSING refresh of BENCH_FULL.json: "
          + "; ".join(bad))
    sys.exit(1)
print(f"bench_guard: OK to refresh (total {total}, "
      f"steal {env.get('steal_pct')}, busy {env.get('busy_pct')})")
EOF
then
  exit 0
else
  git checkout -- BENCH_FULL.json
  echo "bench_guard: restored the committed BENCH_FULL.json from HEAD;" \
    "re-run the full bench on a settled box (or override the band) to refresh"
  exit 0
fi
