#!/usr/bin/env bash
# Self-test for bench_guard.sh in a throwaway git repo: the derived band
# must accept a legitimate +2-query refresh without an override, refuse
# a synthetic 250 s record, and gate STAGED refreshes too (round-15
# advice: `git add`ed records used to bypass the index-based diff).
set -euo pipefail
HERE="$(cd "$(dirname "$0")" && pwd)"
TMP="$(mktemp -d)"
trap 'rm -rf "$TMP"' EXIT

mkdir -p "$TMP/scripts"
cp "$HERE/bench_guard.sh" "$TMP/scripts/"
cd "$TMP"
git init -q
git config user.email t@t && git config user.name t

rec() { # total steal n_queries [sfdir] -> JSON record on stdout
  python3 - "$1" "$2" "$3" "${4:-/data/sf0.1}" <<'EOF'
import json, sys
total, steal, n = float(sys.argv[1]), float(sys.argv[2]), int(sys.argv[3])
print(json.dumps({
    "metric": "suite_seconds", "value": total, "unit": "sec",
    "queries": {f"q{i}": round(total / n, 3) for i in range(n)},
    "env": {"steal_pct": steal, "busy_pct": 1.0}, "sf": sys.argv[4]}))
EOF
}

rec 177.0 0.03 149 > BENCH_FULL.json
git add -A && git commit -qm base

fail() { echo "SELFTEST FAIL: $1"; exit 1; }

# 1. legitimate +2-query refresh inside the derived band: kept, no override
rec 183.0 0.05 151 > BENCH_FULL.json
scripts/bench_guard.sh >out.txt 2>&1 || fail "guard errored (case 1)"
grep -q "OK to refresh" out.txt || { cat out.txt; fail "+2q refresh refused"; }
python3 -c "import json; assert json.load(open('BENCH_FULL.json'))['value'] == 183.0" \
  || fail "+2q refresh not kept"

# 2. synthetic 250 s record: refused, committed record restored
rec 250.0 0.03 151 > BENCH_FULL.json
scripts/bench_guard.sh >out.txt 2>&1 || fail "guard errored (case 2)"
grep -q "REFUSING" out.txt || { cat out.txt; fail "250s record accepted"; }
python3 -c "import json; assert json.load(open('BENCH_FULL.json'))['value'] == 177.0" \
  || fail "250s record not restored from HEAD"

# 3. STAGED contended record: still gated and restored (worktree == index)
rec 182.0 0.40 149 > BENCH_FULL.json
git add BENCH_FULL.json
scripts/bench_guard.sh >out.txt 2>&1 || fail "guard errored (case 3)"
grep -q "REFUSING" out.txt || { cat out.txt; fail "staged contended record accepted"; }
python3 -c "import json; assert json.load(open('BENCH_FULL.json'))['value'] == 177.0" \
  || fail "staged record not restored from HEAD"

# 4. dropped-query refresh: base shrinks with the removed queries' time
rec 100.0 0.03 84 > BENCH_FULL.json   # dropped 65 queries (~77s of HEAD)
scripts/bench_guard.sh >out.txt 2>&1 || fail "guard errored (case 4)"
grep -q "OK to refresh" out.txt || { cat out.txt; fail "shrunk suite refused"; }

# 5. explicit override still lands an out-of-band record
rec 250.0 0.03 149 > BENCH_FULL.json
GRAFT_BENCH_BAND="240 260" scripts/bench_guard.sh >out.txt 2>&1 \
  || fail "guard errored (case 5)"
grep -q "OVERRIDE" out.txt && grep -q "OK to refresh" out.txt \
  || { cat out.txt; fail "override ignored"; }

# 6. cross-SF refresh (round 16: an sf0.001 smoke run clobbered the
# sf0.1 record): refused on basename mismatch even inside the band
rec 180.0 0.03 149 relative/sf0.001 > BENCH_FULL.json
scripts/bench_guard.sh >out.txt 2>&1 || fail "guard errored (case 6)"
grep -q "REFUSING.*sf0.001" out.txt || { cat out.txt; fail "cross-sf refresh accepted"; }
python3 -c "import json; assert json.load(open('BENCH_FULL.json'))['value'] == 177.0" \
  || fail "cross-sf record not restored from HEAD"

# 7. single-query drift: one untouched query at 2x its HEAD wall while
# the TOTAL stays inside the band (round-16 verdict What's-wrong #1):
# refused, restored
python3 - <<'EOF' > BENCH_FULL.json
import json
n = 149
q = {f"q{i}": round(177.0 / n, 3) for i in range(n)}
q["q7"] = round(2 * 177.0 / n + 1.5, 3)   # 2x + past the 1s floor
print(json.dumps({
    "metric": "suite_seconds", "value": round(sum(q.values()), 2),
    "unit": "sec", "queries": q,
    "env": {"steal_pct": 0.03, "busy_pct": 1.0}, "sf": "/data/sf0.1"}))
EOF
scripts/bench_guard.sh >out.txt 2>&1 || fail "guard errored (case 7)"
grep -q "REFUSING.*per-query drift.*q7" out.txt \
  || { cat out.txt; fail "single-query 2x drift accepted"; }
python3 -c "import json; assert json.load(open('BENCH_FULL.json'))['value'] == 177.0" \
  || fail "drifted record not restored from HEAD"

# 8. the same record with the drifted query declared touched: accepted
python3 - <<'EOF' > BENCH_FULL.json
import json
n = 149
q = {f"q{i}": round(177.0 / n, 3) for i in range(n)}
q["q7"] = round(2 * 177.0 / n + 1.5, 3)
print(json.dumps({
    "metric": "suite_seconds", "value": round(sum(q.values()), 2),
    "unit": "sec", "queries": q,
    "env": {"steal_pct": 0.03, "busy_pct": 1.0}, "sf": "/data/sf0.1"}))
EOF
GRAFT_BENCH_TOUCHED="q7" scripts/bench_guard.sh >out.txt 2>&1 \
  || fail "guard errored (case 8)"
grep -q "OK to refresh" out.txt \
  || { cat out.txt; fail "declared-touched drift refused"; }

# 9. a band override must NOT waive the cross-SF check (round-16 advice:
# it used to sit inside `if not override`)
rec 180.0 0.03 149 relative/sf0.001 > BENCH_FULL.json
GRAFT_BENCH_BAND="160 200" scripts/bench_guard.sh >out.txt 2>&1 \
  || fail "guard errored (case 9)"
grep -q "REFUSING.*sf0.001" out.txt \
  || { cat out.txt; fail "band override waived the cross-sf check"; }
python3 -c "import json; assert json.load(open('BENCH_FULL.json'))['value'] == 177.0" \
  || fail "cross-sf override record not restored from HEAD"

echo "bench_guard selftest: all 9 cases pass"
