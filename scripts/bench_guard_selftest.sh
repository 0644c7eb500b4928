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

echo "bench_guard selftest: all 6 cases pass"
