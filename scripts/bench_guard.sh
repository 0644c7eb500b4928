#!/usr/bin/env bash
# Settled-band gate for the COMMITTED bench record (BENCH_FULL.json).
#
# Round-14 attribution proved hypervisor-level CPU steal can inflate
# identical back-to-back suite runs 183 -> 257 s (same commit, same
# box), and every bench record now carries /proc/stat steal/busy
# telemetry. This guard makes the round-14 discipline ("committed
# records only from the settled band") mechanical: a working-tree OR
# staged refresh of BENCH_FULL.json is only kept when the run's
# telemetry says the box was settled (steal_pct <= 0.15) and the total
# lands inside the settled band; otherwise the committed record is
# restored from HEAD and the refusal is printed.
#
# The band is DERIVED from HEAD's committed record (round-15 advice —
# a hardcoded band drifts stale as the suite grows):
#   base = HEAD total - HEAD seconds of queries the candidate dropped
#   band = [0.9 * base, 1.1 * base + 3.0 * (queries added)]
# so a legitimate +N-query refresh fits without an override while a
# contended 1.5x run still refuses. Two further checks run REGARDLESS
# of any band override: the cross-SF clobber check (candidate and HEAD
# records must come from the same sf dir) and the per-query drift check
# (no query present in both records may exceed 1.5x its HEAD wall —
# exempt intentionally-changed queries by name via
# GRAFT_BENCH_TOUCHED="qa qb"). A genuine perf shift outside the band
# is landed by widening the band explicitly:
# GRAFT_BENCH_BAND="<lo> <hi>" scripts/bench_guard.sh (the override is
# printed, so the round log records it). If HEAD carries no readable
# record (fresh repo), the demonstrated static band [160, 195] applies.
set -uo pipefail
cd "$(dirname "$0")/.."

# staged refreshes are gated too: diff against HEAD, not the index
# (round-15 advice — `git add`ed records used to bypass the gate)
if git diff --quiet HEAD -- BENCH_FULL.json; then
  echo "bench_guard: BENCH_FULL.json unchanged vs HEAD — nothing to gate"
  exit 0
fi

HEAD_REC="$(git show HEAD:BENCH_FULL.json 2>/dev/null || true)"

if HEAD_REC="$HEAD_REC" python3 - <<'EOF'
import json, os, sys
rec = json.load(open("BENCH_FULL.json"))
total = float(rec["value"])
cand_q = rec.get("queries") or {}

# parse the committed record ONCE; both the band derivation and the
# cross-SF check read it, and a parse failure must be LOUD (a silent
# skip would disable exactly the defenses this script exists for)
try:
    head = json.loads(os.environ["HEAD_REC"])
except Exception as e:
    head = None
    print(f"bench_guard: no parseable HEAD record ({e.__class__.__name__})")

override = os.environ.get("GRAFT_BENCH_BAND", "")
if override:
    lo, hi = (float(x) for x in override.split())
    print(f"bench_guard: band OVERRIDE [{lo}, {hi}] (GRAFT_BENCH_BAND)")
else:
    try:
        if head is None:
            raise ValueError("no HEAD record")
        head_total = float(head["value"])
        head_q = head.get("queries") or {}
        removed = sum(float(v) for k, v in head_q.items() if k not in cand_q)
        added = sum(1 for k in cand_q if k not in head_q)
        base = head_total - removed
        lo, hi = 0.9 * base, 1.1 * base + 3.0 * added
        print(f"bench_guard: band [{lo:.1f}, {hi:.1f}] from HEAD record "
              f"(total {head_total}, -{removed:.1f}s removed, "
              f"+{added} queries)")
    except Exception as e:
        lo, hi = 160.0, 195.0
        print(f"bench_guard: no readable HEAD record ({e.__class__.__name__})"
              f" — static band [{lo}, {hi}]")

env = rec.get("env") or {}
bad = []
if "steal_pct" not in env:
    bad.append("record carries no env telemetry (pre-round-15 format?)")
elif float(env["steal_pct"]) > 0.15:
    bad.append(f"steal_pct {env['steal_pct']} > 0.15 (contended box)")
# cross-SF refresh guard (round 16: an sf0.001 smoke run clobbered the
# sf0.1 record) — compare basenames so absolute vs relative paths agree.
# A record without an sf field is noted, never silently waved through.
# Runs UNCONDITIONALLY (round-16 advice: it used to sit inside the band
# override, so widening the band also waived the clobber protection)
if head is None or "sf" not in head:
    print("bench_guard: note — committed record carries no sf field; "
          "cross-SF check unavailable")
else:
    head_sf = os.path.basename(str(head["sf"]).rstrip("/"))
    cand_sf = os.path.basename(str(rec.get("sf", "")).rstrip("/"))
    if head_sf and cand_sf and head_sf != cand_sf:
        bad.append(f"candidate sf '{cand_sf}' != committed sf '{head_sf}'")
# per-query drift guard (round-16 verdict: a refresh whose TOTAL sat
# inside the band carried four untouched queries at 1.7-2.1x their
# committed walls — box noise the aggregate band can't see). Queries
# present in BOTH records must stay under 1.5x their HEAD wall (with a
# 1 s absolute floor so sub-second jitter never flags); queries the
# round's code intentionally changed are exempted BY NAME via
# GRAFT_BENCH_TOUCHED="qa qb" so the exemption is recorded in the round
# log. Independent of the band override for the same reason the
# cross-SF check is.
touched = set(os.environ.get("GRAFT_BENCH_TOUCHED", "").split())
head_queries = (head or {}).get("queries") or {}
drift = [
    f"{k} {head_queries[k]:.2f}->{float(v):.2f}s"
    for k, v in sorted(cand_q.items())
    if k in head_queries and k not in touched
    and float(v) > 1.5 * float(head_queries[k])
    and float(v) - float(head_queries[k]) > 1.0]
if drift:
    bad.append("per-query drift >1.5x on untouched queries ("
               + ", ".join(drift)
               + ") — noisy box, or list intentionally-changed queries "
                 "in GRAFT_BENCH_TOUCHED")
if not (lo <= total <= hi):
    bad.append(f"total {total} outside the settled band [{lo:.1f}, {hi:.1f}]")
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
  git checkout HEAD -- BENCH_FULL.json
  echo "bench_guard: restored the committed BENCH_FULL.json from HEAD;" \
    "re-run the full bench on a settled box (or override the band) to refresh"
  exit 0
fi
