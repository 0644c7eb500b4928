#!/usr/bin/env python3
"""Render the scaling-sweep results (scripts/scaling_sweep.sh) as the
markdown table SCALING.md's "Measured" section carries.

Scaling exponent alpha = log(w_100x / w_10x) / log(10): wall ~ n^alpha
between the two largest corpora (the sf0.1 point is warm-up-dominated
for sub-second queries, so the exponent uses the 10x->100x edge where
real work dominates). alpha ~ 1 = linear scaling, < 1 = sublinear /
overhead-dominated, > 1.2 = super-linear (investigate).
"""
import json, math, os, sys

out = sys.argv[1] if len(sys.argv) > 1 else "target/scale"

def load(tag):
    with open(os.path.join(out, f"bench_{tag}.json")) as f:
        bench = json.load(f)
    with open(os.path.join(out, f"detail_{tag}.json")) as f:
        detail = json.load(f)
    # round-15 detail format nests per-query records under "queries"
    # (env telemetry is a top-level sibling); older files are flat
    return bench["queries"], detail.get("queries", detail)

w01, d01 = load("sf0.1")
w10, d10 = load("x10")
w100, d100 = load("x100")

def fmt_bytes(b):
    if b >= 1 << 30: return f"{b / (1 << 30):.1f}G"
    if b >= 1 << 20: return f"{b / (1 << 20):.1f}M"
    if b >= 1 << 10: return f"{b / (1 << 10):.1f}K"
    return str(b)

print("| query | sf0.1 s | 10x s | 100x s | alpha(10x->100x) | "
      "shuffle r/w @100x | spilled @100x |")
print("|---|---|---|---|---|---|---|")
for q in sorted(w01):
    a = math.log(w100[q] / w10[q]) / math.log(10)
    sd = d100[q]
    print(f"| {q} | {w01[q]:.2f} | {w10[q]:.2f} | {w100[q]:.2f} | "
          f"{a:.2f} | {fmt_bytes(sd['shuffle_read'])}/"
          f"{fmt_bytes(sd['shuffle_write'])} | {fmt_bytes(sd['spilled'])} |")
