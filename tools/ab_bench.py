"""Interleaved A/B bench attribution harness (r9 verdict item 2).

Runs the headline-12 set ALTERNATING between two repo checkouts
(A, B, A, B, ... per rep) in the same host window, so a degraded host
inflates both sides equally and the HEAD-vs-control ratio is
self-contained — the non-interleaved r9 A/B left run-order/warmup as a
confound.

Usage: python tools/ab_bench.py <repoA> <repoB> [reps=3]
Prints one JSON line: per-side per-query medians + the ratio.
Each side runs in its own subprocess (own SparkSession) with
SPARK_GRAFT_BENCH_RUNS=1; the interleaving is at the rep level.
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

A = sys.argv[1] if len(sys.argv) > 1 else "/root/repo"
B = sys.argv[2] if len(sys.argv) > 2 else None
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3
assert B, "usage: ab_bench.py <repoA> <repoB> [reps]"


def one_rep(repo: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_BENCH_RUNS="1")
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True, text=True, env=env, cwd=repo, check=True)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
    return json.loads(line)["queries"]


sides = {"A": {"repo": A, "reps": []}, "B": {"repo": B, "reps": []}}
for r in range(REPS):
    for s in ("A", "B"):                     # A,B,A,B,... interleaved
        sides[s]["reps"].append(one_rep(sides[s]["repo"]))
        print(f"rep {r} side {s} done", file=sys.stderr, flush=True)

res = {}
for s, d in sides.items():
    keys = set.intersection(*[set(r) for r in d["reps"]])
    res[s] = {k: round(statistics.median([r[k] for r in d["reps"]]), 3)
              for k in sorted(keys)}
common = sorted(set(res["A"]) & set(res["B"]))
ta = sum(res["A"][k] for k in common)
tb = sum(res["B"][k] for k in common)
print(json.dumps({"A": {"repo": A, "total": round(ta, 3)},
                  "B": {"repo": B, "total": round(tb, 3)},
                  "ratio_A_over_B": round(ta / tb, 4),
                  "queries_A": res["A"], "queries_B": res["B"]}))
