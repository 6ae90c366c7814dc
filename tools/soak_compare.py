#!/usr/bin/env python3
"""Scale-soak comparison: parse two Bench runs (sf0.1 and the synthetic
/tmp/sf1 from make_sf1.py) and print a markdown table of per-query times
with the scaling exponent e = log10(t_sf1 / t_sf0.1) over the 10x row
step (e=1 linear, e<0.3 ~flat/fixed-cost, e>1 super-linear).
"""
import json
import math
import sys

a_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_sf01.jsonl"
b_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/bench_sf1.jsonl"


def load(path):
    qs, summary = {}, None
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "bench_query" in d:
            qs[d["bench_query"]] = d["sec"]
        elif "metric" in d:
            summary = d
    return qs, summary


a, asum = load(a_path)
b, bsum = load(b_path)
print(f"| query | sf0.1 s | sf1 s | ratio | exp |")
print(f"|---|---|---|---|---|")
rows = []
for q in sorted(set(a) | set(b)):
    ta, tb = a.get(q), b.get(q)
    if ta is None or tb is None or ta <= 0 or tb <= 0:
        rows.append((q, ta, tb, None, None))
        continue
    ratio = tb / ta
    exp = math.log10(ratio)
    rows.append((q, ta, tb, ratio, exp))
for q, ta, tb, ratio, exp in sorted(
        rows, key=lambda r: -(r[4] if r[4] is not None else -99)):
    if ratio is None:
        print(f"| {q} | {ta} | {tb} | — | — |")
    else:
        print(f"| {q} | {ta:.2f} | {tb:.2f} | {ratio:.2f}x | {exp:+.2f} |")
if asum and bsum:
    print(f"\ntotal_timed: {asum['total_timed']:.1f}s -> "
          f"{bsum['total_timed']:.1f}s "
          f"(x{bsum['total_timed']/asum['total_timed']:.2f}); "
          f"wall {asum['wall']:.0f}s -> {bsum['wall']:.0f}s; "
          f"n={asum.get('n_queries')}/{bsum.get('n_queries')}")
