#!/usr/bin/env python3
"""Compare two bench_side_by_side artifacts (VERDICT r11 #1 done-criterion):
for every query present in both, report headline (med) movement; flag
queries whose med moved more than the given ratio (default 1.3x), and the
total-med spread. Stall-repair forensics ("stalled" arrays) are summarized
so the census is visible next to the movement numbers.

Usage: python3 tools/bench_compare.py runA.json runB.json [ratio]
"""
import json, sys

a = json.load(open(sys.argv[1]))
b = json.load(open(sys.argv[2]))
ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
moved = []
for q in common:
    ma, mb = qa[q]["med"], qb[q]["med"]
    if ma <= 0 or mb <= 0:
        continue
    r = max(ma, mb) / min(ma, mb)
    if r > ratio:
        moved.append((r, q, ma, mb))
ta = sum(qa[q]["med"] for q in common)
tb = sum(qb[q]["med"] for q in common)
spread = abs(ta - tb) / min(ta, tb)
sta = {q: qa[q]["stalled"] for q in common if qa[q].get("stalled")}
stb = {q: qb[q]["stalled"] for q in common if qb[q].get("stalled")}
print(f"common queries: {len(common)}")
print(f"total med A={ta:.1f}s B={tb:.1f}s spread={spread*100:.1f}%")
print(f"stall re-runs: A={sum(len(v) for v in sta.values())} {sta}")
print(f"               B={sum(len(v) for v in stb.values())} {stb}")
print(f"queries with med movement >{ratio}x: {len(moved)}")
for r, q, ma, mb in sorted(moved, reverse=True):
    print(f"  {q}: {ma:.3f} -> {mb:.3f}  ({r:.2f}x)")
