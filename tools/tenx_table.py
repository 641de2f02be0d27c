#!/usr/bin/env python3
"""Render the BENCH.md per-query 10x ratio table from two TenXBench TENX
JSON lines (sf0.1 baseline, 10x point). Flags every query whose wall-time
ratio exceeds the super-linearity threshold (default 15x for 10x data)."""
import json, re, sys

def load(path):
    txt = open(path).read()
    m = re.search(r'TENX (\{.*\})', txt)
    return json.loads(m.group(1))

base, tenx = load(sys.argv[1]), load(sys.argv[2])
thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
qb, qt = base["queries"], tenx["queries"]
rows = []
for name in sorted(qb):
    b, t = qb[name], qt.get(name)
    if t is None:
        continue
    if t == -2.0:
        rows.append((name, b, None, "TIMEOUT"))
    elif t < 0 or b <= 0:
        rows.append((name, b, t, "FAIL"))
    else:
        rows.append((name, b, t, t / b))
flagged = [r for r in rows if isinstance(r[3], float) and r[3] > thresh]
print(f"| query | sf0.1 s | 10x s | ratio |")
print(f"|---|---|---|---|")
for name, b, t, r in rows:
    ts = "timeout" if r == "TIMEOUT" else (f"{t:.2f}" if t is not None else "-")
    rs = r if isinstance(r, str) else f"{r:.1f}x"
    mark = " **<-**" if (isinstance(r, float) and r > thresh) or r == "TIMEOUT" else ""
    print(f"| {name} | {b:.2f} | {ts} | {rs}{mark} |")
fin = [r for r in rows if isinstance(r[3], float)]
print(f"\n{len(fin)} finished; median ratio "
      f"{sorted(r[3] for r in fin)[len(fin)//2]:.1f}x; "
      f"{len(flagged)} over {thresh}x; "
      f"{sum(1 for r in rows if r[3]=='TIMEOUT')} timeouts")
