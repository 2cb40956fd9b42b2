#!/usr/bin/env python3
"""Dev-only: sf0.1 vs derived-sf1 ratio table from two Bench JSON lines
(same machine session, back-to-back runs). Usage:

    python3 dev/scaling_report.py /tmp/bench_sf01_r9.json /tmp/bench_sf1_r9.json
"""
import sys, json

a = json.loads(open(sys.argv[1]).read().strip())
b = json.loads(open(sys.argv[2]).read().strip())
qa, qb = a["queries"], b["queries"]
common = sorted(set(qa) & set(qb))
ratios = {q: (qb[q] / qa[q] if qa[q] > 0 else float("nan")) for q in common}
print(f"total: {a['value']:.1f}s -> {b['value']:.1f}s  ({b['value']/a['value']:.2f}x)")
med = sorted(ratios.values())[len(ratios) // 2]
print(f"median per-query ratio: {med:.1f}x over {len(common)} queries")
print("\ntop ratios:")
for q in sorted(common, key=lambda q: -ratios[q])[:12]:
    print(f"  {q}: {qa[q]:.2f}s -> {qb[q]:.2f}s  ({ratios[q]:.1f}x)")
print("\nbuild costs (one-time, reported separately):")
for k in sorted(set(a.get("build", {})) | set(b.get("build", {}))):
    print(f"  {k}: {a['build'].get(k, float('nan')):.2f}s -> {b['build'].get(k, float('nan')):.2f}s")
print("\nheaviest at sf1:")
for q in sorted(common, key=lambda q: -qb[q])[:10]:
    print(f"  {q}: {qb[q]:.2f}s ({ratios[q]:.1f}x)")
