#!/usr/bin/env python3
"""Scale-probe ratio report: per-query min at the probe SF vs the sf0.1
bench, frames attributed separately (r10 — VERDICT_r09 items 2+3).

Usage: python3 tools/probe_ratios.py [probe_json] [base_json] [flag_x]
Flags every query whose probe/base min ratio exceeds flag_x (default
144 = 12x/decade over the 100x step) plus the absolute top cost list.
"""
import json
import sys


def mins(path):
    d = json.load(open(path))
    return ({k: v["min"] for k, v in d["queries"].items()},
            d.get("frames", {}), d)


def main():
    probe = sys.argv[1] if len(sys.argv) > 1 else "bench_sf10_full.json"
    base = sys.argv[2] if len(sys.argv) > 2 else "bench_local.json"
    flag_x = float(sys.argv[3]) if len(sys.argv) > 3 else 144.0
    pq, pframes, pdoc = mins(probe)
    bq, _, _ = mins(base)
    common = sorted(set(pq) & set(bq))
    print(f"probe {probe}: {len(pq)} queries, total "
          f"{sum(pq.values()):.0f}s; base {base}: {len(bq)} queries")
    print(f"routed_to_lsh: {pdoc.get('routed_to_lsh')}")
    print(f"errors: {pdoc.get('errors')}")
    rows = []
    for k in common:
        b = max(bq[k], 0.02)  # floor tiny baselines: ratio noise guard
        rows.append((pq[k] / b, pq[k], bq[k], k))
    rows.sort(reverse=True)
    print(f"\n== ratios > {flag_x:.0f}x (100x data) ==")
    for r, p, b, k in rows:
        if r > flag_x:
            print(f"  {k}: {b:.2f}s -> {p:.2f}s = {r:.0f}x")
    print("\n== top-12 absolute probe cost ==")
    for r, p, b, k in sorted(rows, key=lambda x: -x[1])[:12]:
        print(f"  {k}: {p:.1f}s (ratio {r:.0f}x, base {b:.2f}s)")
    print("\n== top-10 ratio (any) ==")
    for r, p, b, k in rows[:10]:
        print(f"  {k}: {b:.3f}s -> {p:.2f}s = {r:.0f}x")
    if pframes:
        print("\n== frame builds (attributed separately) ==")
        for k, v in sorted(pframes.items(), key=lambda x: -x[1]["sec"]):
            print(f"  {k}: {v['builds']} builds, {v['sec']:.1f}s")


if __name__ == "__main__":
    main()
