#!/usr/bin/env python3
"""scale_ratio.py BASE.json SCALED.json [threshold]

Per-query scaling report between two Bench records (e.g. sf0.1 vs a 10x
/tmp/sf1 replicate run). Prints a markdown table of the worst ratios and
a family roll-up; flags queries whose scaled/base ratio exceeds the
threshold (default 15 = super-linear at 10x data by >1.5x).

Base queries under minFloor (default 0.15 s) are clamped to the floor
before the ratio — a 0.05 s -> 1 s move is startup noise, not scaling.
"""
import json
import sys


def load(p):
    # whole-file json.load: handles both the one-line Bench stdout
    # contract and pretty-printed/multi-line records
    with open(p) as f:
        d = json.load(f)
    return d.get("queries", {})


def main():
    base = load(sys.argv[1])
    scaled = load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0
    floor = 0.15
    common = sorted(set(base) & set(scaled))
    rows = []
    for q in common:
        b, s = base[q], scaled[q]
        if b < 0 or s < 0:
            rows.append((float("inf"), q, b, s))
            continue
        rows.append((s / max(b, floor), q, b, s))
    rows.sort(reverse=True)
    print(f"common={len(common)} base_only={sorted(set(base)-set(scaled))} "
          f"scaled_only={sorted(set(scaled)-set(base))}")
    print(f"sum base={sum(max(v,0) for v in base.values()):.1f}s "
          f"scaled={sum(max(v,0) for v in scaled.values()):.1f}s")
    bad = [r for r in rows if r[0] > thr]
    print(f"\n{len(bad)} queries over {thr}x:")
    print("| query | base s | scaled s | ratio |")
    print("|---|---|---|---|")
    for ratio, q, b, s in rows[:40]:
        mark = " **>thr**" if ratio > thr else ""
        print(f"| {q}{mark} | {b:.2f} | {s:.2f} | {ratio:.1f}x |")
    # distribution buckets
    import collections
    dist = collections.Counter()
    for ratio, q, b, s in rows:
        if ratio <= 2: dist["<=2x"] += 1
        elif ratio <= 5: dist["2-5x"] += 1
        elif ratio <= 10: dist["5-10x"] += 1
        elif ratio <= 15: dist["10-15x"] += 1
        else: dist[">15x"] += 1
    print("\nratio distribution:", dict(dist))


if __name__ == "__main__":
    main()
