#!/usr/bin/env python3
"""Merge several (possibly steal-polluted) Bench JSON records into the
per-query MINIMUM with the minimum's own steal-cores reading — the
round-7 methodology for estimating steal-free cost when no single window
stays quiet for the whole suite. A query's minimum taken at steal <= 0.5
cores is a trustworthy number regardless of how dirty the rest of that
run was; the output marks each query's evidence quality accordingly.

Usage: bench_minima.py out.json in1.json in2.json ...
"""
import json
import sys

out_path, ins = sys.argv[1], sys.argv[2:]
best = {}          # name -> (sec, steal_at_min, run)
for path in ins:
    try:
        d = json.loads(open(path).readline())
    except Exception:
        continue
    st = d.get("steal_cores", {})
    for name, sec in d.get("queries", {}).items():
        if sec is None or sec < 0:
            continue
        if name not in best or sec < best[name][0]:
            best[name] = (sec, st.get(name), path)

qs = {n: v[0] for n, v in sorted(best.items())}
steals = {n: v[1] for n, v in sorted(best.items())}
quiet = [n for n, v in best.items() if v[1] is not None and v[1] <= 0.5]
rec = {
    "metric": "total_minima",
    "value": sum(qs.values()),
    "unit": "sec",
    "queries": qs,
    "steal_cores_at_min": steals,
    "n_queries": len(qs),
    "n_quiet_minima": len(quiet),
    "runs": ins,
    "note": "per-query min across runs; a min taken at steal<=0.5 cores "
            "is steal-free evidence even if its run was globally dirty",
}
json.dump(rec, open(out_path, "w"), indent=1)
print(f"{len(qs)} queries, {len(quiet)} minima at steal<=0.5, "
      f"total {sum(qs.values()):.1f}s -> {out_path}")
