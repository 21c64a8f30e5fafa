#!/usr/bin/env python3
"""Assemble SCALE_SWEEP_r{N}.json from per-SF Bench subset artifacts
(dev tooling, not part of the engine).

Usage: python3 tools/assemble_sweep.py <out.json> <sf1.json> <sf3.json> <sf10.json>

Each input is a Bench JSON file ({"contract":..., "queries_full":{...}}).
Fits log-log slope over the points present per query (sf labels parsed
from the contract's "sf" field: sf1 -> 1, sf3 -> 3, sf10 -> 10).
"""
import json
import math
import sys


def load(path):
    d = json.load(open(path))
    sf = d["contract"]["sf"].replace("sf", "")
    return float(sf), d["queries_full"], d["contract"].get("skipped_by_design", {})


def main(out, *paths):
    pts = [load(p) for p in paths]
    queries = set()
    for _, q, _ in pts:
        queries.update(q)
    rows = {}
    for name in sorted(queries):
        series = [(sf, q[name]) for sf, q, _ in pts if name in q]
        entry = {f"sf{int(sf) if sf == int(sf) else sf}": round(t, 3)
                 for sf, t in series}
        if len(series) >= 2:
            xs = [math.log(sf) for sf, _ in series]
            ys = [math.log(max(t, 1e-3)) for _, t in series]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            denom = sum((x - mx) ** 2 for x in xs)
            slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom \
                if denom else float("nan")
            entry["exponent"] = round(slope, 2)
        rows[name] = entry
    skips = {}
    for sf, _, sk in pts:
        for k, v in sk.items():
            skips.setdefault(k, []).append(f"sf{int(sf)}")
    doc = {"points": [f"sf{int(sf)}" for sf, _, _ in pts],
           "queries": rows,
           "skipped_by_design": skips,
           "note": "exponent = log-log slope fitted over the points present; "
                   "min-of-k Bench walls (full-column hash action, r12)"}
    json.dump(doc, open(out, "w"), indent=1, sort_keys=True)
    print(f"wrote {out}: {len(rows)} queries")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
