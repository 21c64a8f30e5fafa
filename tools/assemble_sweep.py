#!/usr/bin/env python3
"""Assemble SCALE_SWEEP_r{N}.json from per-SF Bench subset artifacts
(dev tooling, not part of the engine).

Usage: python3 tools/assemble_sweep.py <out.json> <bench.json[:mode]> ...

Each input is a Bench JSON file ({"contract":..., "queries_full":{...}})
optionally tagged with the harness mode it ran under:

  /tmp/b_sf10.json            -> mode "combined"  (shared-JVM batch)
  /tmp/b_sf10_iso.json:isolated -> mode "isolated" (own JVM, one query)

The r12 sweep's sf10 combined batch OOM'd on one query and the isolated
re-run was indistinguishable in the artifact — every point now records
which regime produced it (verdict r12 item 4). Multiple files may carry
the same SF (a combined batch plus isolated re-runs); later arguments
win per query, and the winning file's mode is recorded for that
(query, sf) point.

Fits log-log slope over the points present per query (sf labels parsed
from the contract's "sf" field: sf1 -> 1, sf3 -> 3, sf10 -> 10).
"""
import json
import math
import sys

MODES = ("combined", "isolated")


def parse_arg(arg):
    mode = "combined"
    path = arg
    if ":" in arg:
        cand_path, cand_mode = arg.rsplit(":", 1)
        if cand_mode in MODES:
            path, mode = cand_path, cand_mode
    d = json.load(open(path))
    sf = float(d["contract"]["sf"].replace("sf", ""))
    return sf, mode, d["queries_full"], d["contract"].get("skipped_by_design", {})


def sf_label(sf):
    return f"sf{int(sf) if sf == int(sf) else sf}"


def main(out, *args):
    inputs = [parse_arg(a) for a in args]
    # later arguments win per (sf, query); record the winning mode
    merged = {}   # sf -> {query: (time, mode)}
    skips = {}
    sf_order = []
    for sf, mode, queries, sk in inputs:
        if sf not in merged:
            merged[sf] = {}
            sf_order.append(sf)
        for name, t in queries.items():
            merged[sf][name] = (t, mode)
        for k, v in sk.items():
            skips.setdefault(k, []).append(sf_label(sf))
    names = sorted({n for qs in merged.values() for n in qs})
    rows = {}
    for name in names:
        series = [(sf, merged[sf][name]) for sf in sf_order if name in merged[sf]]
        entry = {sf_label(sf): round(t, 3) for sf, (t, _) in series}
        entry["mode"] = {sf_label(sf): m for sf, (_, m) in series}
        if len(series) >= 2:
            xs = [math.log(sf) for sf, _ in series]
            ys = [math.log(max(t, 1e-3)) for _, (t, _) in series]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            denom = sum((x - mx) ** 2 for x in xs)
            slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom \
                if denom else float("nan")
            entry["exponent"] = round(slope, 2)
        rows[name] = entry
    doc = {"points": [sf_label(sf) for sf in sf_order],
           "queries": rows,
           "skipped_by_design": skips,
           "note": "exponent = log-log slope fitted over the points present; "
                   "min-of-k Bench walls (full-column hash action, r12); "
                   "per-point mode records the JVM regime (combined batch "
                   "vs isolated re-run) that produced the wall (r13)"}
    json.dump(doc, open(out, "w"), indent=1, sort_keys=True)
    print(f"wrote {out}: {len(rows)} queries")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
