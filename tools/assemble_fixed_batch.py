#!/usr/bin/env python3
"""Assemble SCALE_SWEEP_FIXED_BATCH_r{N}.json from FixedBatchSweep
output lines (dev tooling, not part of the engine).

Usage: python3 tools/assemble_fixed_batch.py <out.json> <fb_sf1.txt> ...

Each input holds `FIXED_BATCH {...}` JSON lines from
graft.tools.FixedBatchSweep (one file per store SF, same fixed batch).
Emits per-family walls keyed by store SF plus the log-log exponent —
the number that answers "is per-batch cost flat as the standing corpus
grows?" (near 0 = flat; 1 = the per-batch cost scales with the store).
"""
import json
import math
import sys


def main(out, *paths):
    rows = {}
    modes = set()
    for p in paths:
        for line in open(p):
            line = line.strip()
            if not line.startswith("FIXED_BATCH "):
                continue
            d = json.loads(line[len("FIXED_BATCH "):])
            if "family" not in d:
                continue
            fam = rows.setdefault(d["family"], {})
            fam[d["store_sf"]] = d["wall_sec"]
            modes.add(d["batch_dir"])
    for fam, pts in rows.items():
        series = sorted(
            (float(sf.replace("sf", "")), t) for sf, t in pts.items()
            if sf.startswith("sf"))
        if len(series) >= 2:
            xs = [math.log(sf) for sf, _ in series]
            ys = [math.log(max(t, 1e-3)) for _, t in series]
            n = len(xs)
            mx, my = sum(xs) / n, sum(ys) / n
            denom = sum((x - mx) ** 2 for x in xs)
            pts["exponent"] = round(
                sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 2) \
                if denom else float("nan")
    doc = {"families": rows,
           "fixed_batch_from": sorted(modes),
           "note": "CONSTANT batch (every 10th sf1 doc / order) folded or "
                   "probed against standing stores built from sf1/sf3/sf10 "
                   "corpora; min-of-3 walls, full-column-hash consume; "
                   "exponent = log-log slope of per-batch wall vs store "
                   "scale (0 = flat per-batch cost, the production claim)"}
    json.dump(doc, open(out, "w"), indent=1, sort_keys=True)
    print(f"wrote {out}: {len(rows)} families")


if __name__ == "__main__":
    main(sys.argv[1], *sys.argv[2:])
