#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate (dev tooling only, not
part of the engine): run graft.Verify at a given SF, then execute each
oracle SQL in DuckDB over the same parquet tables and compare.

Usage: python3 tools/local_verify.py /root/testdata/sf0.01 /tmp/verify_out
(assumes Verify has already written outputs to the outDir)
"""
import json
import math
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(r[i] for i in order))
    out.sort(key=lambda t: tuple("\x00" if v is None else str(v) for v in t))
    return [cols[i] for i in order], out


def vals_equal(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    with open(f"{out_dir}/oracle_sql.json") as f:
        oracles = json.load(f)
    n_pass = n_fail = 0
    for name in sorted(oracles):
        sql = oracles[name]
        try:
            ocur = con.execute(sql)
            ocols = [d[0] for d in ocur.description]
            otypes = {d[0]: str(d[1]) for d in ocur.description}
            orows = ocur.fetchall()
            scur = con.execute(
                f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            scols = [d[0] for d in scur.description]
            stypes = {d[0]: str(d[1]) for d in scur.description}
            srows = scur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: exec error: {e}")
            n_fail += 1
            continue
        oc, orows = canon(orows, ocols)
        sc, srows = canon(srows, scols)
        if oc != sc:
            print(f"FAIL {name}: columns differ oracle={oc} spark={sc}")
            n_fail += 1
            continue
        # The driver's hash is type-sensitive (e.g. DuckDB HUGEINT vs Spark
        # BIGINT hash-mismatch even when values agree) — flag type drift here.
        tbad = [(c, otypes[c], stypes[c]) for c in oc if otypes[c] != stypes[c]]
        if tbad:
            print(f"FAIL {name}: column types differ (oracle vs spark): {tbad}")
            n_fail += 1
            continue
        if len(orows) != len(srows):
            print(f"FAIL {name}: rowcount oracle={len(orows)} spark={len(srows)}")
            n_fail += 1
            continue
        bad = None
        for i, (orow, srow) in enumerate(zip(orows, srows)):
            for c, (a, b) in enumerate(zip(orow, srow)):
                if not vals_equal(a, b):
                    bad = (i, oc[c], a, b)
                    break
            if bad:
                break
        if bad:
            print(f"FAIL {name}: first diff row={bad[0]} col={bad[1]} oracle={bad[2]!r} spark={bad[3]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(orows)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
